"""Jitted train/validation steps.

Each training step is ONE static-shape XLA program spanning the entire
per-iteration pipeline the reference spreads across CPU DataLoader workers
and the GPU (SURVEY.md §3.1): voxelize -> kernel maps -> sparse U-Net ->
group/pair losses -> SGD update. Only scan loading, pose algebra and
augmentation remain on the host.

Optimizer semantics = torch.optim.SGD(lr, momentum, weight_decay) with
dampening 0 and per-epoch ExponentialLR (reference lib/trainer.py:73-79):
grad+wd -> momentum buffer -> params -= lr * buf; lr is fed in per step.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.kernel_maps import build_graph
from ..core.types import SparseBatch
from ..data.device_pipeline import (batch_colocation_groups,
                                    build_correspondences,
                                    voxelize_per_cloud)
from ..losses.gcl import (GCLLossConfig, SpatialNegFilter,
                          finest_contrastive_loss, intra_group_pairs,
                          location_circle_loss, location_contrastive_loss,
                          member_group_index)
from ..losses.pairs import (contrastive_loss, hardest_contrastive_loss,
                            hardest_triplet_loss, triplet_loss)
from ..reg.matching import find_nn
from ..reg.robust import est_quad_linear_robust
from ..losses.common import sample_without_replacement


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static knobs shared by the step builders."""

    voxel_size: float
    nv_cap: int
    level_caps: Dict[int, int]
    group_k: int = 5
    corr_k: int = 8
    pos_pair_cap: int = 1 << 20
    knn_chunk: int = 1024
    # Static hash-grid cell for radius searches (must be >= 2x the largest
    # traced search radius). None -> brute-force O(QT) search.
    search_cell: Any = None
    cell_cap: int = 8
    member_r_cap: int = 32  # reverse-membership index width (neg filter)
    # Negative-loss intra-group filter: 'spatial' (geometric 2r test in
    # the aligned frame — covers every membership exclusion without the
    # per-step reverse-index sort) or 'membership' (exact K-truncated
    # co-membership, the reference's hash semantics).
    neg_filter: str = "spatial"
    momentum: float = 0.8
    weight_decay: float = 1e-4
    jitter_sigma: float = 0.01
    jitter_p: float = 0.95
    # 'input': reference-exact feature jitter applied to the conv1 input
    # (lib/transforms.py:24-34); conv1 must then read its features, so
    # the presence-bitmask fast path is off during training. 'c1z':
    # conv1 keeps the presence kernels and injects distribution-matched
    # per-(output, offset) iid noise instead (exact per-output mean and
    # covariance, cross-output correlation dropped — see
    # sparse_ops.sparse_conv_c1z_jittered).
    jitter_mode: str = "input"
    compute_dtype: Any = jnp.float32


def make_optimizer(cfg: StepConfig):
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
    )


def _apply_sgd(tx, grads, opt_state, params, lr):
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params,
                                    updates)
    return params, opt_state


def make_train_step_from_grad(tx, grad_fn) -> Callable:
    """Wrap grad_fn(params, batch_stats, rng, *batch) -> (grads, stats,
    metrics) into the standard one-SGD-step-per-batch step function."""

    @jax.jit
    def step_fn(state: TrainState, lr, *batch):
        rng, k = jax.random.split(state.rng)
        grads, new_stats, metrics = grad_fn(state.params, state.batch_stats,
                                            k, *batch)
        params, opt_state = _apply_sgd(tx, grads, state.opt_state,
                                       state.params, lr)
        return TrainState(params, new_stats, opt_state, rng,
                          state.step + 1), metrics

    return step_fn


class AccumStepper:
    """Caffe-style ``iter_size`` gradient accumulation (reference
    lib/trainer.py:230-283, lib/colocation_trainer.py:828-887): gradients
    of ``loss / iter_size`` are summed over ``iter_size`` consecutive
    micro-batches and ONE SGD step is taken at the window end. BatchNorm
    running stats and the RNG advance every micro-batch, exactly like the
    reference's per-forward updates.

    Drop-in for a step function: ``stepper(state, lr, *batch) ->
    (state, metrics)``; the optimizer step fires on every
    ``iter_size``-th call. ``reset()`` discards a partial window (the
    reference's epoch loop runs ``len(loader) // iter_size`` full windows
    and never steps on a remainder).
    """

    def __init__(self, tx, grad_fn, iter_size: int):
        self.iter_size = int(iter_size)
        self._count = 0
        self._acc = None

        @jax.jit
        def micro(state: TrainState, acc, *batch):
            rng, k = jax.random.split(state.rng)
            grads, new_stats, metrics = grad_fn(
                state.params, state.batch_stats, k, *batch)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype) / iter_size, acc, grads)
            return (TrainState(state.params, new_stats, state.opt_state,
                               rng, state.step), acc, metrics)

        @jax.jit
        def apply(state: TrainState, acc, lr):
            params, opt_state = _apply_sgd(tx, acc, state.opt_state,
                                           state.params, lr)
            return TrainState(params, state.batch_stats, opt_state,
                              state.rng, state.step + 1)

        self._micro, self._apply = micro, apply

    def reset(self):
        self._acc = None
        self._count = 0

    @property
    def boundary(self) -> bool:
        """True right after an optimizer step (window just closed)."""
        return self._count == 0

    def __call__(self, state: TrainState, lr, *batch):
        if self._acc is None:
            self._acc = jax.tree_util.tree_map(jnp.zeros_like,
                                               state.params)
        state, self._acc, metrics = self._micro(state, self._acc, *batch)
        self._count += 1
        if self._count == self.iter_size:
            state = self._apply(state, self._acc, lr)
            self.reset()
        return state, metrics


def _jitter_feats(feats, mask, key, sigma, p, row_sel=None):
    """Feature jitter (reference lib/transforms.py:24-34, applied to the
    center cloud's occupancy features at load time). The reference draws
    the p-gate per SAMPLE (one random.random() per __getitem__); callers
    fold per-sample gates into row_sel via _sample_gates and pass p=1."""
    k1, k2 = jax.random.split(key)
    on = jax.random.uniform(k1) < p
    noise = jax.random.normal(k2, feats.shape) * sigma
    if row_sel is not None:
        noise = noise * row_sel[:, None]
    return jnp.where(on, feats + noise * mask[:, None], feats)


def _sample_gates(key, p, n_samples, row_to_sample):
    """Per-sample jitter gate expanded to rows: float[N] in {0, 1}.
    Matches the reference's one-gate-per-__getitem__ semantics
    (lib/transforms.py:25 `random.random() < 0.95` runs per sample)."""
    gates = (jax.random.uniform(key, (n_samples,)) < p).astype(
        jnp.float32)
    return gates[jnp.clip(row_to_sample, 0, n_samples - 1)]


# ----------------------------------------------------------------------
# GCL (colocation) training step
# ----------------------------------------------------------------------

def make_gcl_grad_fn(model, conv_specs, step_cfg: StepConfig,
                     loss_cfg: GCLLossConfig, loss_kind: str,
                     max_pos_cluster: int, max_hn_samples: int,
                     pos_weight: float, finest_weight: float,
                     neg_weight: float, jitter: bool = True) -> Callable:
    """grad_fn(params, batch_stats, rng, points[B,C,P,3], pmask,
    transforms[B,C,4,4], radius[B]) -> (grads, new_stats, metrics).

    The building block shared by the single-chip step and the shard_map
    data-parallel step (each device runs it on its batch shard).
    """
    loss_fn_map = {
        "finest": finest_contrastive_loss,
        "location": location_contrastive_loss,
        "circle": location_circle_loss,
    }
    group_loss = loss_fn_map[loss_kind]

    def forward_geometry(points, pmask, transforms, radius):
        # named scopes prefix the XLA op names so device traces
        # (scripts/profile_xprof.py) roll up by pipeline phase
        b, c, p, _ = points.shape
        with jax.named_scope("voxelize"):
            vox = voxelize_per_cloud(points.reshape(b * c, p, 3),
                                     pmask.reshape(b * c, p),
                                     step_cfg.voxel_size, step_cfg.nv_cap)
        vox_b = jax.tree_util.tree_map(
            lambda x: x.reshape((b, c) + x.shape[1:]), vox)
        with jax.named_scope("groups"):
            groups = batch_colocation_groups(vox_b, transforms, radius,
                                             k=step_cfg.group_k,
                                             chunk=step_cfg.knn_chunk,
                                             cell=step_cfg.search_cell,
                                             cell_cap=step_cfg.cell_cap)
        flat = vox.flatten()
        with jax.named_scope("kernel_maps"):
            graph = build_graph(flat.coords, flat.mask, conv_specs,
                                step_cfg.level_caps, sorted_blocks=True,
                                n_clouds=b * c)
        return flat, graph, groups, vox_b, c

    def grad_fn(params, batch_stats, rng, points, pmask, transforms,
                radius):
        k_loss, k_jit = jax.random.split(rng)
        flat, graph, groups, vox_b, c = forward_geometry(points, pmask,
                                                         transforms,
                                                         radius)
        b = points.shape[0]
        if step_cfg.neg_filter == "spatial":
            from ..data.device_pipeline import transform_points
            aligned = jax.vmap(jax.vmap(transform_points))(
                vox_b.xyz, transforms)  # [B, C, nv, 3] in center frames
            nv = vox_b.xyz.shape[2]
            sample_id = jnp.repeat(jnp.arange(b, dtype=jnp.int32), c * nv)
            pos_pairs = SpatialNegFilter(aligned.reshape(-1, 3),
                                         sample_id, radius)
        else:
            # Reverse membership index instead of the explicit
            # intra-group pair list — same negative-filter semantics,
            # none of the G*Kc^2 pair materialization cost.
            pos_pairs = member_group_index(groups, flat.mask.shape[0],
                                           step_cfg.member_r_cap)
        ppmask = None
        center_rows = (flat.coords[:, 0] % c == 0).astype(jnp.float32)

        if jitter:
            # per-sample p-gate folded into the row mask (reference
            # draws one gate per __getitem__)
            k_jit, k_gate = jax.random.split(k_jit)
            jit_rows = center_rows * _sample_gates(
                k_gate, step_cfg.jitter_p, b, flat.coords[:, 0] // c)

        def loss(params):
            feats = flat.feats
            apply_kw = {}
            if jitter:
                # conv1 owns the jitter (center-cloud rows only,
                # reference lib/colocation_data_loader.py:414-415).
                # jitter_mode='input' (default) keeps reference-EXACT
                # semantics: the conv splits conv(1+eps) into the
                # presence conv + a support-gated eps conv
                # (sparse_ops.sparse_conv_c1z_exact_jitter); 'c1z'
                # selects the distribution-matched approximation.
                apply_kw = dict(
                    conv1_jitter=(step_cfg.jitter_sigma, 1.0, jit_rows,
                                  step_cfg.jitter_mode != "c1z"),
                    rngs={"jitter": k_jit})
            with jax.named_scope("unet"):
                f_out, mut = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    graph, feats.astype(step_cfg.compute_dtype),
                    train=True, ones_exact=True,
                    mutable=["batch_stats"], **apply_kw)
            with jax.named_scope("gcl_loss"):
                out = group_loss(f_out.astype(jnp.float32), flat.mask,
                                 groups, pos_pairs, ppmask, k_loss,
                                 max_pos_cluster, max_hn_samples,
                                 loss_cfg)
            total = (pos_weight * out.pos_loss
                     + finest_weight * out.finest_loss
                     + neg_weight * out.neg_loss)
            return total, (out, mut["batch_stats"])

        (total, (out, new_stats)), grads = jax.value_and_grad(
            loss, has_aux=True)(params)
        metrics = {"loss": total, "pos_loss": out.pos_loss,
                   "finest_loss": out.finest_loss,
                   "neg_loss": out.neg_loss,
                   "num_valid_voxels": jnp.sum(flat.mask).astype(
                       jnp.float32),
                   "num_groups": jnp.sum(groups.valid).astype(jnp.float32)}
        return grads, new_stats, metrics

    return grad_fn


def make_gcl_train_step(model, conv_specs, step_cfg: StepConfig,
                        loss_cfg: GCLLossConfig, loss_kind: str,
                        max_pos_cluster: int, max_hn_samples: int,
                        pos_weight: float, finest_weight: float,
                        neg_weight: float,
                        jitter: bool = True) -> Tuple[Callable, Callable]:
    """Single-chip colocation train step: (tx, step_fn)."""
    tx = make_optimizer(step_cfg)
    grad_fn = make_gcl_grad_fn(model, conv_specs, step_cfg, loss_cfg,
                               loss_kind, max_pos_cluster, max_hn_samples,
                               pos_weight, finest_weight, neg_weight,
                               jitter)
    return tx, make_train_step_from_grad(tx, grad_fn)


# ----------------------------------------------------------------------
# FCGF (pair) training step
# ----------------------------------------------------------------------

def make_pair_grad_fn(model, conv_specs, step_cfg: StepConfig,
                      trainer_kind: str, cfg: Dict) -> Callable:
    """grad_fn(params, batch_stats, rng, points0[B,P,3], pmask0, points1,
    pmask1, trans[B,4,4], radius[B]) -> (grads, new_stats, metrics) for
    the pair-loss trainers (Hardest/Contrastive/Triplet).

    The two sides run through the model as separate batched sparse
    tensors, like the reference's two forward passes
    (lib/trainer.py:243-251). Shared by the single-chip step and the
    shard_map data-parallel step.
    """

    jitter = bool(cfg.get("jitter_feats", True))

    def side_forward(params, batch_stats, points, pmask, key, train=True):
        b, p, _ = points.shape
        with jax.named_scope("voxelize"):
            vox = voxelize_per_cloud(points, pmask, step_cfg.voxel_size,
                                     step_cfg.nv_cap)
        flat = vox.flatten()
        with jax.named_scope("kernel_maps"):
            graph = build_graph(flat.coords, flat.mask, conv_specs,
                                step_cfg.level_caps, sorted_blocks=True,
                                n_clouds=b)
        feats = flat.feats
        jit_on = train and jitter
        c1z_mode = jit_on and step_cfg.jitter_mode == "c1z"
        if jit_on:
            # per-sample p-gate (the reference's Jitter runs per
            # __getitem__ and per side,
            # lib/complement_data_loader.py:707-709); each side_forward
            # call gets its own key, so gates are side-independent
            key, k_gate = jax.random.split(key)
            jit_rows = _sample_gates(k_gate, step_cfg.jitter_p, b,
                                     flat.coords[:, 0])
        if jit_on and not c1z_mode:
            # the reference composes the Jitter feature-noise transform
            # into train-phase pair loaders too
            # (lib/colocation_data_loader.py:742-747, lib/transforms.py)
            feats = _jitter_feats(feats, flat.mask, key,
                                  step_cfg.jitter_sigma, 1.0, jit_rows)
        apply_kw = {}
        if c1z_mode:
            apply_kw = dict(conv1_jitter=(step_cfg.jitter_sigma, 1.0,
                                          jit_rows),
                            rngs={"jitter": key})
        with jax.named_scope("unet"):
            f, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                graph, feats.astype(step_cfg.compute_dtype),
                train=train, ones_exact=not (jit_on and not c1z_mode),
                mutable=["batch_stats"], **apply_kw)
        return vox, flat, f.astype(jnp.float32), mut["batch_stats"]

    def batch_correspondences(vox0, vox1, trans, radius):
        """Per-sample GT correspondences with global row offsets."""
        b, nv = vox0.mask.shape

        pairs, pm = jax.vmap(
            lambda x0, m0, x1, m1, t, r: build_correspondences(
                x0, m0, x1, m1, t, r, k=step_cfg.corr_k,
                chunk=step_cfg.knn_chunk, cell=step_cfg.search_cell,
                cell_cap=step_cfg.cell_cap))(
            vox0.xyz, vox0.mask, vox1.xyz, vox1.mask, trans, radius)
        off = (jnp.arange(b, dtype=jnp.int32) * nv)[:, None, None]
        pairs = pairs + off
        return pairs.reshape(-1, 2), pm.reshape(-1)

    num_pos = cfg["num_pos_per_batch"] * cfg["batch_size"]
    num_hn = cfg["num_hn_samples_per_batch"] * cfg["batch_size"]
    t_pos = cfg["triplet_num_pos"] * cfg["batch_size"]
    t_hn = cfg["triplet_num_hn"] * cfg["batch_size"]
    t_rand = cfg["triplet_num_rand"] * cfg["batch_size"]
    pos_thresh = cfg["pos_thresh"]
    neg_thresh = cfg["neg_thresh"]
    neg_weight = cfg["neg_weight"]

    def grad_fn(params_in, batch_stats_in, k_loss, points0, pmask0,
                points1, pmask1, trans, radius):
        def loss(params):
            vox0, flat0, f0, stats1 = side_forward(
                params, batch_stats_in, points0, pmask0,
                jax.random.fold_in(k_loss, 0))
            vox1, flat1, f1, stats2 = side_forward(
                params, stats1, points1, pmask1,
                jax.random.fold_in(k_loss, 1))
            pairs, pm = batch_correspondences(vox0, vox1, trans, radius)
            if trainer_kind == "hardest_contrastive":
                out = hardest_contrastive_loss(
                    f0, f1, flat0.mask, flat1.mask, pairs, pm, k_loss,
                    num_pos=num_pos, num_hn_samples=num_hn,
                    pos_thresh=pos_thresh, neg_thresh=neg_thresh)
                total = out.pos_loss + neg_weight * out.neg_loss
                aux = {"pos_loss": out.pos_loss, "neg_loss": out.neg_loss}
            elif trainer_kind == "contrastive":
                out = contrastive_loss(
                    f0, f1, flat0.mask, flat1.mask, pairs, pm, k_loss,
                    neg_thresh=neg_thresh, num_neg=2 * num_pos)
                total = out.pos_loss + neg_weight * out.neg_loss
                aux = {"pos_loss": out.pos_loss, "neg_loss": out.neg_loss}
            elif trainer_kind == "triplet":
                out = triplet_loss(f0, f1, flat0.mask, flat1.mask, pairs,
                                   pm, k_loss, num_pos=t_pos,
                                   num_rand_triplet=t_rand,
                                   neg_thresh=neg_thresh)
                total = out.loss
                aux = {"pos_loss": out.pos_dist, "neg_loss": out.neg_dist}
            elif trainer_kind == "hardest_triplet":
                out = hardest_triplet_loss(
                    f0, f1, flat0.mask, flat1.mask, pairs, pm, k_loss,
                    num_pos=t_pos, num_hn_samples=t_hn,
                    num_rand_triplet=t_rand, neg_thresh=neg_thresh)
                total = out.loss
                aux = {"pos_loss": out.pos_dist, "neg_loss": out.neg_dist}
            else:
                raise ValueError(trainer_kind)
            return total, (aux, stats2)

        (total, (aux, new_stats)), grads = jax.value_and_grad(
            loss, has_aux=True)(params_in)
        metrics = {"loss": total, **aux}
        return grads, new_stats, metrics

    return grad_fn


def make_pair_train_step(model, conv_specs, step_cfg: StepConfig,
                         trainer_kind: str, cfg: Dict
                         ) -> Tuple[Any, Callable]:
    """Single-chip pair-loss train step: (tx, step_fn).

    step_fn(state, lr, points0[B,P,3], pmask0, points1, pmask1,
            trans[B,4,4], radius[B]) -> (state, metrics)
    """
    tx = make_optimizer(step_cfg)
    grad_fn = make_pair_grad_fn(model, conv_specs, step_cfg, trainer_kind,
                                cfg)
    return tx, make_train_step_from_grad(tx, grad_fn)


# ----------------------------------------------------------------------
# Validation step (pair registration quality — lib/trainer.py:307-384)
# ----------------------------------------------------------------------

def make_val_step(model, conv_specs, step_cfg: StepConfig,
                  subsample: int = 5000, hit_ratio_thresh: float = 0.1):
    @jax.jit
    def val_step(params, batch_stats, key, points0, pmask0, points1,
                 pmask1, trans):
        def side(points, pmask):
            vox = voxelize_per_cloud(points, pmask, step_cfg.voxel_size,
                                     step_cfg.nv_cap)
            flat = vox.flatten()
            graph = build_graph(flat.coords, flat.mask, conv_specs,
                                step_cfg.level_caps, sorted_blocks=True,
                                n_clouds=points.shape[0])
            f = model.apply({"params": params, "batch_stats": batch_stats},
                            graph, flat.feats.astype(step_cfg.compute_dtype),
                            train=False)
            return vox, flat, f.astype(jnp.float32)

        vox0, flat0, f0 = side(points0, pmask0)
        vox1, flat1, f1 = side(points1, pmask1)
        b, nv = vox0.mask.shape

        def per_sample(i, key):
            m0 = jax.lax.dynamic_slice_in_dim(flat0.mask, i * nv, nv)
            m1 = jax.lax.dynamic_slice_in_dim(flat1.mask, i * nv, nv)
            sf0 = jax.lax.dynamic_slice_in_dim(f0, i * nv, nv)
            sf1 = jax.lax.dynamic_slice_in_dim(f1, i * nv, nv)
            x0 = vox0.xyz[i]
            x1 = vox1.xyz[i]
            k0, k1 = jax.random.split(key)
            s0, v0 = sample_without_replacement(k0, m0, subsample)
            s1, v1 = sample_without_replacement(k1, m1, subsample)
            nn, _ = find_nn(sf0[s0], sf1[s1], v1, chunk=step_cfg.knn_chunk)
            xc0 = x0[s0]
            xc1 = x1[s1[nn]]
            t_est = est_quad_linear_robust(xc0, xc1, mask=v0)
            # metrics vs GT
            t_gt = trans[i]
            aligned = xc0 @ t_gt[:3, :3].T + t_gt[:3, 3]
            d = jnp.sqrt(jnp.sum((aligned - xc1) ** 2, 1) + 1e-6)
            hit = jnp.sum((d < hit_ratio_thresh) & v0) / jnp.maximum(
                jnp.sum(v0), 1)
            rte = jnp.linalg.norm(t_est[:3, 3] - t_gt[:3, 3])
            cosv = (jnp.trace(t_est[:3, :3].T @ t_gt[:3, :3]) - 1) / 2
            rre = jnp.degrees(jnp.arccos(jnp.clip(cosv, -1 + 1e-7,
                                                  1 - 1e-7)))
            # corr_dist loss (lib/metrics.py:13-19) on the subsample
            est0 = xc0 @ t_est[:3, :3].T + t_est[:3, 3]
            loss = jnp.sum(jnp.clip(jnp.sqrt(
                jnp.sum((est0 - aligned) ** 2, 1)), None, 1.0) * v0) \
                / jnp.maximum(jnp.sum(v0), 1)
            return t_est, hit, rte, rre, loss

        keys = jax.random.split(key, b)
        t_est, hit, rte, rre, loss = jax.vmap(per_sample)(
            jnp.arange(b), keys)
        return {"t_est": t_est, "hit_ratio": hit, "rte": rte, "rre": rre,
                "loss": loss}

    return val_step


def make_dist_err_step(model, conv_specs, step_cfg: StepConfig):
    """Diagnostic step for --calc_distance_err (reference
    lib/colocation_trainer.py:683-731): eval-mode features over the
    colocation batch, then per-member (distance offset to the finest
    member's own LiDAR range, feature distance to the finest member).

    diag_step(params, batch_stats, points[B,C,P,3], pmask, transforms,
    radius) -> (dist_err, feat_err, mask) flat masked arrays.
    """
    from .diagnostics import group_distance_errors

    @jax.jit
    def diag_step(params, batch_stats, points, pmask, transforms, radius):
        b, c, p, _ = points.shape
        vox = voxelize_per_cloud(points.reshape(b * c, p, 3),
                                 pmask.reshape(b * c, p),
                                 step_cfg.voxel_size, step_cfg.nv_cap)
        vox_b = jax.tree_util.tree_map(
            lambda x: x.reshape((b, c) + x.shape[1:]), vox)
        groups = batch_colocation_groups(vox_b, transforms, radius,
                                         k=step_cfg.group_k,
                                         chunk=step_cfg.knn_chunk,
                                         cell=step_cfg.search_cell,
                                         cell_cap=step_cfg.cell_cap)
        flat = vox.flatten()
        graph = build_graph(flat.coords, flat.mask, conv_specs,
                            step_cfg.level_caps, sorted_blocks=True,
                            n_clouds=b * c)
        f = model.apply({"params": params, "batch_stats": batch_stats},
                        graph, flat.feats.astype(step_cfg.compute_dtype),
                        train=False).astype(jnp.float32)
        # central_distance: each member voxel's own-frame LiDAR range
        # (reference lib/colocation_data_loader.py:101-110 semantics)
        own = jnp.linalg.norm(vox_b.xyz, axis=-1).reshape(-1)
        central = own[jnp.clip(groups.member_idx, 0)]
        return group_distance_errors(f, groups, central)

    return diag_step


def make_feature_extractor(model, conv_specs, step_cfg: StepConfig):
    """Eval-mode features for one batch of clouds [B, P, 3] (demo /
    test-time path, util/misc.py:58-130 equivalent)."""

    @jax.jit
    def extract(params, batch_stats, points, pmask):
        vox = voxelize_per_cloud(points, pmask, step_cfg.voxel_size,
                                 step_cfg.nv_cap)
        flat = vox.flatten()
        graph = build_graph(flat.coords, flat.mask, conv_specs,
                            step_cfg.level_caps, sorted_blocks=True,
                            n_clouds=points.shape[0])
        f = model.apply({"params": params, "batch_stats": batch_stats},
                        graph, flat.feats.astype(step_cfg.compute_dtype),
                        train=False)
        b, nv = vox.mask.shape
        return vox, f.astype(jnp.float32).reshape(b, nv, -1)

    return extract
