"""Phase-by-phase timing of the GCL train step at the bench.py shape.

Times cumulative subsets of the step pipeline (each as its own jitted
program) so the marginal cost of every phase is visible:

  vox            voxelize_per_cloud (28 clouds x 64k pts)
  vox+groups     + colocation-group radius search
  vox+graph      + kernel-map construction (all U-Net levels)
  fwd            + ResUNetFatBN forward (train=False)
  grad           + loss + backward (the full grad_fn)
  full           + SGD update (the bench.py step)

Usage: python -u scripts/profile_step.py [phase ...]
(no args = all phases; each phase compiles separately, minutes each).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import synth_lidar  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import build_graph, default_level_caps
    from gcl_tpu.data.device_pipeline import (batch_colocation_groups,
                                              voxelize_per_cloud)
    from gcl_tpu.losses.gcl import GCLLossConfig
    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.train.steps import (StepConfig, TrainState,
                                     make_gcl_grad_fn, make_gcl_train_step)

    b, n_clouds = 4, 7
    p_cap = 65536
    nv_cap = 18432
    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    n_flat = b * n_clouds * nv_cap
    cfg = StepConfig(voxel_size=0.3, nv_cap=nv_cap,
                     level_caps=default_level_caps(n_flat, strides, 0.55),
                     knn_chunk=1024, pos_pair_cap=1 << 21,
                     search_cell=1.08,
                     compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    points = np.zeros((b, n_clouds, p_cap, 3), np.float32)
    for i in range(b):
        for c in range(n_clouds):
            points[i, c] = synth_lidar(rng, p_cap)
    pmask = np.ones((b, n_clouds, p_cap), bool)
    transforms = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (b, n_clouds, 4, 4)).copy()
    for i in range(b):
        for c in range(1, n_clouds):
            transforms[i, c, :3, 3] = [((c + 1) // 2) * 8.0
                                       * (1 if c % 2 else -1), 0, 0]
    radius = np.full((b,), 0.45, np.float32)
    args = (jnp.asarray(points), jnp.asarray(pmask),
            jnp.asarray(transforms), jnp.asarray(radius))

    # shared init
    cap = 64
    coords = np.zeros((cap, 4), np.int32)
    coords[:, 1] = np.arange(cap)
    g0 = build_graph(jnp.asarray(coords), jnp.asarray(np.ones(cap, bool)),
                     specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g0, jnp.ones((cap, 1)),
                           train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def vox_fn(points, pmask, transforms, radius):
        bb, cc, pp, _ = points.shape
        vox = voxelize_per_cloud(points.reshape(bb * cc, pp, 3),
                                 pmask.reshape(bb * cc, pp),
                                 cfg.voxel_size, cfg.nv_cap)
        return jnp.sum(vox.coords), jnp.sum(vox.mask)

    def groups_fn(points, pmask, transforms, radius):
        bb, cc, pp, _ = points.shape
        vox = voxelize_per_cloud(points.reshape(bb * cc, pp, 3),
                                 pmask.reshape(bb * cc, pp),
                                 cfg.voxel_size, cfg.nv_cap)
        vox_b = jax.tree_util.tree_map(
            lambda x: x.reshape((bb, cc) + x.shape[1:]), vox)
        groups = batch_colocation_groups(vox_b, transforms,
                                         radius, k=cfg.group_k,
                                         chunk=cfg.knn_chunk,
                                         cell=cfg.search_cell,
                                         cell_cap=cfg.cell_cap)
        return jnp.sum(groups.member_idx), jnp.sum(groups.valid)

    def graph_fn(points, pmask, transforms, radius):
        # mirrors the real step's build exactly (fused implicit maps)
        bb, cc, pp, _ = points.shape
        vox = voxelize_per_cloud(points.reshape(bb * cc, pp, 3),
                                 pmask.reshape(bb * cc, pp),
                                 cfg.voxel_size, cfg.nv_cap)
        flat = vox.flatten()
        graph = build_graph(flat.coords, flat.mask, specs, cfg.level_caps,
                            sorted_blocks=True, n_clouds=bb * cc)
        tot = jnp.zeros((), jnp.int32)
        for km in graph.kmaps.values():
            tot = tot + jnp.sum(jnp.asarray(km >= 0, jnp.int32))
        if graph.fused:
            for fm in graph.fused.values():
                tot = (tot + jnp.sum(fm.qkey) + jnp.sum(fm.starts)
                       + jnp.sum(fm.nch) + jnp.sum(fm.tkeys[0]))
        return tot

    def fwd_fn(params, points, pmask, transforms, radius):
        bb, cc, pp, _ = points.shape
        vox = voxelize_per_cloud(points.reshape(bb * cc, pp, 3),
                                 pmask.reshape(bb * cc, pp),
                                 cfg.voxel_size, cfg.nv_cap)
        flat = vox.flatten()
        graph = build_graph(flat.coords, flat.mask, specs, cfg.level_caps,
                            sorted_blocks=True, n_clouds=bb * cc)
        f = model.apply({"params": params, "batch_stats": batch_stats},
                        graph, flat.feats.astype(cfg.compute_dtype),
                        train=False)
        return jnp.sum(f.astype(jnp.float32))

    grad_fn = make_gcl_grad_fn(
        model, specs, cfg, GCLLossConfig(block_finest_gradient=False),
        "finest", max_pos_cluster=256 * b, max_hn_samples=256 * b,
        pos_weight=1.0, finest_weight=1.0, neg_weight=1.0)

    def grad_wrap(params, points, pmask, transforms, radius):
        grads, _, metrics = grad_fn(params, batch_stats,
                                    jax.random.PRNGKey(2), points, pmask,
                                    transforms, radius)
        # consume the grads: returning only the loss lets XLA dead-code
        # the entire backward pass out of this phase
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return metrics["loss"] + 0.0 * gsum

    tx, step = make_gcl_train_step(
        model, specs, cfg, GCLLossConfig(block_finest_gradient=False),
        "finest", max_pos_cluster=256 * b, max_hn_samples=256 * b,
        pos_weight=1.0, finest_weight=1.0, neg_weight=1.0)
    state = TrainState(params, batch_stats, tx.init(params),
                       jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))

    def full_fn(points, pmask, transforms, radius):
        st, metrics = step(state, 0.1, points, pmask, transforms, radius)
        return metrics["loss"]

    phases = {
        "vox": jax.jit(vox_fn),
        "groups": jax.jit(groups_fn),
        "graph": jax.jit(graph_fn),
        "fwd": jax.jit(lambda *a: fwd_fn(params, *a)),
        "grad": jax.jit(lambda *a: grad_wrap(params, *a)),
        "full": full_fn,
    }
    want = sys.argv[1:] or list(phases)
    for name in want:
        fn = phases[name]
        out = fn(*args)
        # force sync (axon block_until_ready caveat — see verify skill)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"phase": name, "time_s": round(dt, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
