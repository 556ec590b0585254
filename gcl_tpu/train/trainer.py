"""Trainer classes — same names and lifecycle as the reference
(lib/trainer.py:29-175, lib/colocation_trainer.py:403-916): model built
from the registry with in_channels=1 occupancy features, SGD + per-epoch
ExponentialLR, config.json dump, per-epoch checkpoint + best-val
checkpoint on config.best_val_metric, resume with optional
finetune_restart.
"""
from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.kernel_maps import default_level_caps
from ..losses.gcl import GCLLossConfig
from ..models import load_model
from ..train import checkpoint as ckpt
from ..train.steps import (StepConfig, TrainState, make_optimizer,
                           make_val_step)
from ..train.writer import SummaryWriter
from ..utils.timer import AverageMeter, Timer


def build_step_config(config, model_cls) -> StepConfig:
    specs = model_cls.conv_specs(config.conv1_kernel_size)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    # flat level-0 capacity depends on clouds per batch; set by trainer
    return specs, strides


class AlignmentTrainer:
    """Base trainer (reference lib/trainer.py:29-175)."""

    loss_kind = None  # subclasses set

    def __init__(self, config, data_loader, val_data_loader=None):
        num_feats = 1  # occupancy

        model_cls = load_model(config.model)
        if model_cls is None:
            raise ValueError(f"unknown model {config.model}")
        self.model_cls = model_cls
        self.config = config
        self.max_epoch = config.max_epoch
        self.save_freq = config.save_freq_epoch
        self.val_max_iter = config.val_max_iter
        self.val_epoch_freq = config.val_epoch_freq
        self.best_val_metric = config.best_val_metric
        self.best_val_epoch = -np.inf
        self.best_val = -np.inf
        self.start_epoch = 1
        self.checkpoint_dir = config.out_dir
        self.iter_size = config.iter_size
        self.batch_size = data_loader.batch_size
        self.data_loader = data_loader
        self.val_data_loader = val_data_loader
        self.test_valid = val_data_loader is not None

        # Data parallelism: a 1-D 'data' mesh over the visible devices;
        # each device runs the full per-shard pipeline, gradients are
        # psum-reduced over ICI (parallel/mesh.py — new TPU-first design,
        # the reference is single-GPU, SURVEY.md §2.8). Static capacities
        # below are PER SHARD.
        self.mesh = None
        dp = str(getattr(config, "data_parallel", "false")).lower()
        n_avail = len(jax.devices())
        n_req = getattr(config, "num_devices", 0) or n_avail
        n_dev = max(1, min(n_req, n_avail))
        want_dp = dp == "true" or (dp == "auto" and n_dev > 1
                                   and self.batch_size % n_dev == 0)
        if want_dp:
            if self.batch_size % n_dev:
                raise ValueError(
                    f"data_parallel: batch_size {self.batch_size} not "
                    f"divisible by {n_dev} devices")
            if jax.process_count() > 1 and n_dev != n_avail:
                # host_to_global assembles per-host loader slices over a
                # mesh of ALL devices; a partial mesh would leave some
                # local devices outside the sharding
                raise ValueError(
                    "data_parallel: --num_devices must cover every "
                    f"device on multi-host meshes ({n_dev} requested, "
                    f"{n_avail} visible)")
            from ..parallel import make_mesh
            self.mesh = make_mesh(n_dev)
            logging.info(f"Data-parallel over {n_dev} devices "
                         f"({self.batch_size // n_dev} samples/device)")
        self.n_shards = n_dev if self.mesh is not None else 1
        self.shard_batch = self.batch_size // self.n_shards

        # Kernel tuning comes from the config (persisted in config.json)
        # rather than env vars, so a run is reproducible from its config
        from ..core.pallas_conv import configure_from
        configure_from(config)

        self.clouds_per_sample = self._clouds_per_sample()
        self.specs = model_cls.conv_specs(config.conv1_kernel_size)
        strides = sorted({s for sp in self.specs
                          for s in (sp.in_stride, sp.out_stride)})
        n_flat = (config.voxel_capacity * self.clouds_per_sample
                  * self.shard_batch)
        n_flat_side = config.voxel_capacity * self.batch_size
        cell = getattr(config, "search_cell", -1.0)
        if cell is not None and cell < 0:
            # auto: 2x the largest matching radius (incl. max random scale)
            mult = config.positive_pair_search_voxel_size_multiplier
            scale = max(1.0, getattr(config, "max_scale", 1.0) or 1.0)
            cell = 2.0 * config.voxel_size * mult * scale
        if not cell:  # 0 / None -> brute force
            cell = None
        self.step_cfg = StepConfig(
            voxel_size=config.voxel_size,
            nv_cap=config.voxel_capacity,
            level_caps=default_level_caps(n_flat, strides,
                                          config.level_cap_shrink),
            group_k=config.group_k,
            corr_k=config.corr_k,
            pos_pair_cap=config.pos_pair_capacity,
            knn_chunk=config.knn_chunk,
            search_cell=cell,
            cell_cap=getattr(config, "search_cell_cap", 8),
            member_r_cap=getattr(config, "member_r_cap", 32),
            neg_filter=getattr(config, "neg_filter", "spatial"),
            momentum=config.momentum,
            weight_decay=config.weight_decay,
            jitter_mode=getattr(config, "jitter_mode", "input"),
            compute_dtype=(jnp.bfloat16
                           if config.compute_dtype == "bfloat16"
                           else jnp.float32),
        )
        # validation runs on pair batches of val_batch_size
        val_flat = config.voxel_capacity * (val_data_loader.batch_size
                                            if val_data_loader else 1)
        self.val_step_cfg = StepConfig(
            voxel_size=config.voxel_size, nv_cap=config.voxel_capacity,
            level_caps=default_level_caps(val_flat, strides,
                                          config.level_cap_shrink),
            corr_k=config.corr_k, knn_chunk=config.knn_chunk,
            search_cell=self.step_cfg.search_cell,
            cell_cap=self.step_cfg.cell_cap,
            compute_dtype=self.step_cfg.compute_dtype)

        self.model = model_cls(
            num_feats, config.model_n_out, bn_momentum=config.bn_momentum,
            normalize_feature=config.normalize_feature,
            conv1_kernel_size=config.conv1_kernel_size, D=3)

        self._build_steps()
        self._init_state()

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        ckpt.dump_config_json(self.checkpoint_dir, config)
        self.writer = SummaryWriter(config.out_dir)

        if config.weights:
            state = ckpt.load_checkpoint(config.weights)
            self._load_weights(state)
        if config.resume is not None:
            if osp.isfile(config.resume):
                logging.info(f"=> loading checkpoint '{config.resume}'")
                state = ckpt.load_checkpoint(config.resume)
                self._load_weights(state)
                if not config.finetune_restart:
                    self.start_epoch = int(state["epoch"])
                    self.state = self.state._replace(
                        opt_state=ckpt.restore_into(self.state.opt_state,
                                                    state["optimizer"]))
                    if "best_val" in state:
                        self.best_val = state["best_val"]
                        self.best_val_epoch = state["best_val_epoch"]
                        self.best_val_metric = state["best_val_metric"]
                else:
                    logging.info(
                        "=> Finetuning, will only load model weights.")
            else:
                raise ValueError(
                    f"=> no checkpoint found at '{config.resume}'")

    # ------------------------------------------------------------------
    def _clouds_per_sample(self):
        return 1

    def _build_steps(self):
        raise NotImplementedError

    def _steps_from_grad(self, grad_fn):
        """Common step assembly: lift the per-shard grad_fn onto the data
        mesh if one is active, then either the plain one-step-per-batch
        step or the Caffe-style iter_size accumulator (reference
        lib/trainer.py:230-283: grads of loss/iter_size summed over
        iter_size micro-batches, one optimizer step per window)."""
        from ..train.steps import (AccumStepper, make_optimizer,
                                   make_train_step_from_grad)
        if self.mesh is not None:
            from ..parallel import make_global_grad_fn
            grad_fn = make_global_grad_fn(grad_fn, self.mesh)
        tx = make_optimizer(self.step_cfg)
        if self.iter_size > 1:
            return tx, AccumStepper(tx, grad_fn, self.iter_size)
        return tx, make_train_step_from_grad(tx, grad_fn)

    def _epoch_batches(self):
        """Micro-batches for one epoch: with iter_size accumulation only
        full windows run (reference: range(len(loader) // iter_size));
        the accumulator is reset so no partial window leaks across
        epochs."""
        limit = (len(self.data_loader) // self.iter_size) * self.iter_size
        for i, batch in enumerate(self.data_loader):
            if i >= limit:
                break
            yield i, batch
        if hasattr(self.step_fn, "reset"):
            self.step_fn.reset()

    def _init_state(self):
        rng = jax.random.PRNGKey(0)
        k_init, k_state = jax.random.split(rng)
        variables = self._init_variables(k_init)
        tx = make_optimizer(self.step_cfg)
        opt_state = tx.init(variables["params"])
        self.state = TrainState(variables["params"],
                                variables.get("batch_stats", {}),
                                opt_state, k_state, jnp.zeros((), jnp.int32))

    def _init_variables(self, key):
        """Initialize params on a tiny dummy graph (geometry-independent:
        param shapes depend only on channel specs)."""
        from ..core.kernel_maps import build_graph
        from ..core.types import INVALID_BATCH

        cap = 64
        coords = np.zeros((cap, 4), np.int32)
        coords[:, 0] = np.arange(cap) // 16
        coords[:, 1] = np.arange(cap) % 16
        mask = np.ones(cap, bool)
        strides = sorted({s for sp in self.specs
                          for s in (sp.in_stride, sp.out_stride)})
        caps = {s: cap for s in strides}
        g = build_graph(jnp.asarray(coords), jnp.asarray(mask), self.specs,
                        caps)
        feats = jnp.ones((cap, 1), jnp.float32)
        return self.model.init(key, g, feats, train=False)

    def _load_weights(self, state):
        sd = state["state_dict"]
        params = ckpt.restore_into(self.state.params, sd["params"])
        stats = ckpt.restore_into(self.state.batch_stats,
                                  sd.get("batch_stats", {}))
        self.state = self.state._replace(params=params, batch_stats=stats)

    def lr_at(self, epoch):
        """ExponentialLR: lr * gamma^(epoch-1) (scheduler stepped once per
        epoch, reference lib/trainer.py:79,137)."""
        return self.config.lr * self.config.exp_gamma ** (epoch - 1)

    def _feed(self, *arrays):
        """Host batch arrays -> device arrays for step_fn. Data-parallel
        meshes need the per-host loader slices assembled into global
        batch-sharded arrays (multi-host shard_map cannot consume plain
        process-local numpy)."""
        if self.mesh is not None:
            from ..parallel import host_to_global
            return host_to_global(self.mesh, *arrays)
        return tuple(jnp.asarray(a) for a in arrays)

    # ------------------------------------------------------------------
    def train(self):
        if self.test_valid:
            self._val_fns()  # build early so failures surface
        profile_dir = getattr(self.config, "profile_dir", "") or ""
        for epoch in range(self.start_epoch, self.max_epoch + 1):
            lr = self.lr_at(epoch)
            logging.info(f" Epoch: {epoch}, LR: {lr}")
            if profile_dir and epoch == self.start_epoch:
                # xprof-compatible device trace of the first (post-compile)
                # epoch: view with tensorboard --logdir <profile_dir>
                with jax.profiler.trace(profile_dir):
                    self._train_epoch(epoch)
            else:
                self._train_epoch(epoch)
            self._save_checkpoint(epoch)

            if self.test_valid and epoch % self.val_epoch_freq == 0:
                val_dict = self._valid_epoch()
                for k, v in val_dict.items():
                    self.writer.add_scalar(f"val/{k}", v, epoch)
                if self.best_val < val_dict[self.best_val_metric]:
                    logging.info(
                        f"Saving the best val model with "
                        f"{self.best_val_metric}: "
                        f"{val_dict[self.best_val_metric]}")
                    self.best_val = val_dict[self.best_val_metric]
                    self.best_val_epoch = epoch
                    self._save_checkpoint(epoch, "best_val_checkpoint")
                elif self.best_val == val_dict[self.best_val_metric]:
                    # exact tie: keep the first best, also save the
                    # newest (reference lib/colocation_trainer.py:151-155)
                    logging.info(
                        f"Saving the latest best val model (not "
                        f"overriding the first) with "
                        f"{self.best_val_metric}: "
                        f"{val_dict[self.best_val_metric]}")
                    self._save_checkpoint(epoch,
                                          "best_val_newest_checkpoint")
                else:
                    logging.info(
                        f"Current best val model with "
                        f"{self.best_val_metric}: {self.best_val} at epoch "
                        f"{self.best_val_epoch}")

    def _save_checkpoint(self, epoch, filename="checkpoint"):
        path = os.path.join(self.checkpoint_dir, f"{filename}.pth")
        logging.info(f"Saving checkpoint: {path} ...")
        ckpt.save_checkpoint(
            path, epoch=epoch, params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state, config=self.config,
            best_val=self.best_val, best_val_epoch=self.best_val_epoch,
            best_val_metric=self.best_val_metric)

    # ------------------------------------------------------------------
    def _val_fns(self):
        if not hasattr(self, "_val_step"):
            self._val_step = make_val_step(
                self.model, self.specs, self.val_step_cfg,
                subsample=5000,
                hit_ratio_thresh=self.config.hit_ratio_thresh)
        return self._val_step

    def _valid_epoch(self) -> Dict[str, float]:
        """Registration-quality validation (reference
        lib/trainer.py:307-384)."""
        val_step = self._val_fns()
        if hasattr(self.val_data_loader.dataset, "reset_seed"):
            self.val_data_loader.dataset.reset_seed(0)
        meters = {k: AverageMeter()
                  for k in ("loss", "rte", "rre", "hit_ratio",
                            "feat_match_ratio")}
        tot = len(self.val_data_loader.dataset)
        if self.val_max_iter > 0:
            tot = min(self.val_max_iter, tot)
        data_timer, feat_timer = Timer(), Timer()
        seen = 0
        key = jax.random.PRNGKey(0)
        for batch in self.val_data_loader:
            if seen >= tot:
                break
            key, sub = jax.random.split(key)
            feat_timer.tic()
            out = val_step(self.state.params, self.state.batch_stats, sub,
                           jnp.asarray(batch["points0"]),
                           jnp.asarray(batch["pmask0"]),
                           jnp.asarray(batch["points1"]),
                           jnp.asarray(batch["pmask1"]),
                           jnp.asarray(batch["trans"]))
            out = jax.device_get(out)
            feat_timer.toc()
            for i in range(len(out["rte"])):
                if np.isfinite(out["rre"][i]):
                    meters["rre"].update(float(out["rre"][i]))
                meters["rte"].update(float(out["rte"][i]))
                meters["loss"].update(float(out["loss"][i]))
                meters["hit_ratio"].update(float(out["hit_ratio"][i]))
                meters["feat_match_ratio"].update(
                    float(out["hit_ratio"][i] > 0.05))
                seen += 1
            if seen % 100 == 0 and seen > 0:
                logging.info(
                    f"Validation iter {seen} / {tot} : "
                    f"Feature+Match Time: {feat_timer.avg:.3f}, "
                    f"Loss: {meters['loss'].avg:.3f}, "
                    f"RTE: {meters['rte'].avg:.3f}, "
                    f"RRE: {meters['rre'].avg:.3f}, "
                    f"Hit Ratio: {meters['hit_ratio'].avg:.3f}, "
                    f"Feat Match Ratio: "
                    f"{meters['feat_match_ratio'].avg:.3f}")
        logging.info(
            f"Final Loss: {meters['loss'].avg:.3f}, "
            f"RTE: {meters['rte'].avg:.3f}, RRE: {meters['rre'].avg:.3f}, "
            f"Hit Ratio: {meters['hit_ratio'].avg:.3f}, "
            f"Feat Match Ratio: {meters['feat_match_ratio'].avg:.3f}")
        return {k: m.avg for k, m in meters.items()}


class ContrastiveLossTrainer(AlignmentTrainer):
    """Random-negative pair trainer (reference lib/trainer.py:178-405)."""

    trainer_kind = "contrastive"

    def _build_steps(self):
        from ..train.steps import make_pair_grad_fn
        cfg = dict(self.config)
        # per-shard loss sample counts (reference scales by batch_size)
        cfg["batch_size"] = self.shard_batch
        grad_fn = make_pair_grad_fn(self.model, self.specs, self.step_cfg,
                                    self.trainer_kind, cfg)
        self.tx, self.step_fn = self._steps_from_grad(grad_fn)

    def _train_epoch(self, epoch):
        config = self.config
        lr = self.lr_at(epoch)
        data_meter, data_timer, total_timer = (AverageMeter(), Timer(),
                                               Timer())
        start_iter = (epoch - 1) * (len(self.data_loader)
                                    // self.iter_size)
        for curr_iter, batch in self._epoch_batches():
            data_timer.tic()
            args = self._feed(batch["points0"], batch["pmask0"],
                              batch["points1"], batch["pmask1"],
                              batch["trans"], batch["search_radius"])
            data_time = data_timer.toc(average=False)
            total_timer.tic()
            self.state, metrics = self.step_fn(self.state, lr, *args)
            metrics = jax.device_get(metrics)
            total_timer.toc()
            data_meter.update(data_time)

            if curr_iter % (config.stat_freq * self.iter_size) == 0:
                step = start_iter + curr_iter // self.iter_size
                self.writer.add_scalar("train/loss", metrics["loss"], step)
                self.writer.add_scalar("train/pos_loss",
                                       metrics["pos_loss"], step)
                self.writer.add_scalar("train/neg_loss",
                                       metrics["neg_loss"], step)
                logging.info(
                    "Train Epoch: {} [{}/{}], Current Loss: {:.3e} "
                    "Pos: {:.3f} Neg: {:.3f}".format(
                        epoch, curr_iter, len(self.data_loader),
                        metrics["loss"], metrics["pos_loss"],
                        metrics["neg_loss"])
                    + "\tData time: {:.4f}, Train time: {:.4f}".format(
                        data_meter.avg,
                        total_timer.avg - data_meter.avg))
                data_meter.reset()
                total_timer.reset()


class HardestContrastiveLossTrainer(ContrastiveLossTrainer):
    """FCGF default (reference lib/trainer.py:408-540)."""

    trainer_kind = "hardest_contrastive"


class TripletLossTrainer(ContrastiveLossTrainer):
    trainer_kind = "triplet"


class HardestTripletLossTrainer(ContrastiveLossTrainer):
    trainer_kind = "hardest_triplet"


class FinestContrastiveLossTrainer(AlignmentTrainer):
    """The GCL paper's trainer (reference lib/colocation_trainer.py:403-916).
    Loss selected at init: use_group_circle_loss -> circle;
    finest_weight != 0 -> finest; else location (reference :423-428)."""

    def _clouds_per_sample(self):
        return self.config.num_neighborhood + 1

    def __init__(self, config, data_loader, val_data_loader=None):
        if config.use_group_circle_loss:
            self.loss_kind = "circle"
        elif config.finest_weight != 0:
            self.loss_kind = "finest"
        else:
            self.loss_kind = "location"
        self.config = config  # needed by _clouds_per_sample before super
        super().__init__(config, data_loader, val_data_loader)

    def _build_steps(self):
        cfg = self.config
        loss_cfg = GCLLossConfig(
            pos_thresh=cfg.pos_thresh, finest_thresh=cfg.finest_thresh,
            neg_thresh=cfg.neg_thresh, square_loss=cfg.square_loss,
            block_finest_gradient=cfg.block_finest_gradient,
            use_hard_negative=cfg.use_hard_negative,
            use_pair_group_positive_loss=cfg.use_pair_group_positive_loss,
            safe_radius=cfg.safe_radius)
        # per-shard loss sample counts (reference scales by batch_size)
        kwargs = dict(
            max_pos_cluster=cfg.num_pos_per_batch * self.shard_batch,
            max_hn_samples=cfg.num_hn_samples_per_batch * self.shard_batch,
            pos_weight=cfg.pos_weight, finest_weight=cfg.finest_weight,
            neg_weight=cfg.neg_weight, jitter=cfg.jitter_feats)
        from ..train.steps import make_gcl_grad_fn
        grad_fn = make_gcl_grad_fn(self.model, self.specs, self.step_cfg,
                                   loss_cfg, self.loss_kind, **kwargs)
        self.tx, self.step_fn = self._steps_from_grad(grad_fn)

    def _dist_err_epoch(self):
        """--calc_distance_err mode (reference
        lib/colocation_trainer.py:861-916): 20 eval-mode iterations
        collect per-member (distance-to-finest-range, feature-error)
        pairs, dump `dist_err_normal.npz` into the run dir, then abort
        training with ValueError exactly like the reference."""
        from ..train.diagnostics import DistErrCollector
        from ..train.steps import make_dist_err_step

        diag = make_dist_err_step(self.model, self.specs, self.step_cfg)
        coll = DistErrCollector(self.checkpoint_dir, max_iters=20)
        done = False
        for batch in self.data_loader:
            out = diag(self.state.params, self.state.batch_stats,
                       jnp.asarray(batch["points"]),
                       jnp.asarray(batch["pmask"]),
                       jnp.asarray(batch["transforms"]),
                       jnp.asarray(batch["search_radius"]))
            done = coll.update(*jax.device_get(out))
            logging.info(f"dist-err iter {coll.iters}/20")
            if done:
                break
        coll.save("normal")
        raise ValueError("calc_distance_err run complete (reference "
                         "semantics: dump then abort)")

    def _train_epoch(self, epoch):
        config = self.config
        if getattr(config, "calc_distance_err", False):
            return self._dist_err_epoch()
        lr = self.lr_at(epoch)
        data_meter, data_timer, total_timer = (AverageMeter(), Timer(),
                                               Timer())
        start_iter = (epoch - 1) * (len(self.data_loader)
                                    // self.iter_size)
        for curr_iter, batch in self._epoch_batches():
            data_timer.tic()
            args = self._feed(batch["points"], batch["pmask"],
                              batch["transforms"], batch["search_radius"])
            data_time = data_timer.toc(average=False)
            total_timer.tic()
            self.state, metrics = self.step_fn(self.state, lr, *args)
            metrics = jax.device_get(metrics)
            total_timer.toc()
            data_meter.update(data_time)

            if curr_iter % (config.stat_freq * self.iter_size) == 0:
                step = start_iter + curr_iter // self.iter_size
                for tag in ("loss", "pos_loss", "neg_loss"):
                    self.writer.add_scalar(f"train/{tag}", metrics[tag],
                                           step)
                logging.info(
                    "Train Epoch: {} [{}/{}], Current Loss: {:.3e} "
                    "Pos: {:.3f} Neg: {:.3f} Finest: {:.3f}".format(
                        epoch, curr_iter, len(self.data_loader),
                        metrics["loss"], metrics["pos_loss"],
                        metrics["neg_loss"], metrics["finest_loss"])
                    + "\tData time: {:.4f}, Train time: {:.4f}".format(
                        data_meter.avg,
                        total_timer.avg - data_meter.avg))
                data_meter.reset()
                total_timer.reset()


TRAINERS = {
    "ContrastiveLossTrainer": ContrastiveLossTrainer,
    "HardestContrastiveLossTrainer": HardestContrastiveLossTrainer,
    "TripletLossTrainer": TripletLossTrainer,
    "HardestTripletLossTrainer": HardestTripletLossTrainer,
    "FinestContrastiveLossTrainer": FinestContrastiveLossTrainer,
}


def get_trainer(trainer_name):
    """Trainer registry (reference train.py:29-41)."""
    if trainer_name not in TRAINERS:
        raise ValueError(f"Trainer {trainer_name} not found")
    return TRAINERS[trainer_name]
