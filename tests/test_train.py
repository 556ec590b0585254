"""End-to-end trainer tests on the synthetic mini-KITTI: one GCL epoch,
one FCGF epoch, checkpoint save/load, validation metrics.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.config import default_config
from gcl_tpu.data import make_data_loader
from gcl_tpu.data.colocation import ColocationKittiDataset
from gcl_tpu.data.pairs import PairComplementKittiDataset
from gcl_tpu.data.synthetic import generate_synthetic_kitti, write_split_files
from gcl_tpu.train import get_trainer, load_checkpoint


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    generate_synthetic_kitti(str(root), n_drives=1, n_frames=50, step=3.0)
    write_split_files(str(root / "config"), 1)
    for cls in (ColocationKittiDataset, PairComplementKittiDataset):
        cls.DATA_FILES = {
            p: os.path.join(str(root), "config", f"{p}_kitti.txt")
            for p in ("train", "val", "test")}
    return root


def tiny_config(root, out_dir, **kw):
    cfg = default_config(
        kitti_root=str(root), out_dir=str(out_dir),
        voxel_size=0.3, min_dist=3, max_dist=18, num_neighborhood=2,
        point_capacity=4096, voxel_capacity=2048,
        nghb_point_capacity=4096,
        pair_min_dist=3, pair_max_dist=10, complement_pair_dist=3,
        num_complement_one_side=2, use_old_pose=False,
        batch_size=2, val_batch_size=1, max_epoch=1, val_max_iter=2,
        num_pos_per_batch=64, num_hn_samples_per_batch=64,
        model="ResUNetBN2C", conv1_kernel_size=3, model_n_out=16,
        pos_pair_capacity=1 << 15, knn_chunk=256,
        hit_ratio_thresh=0.3, stat_freq=1,
        use_random_rotation=True, use_random_scale=True,
        train_num_thread=0, val_num_thread=0)
    cfg.update(kw)
    return cfg


def small_loaders(cfg, train=True):
    tl = make_data_loader(cfg, "train", cfg.batch_size, num_threads=0)
    vl = make_data_loader(cfg, "val", cfg.val_batch_size, num_threads=0)
    # shrink datasets for test speed
    tl.dataset.files = tl.dataset.files[:4]
    vl.dataset.files = vl.dataset.files[:2]
    return tl, vl


class TestGCLTrainer:
    def test_one_epoch_and_checkpoint(self, synth_env, tmp_path):
        cfg = tiny_config(synth_env, tmp_path / "run",
                          trainer="FinestContrastiveLossTrainer",
                          finest_weight=1.0, block_finest_gradient=False)
        tl, vl = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, vl)
        p_before = jax.device_get(trainer.state.params)
        trainer.train()
        p_after = jax.device_get(trainer.state.params)
        # parameters moved
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        # checkpoints written with the reference's layout
        assert os.path.exists(tmp_path / "run" / "checkpoint.pth")
        assert os.path.exists(tmp_path / "run" / "config.json")
        state = load_checkpoint(str(tmp_path / "run" / "checkpoint.pth"))
        assert state["epoch"] == 1
        assert "state_dict" in state and "optimizer" in state

    def test_resume(self, synth_env, tmp_path):
        cfg = tiny_config(synth_env, tmp_path / "run2",
                          trainer="FinestContrastiveLossTrainer",
                          max_epoch=1)
        tl, vl = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        trainer.train()
        ck = str(tmp_path / "run2" / "checkpoint.pth")
        cfg2 = tiny_config(synth_env, tmp_path / "run2b",
                           trainer="FinestContrastiveLossTrainer",
                           max_epoch=1, resume=ck)
        tl2, _ = small_loaders(cfg2)
        trainer2 = get_trainer(cfg2.trainer)(cfg2, tl2, None)
        a = jax.tree_util.tree_leaves(trainer.state.params)
        b = jax.tree_util.tree_leaves(trainer2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert trainer2.start_epoch == 1


class TestProfileDir:
    def test_profile_dir_writes_parseable_trace(self, synth_env, tmp_path):
        """--profile_dir wraps the first epoch in jax.profiler.trace; the
        emitted .xplane.pb must decode with the bundled reader
        (gcl_tpu.utils.xplane — the profiling subsystem end to end)."""
        import glob

        prof = str(tmp_path / "prof")
        cfg = tiny_config(synth_env, tmp_path / "runp",
                          trainer="FinestContrastiveLossTrainer",
                          finest_weight=1.0, profile_dir=prof)
        tl, _ = small_loaders(cfg)
        tl.dataset.files = tl.dataset.files[:2]
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        trainer.train()
        pbs = glob.glob(os.path.join(prof, "plugins", "profile", "*",
                                     "*.xplane.pb"))
        assert pbs, f"no .xplane.pb under {prof}"
        from gcl_tpu.utils.xplane import parse_xspace
        planes = parse_xspace(pbs[0])
        n_events = sum(len(line.events) for p in planes
                       for line in p.lines)
        assert n_events > 0


class TestDistErrFlag:
    def test_calc_distance_err_dumps_and_aborts(self, synth_env,
                                                tmp_path):
        """--calc_distance_err runs diagnostic iterations, writes
        dist_err_normal.npz and aborts with ValueError (reference
        lib/colocation_trainer.py:911-916)."""
        cfg = tiny_config(synth_env, tmp_path / "derr",
                          trainer="FinestContrastiveLossTrainer",
                          finest_weight=1.0, calc_distance_err=True)
        tl, _ = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        with pytest.raises(ValueError, match="calc_distance_err"):
            trainer.train()
        path = tmp_path / "derr" / "dist_err_normal.npz"
        assert path.exists()
        data = np.load(path)
        assert len(data["distance"]) == len(data["err"])
        assert len(data["distance"]) > 0
        assert np.isfinite(data["err"]).all()


class TestDataParallelTrainer:
    def test_gcl_dp_epoch(self, synth_env, tmp_path):
        """--data_parallel true shards the batch over the device mesh
        from inside the product trainer (VERDICT round-1 item 4); grad
        parity with the single-chip step is covered by
        tests/test_parallel.py::test_grad_matches_mean_of_shards."""
        cfg = tiny_config(synth_env, tmp_path / "dp",
                          trainer="FinestContrastiveLossTrainer",
                          finest_weight=1.0, data_parallel="true",
                          num_devices=2, batch_size=2)
        tl, _ = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        assert trainer.mesh is not None and trainer.n_shards == 2
        assert trainer.shard_batch == 1
        p_before = jax.device_get(trainer.state.params)
        trainer.train()
        p_after = jax.device_get(trainer.state.params)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    def test_fcgf_dp_epoch(self, synth_env, tmp_path):
        cfg = tiny_config(synth_env, tmp_path / "dpf",
                          trainer="HardestContrastiveLossTrainer",
                          train_dataset="PairComplementKittiDataset",
                          data_parallel="true", num_devices=2,
                          batch_size=2)
        tl, _ = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        assert trainer.mesh is not None and trainer.n_shards == 2
        trainer.train()
        assert os.path.exists(tmp_path / "dpf" / "checkpoint.pth")


class TestFCGFTrainer:
    def test_one_epoch(self, synth_env, tmp_path):
        cfg = tiny_config(synth_env, tmp_path / "fcgf",
                          trainer="HardestContrastiveLossTrainer",
                          train_dataset="PairComplementKittiDataset")
        tl, vl = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, vl)
        trainer.train()
        assert os.path.exists(tmp_path / "fcgf" / "checkpoint.pth")

    def test_val_metrics_sane(self, synth_env, tmp_path):
        cfg = tiny_config(synth_env, tmp_path / "val",
                          trainer="HardestContrastiveLossTrainer",
                          train_dataset="PairComplementKittiDataset")
        tl, vl = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, vl)
        out = trainer._valid_epoch()
        for k in ("loss", "rte", "rre", "hit_ratio", "feat_match_ratio"):
            assert k in out and np.isfinite(out[k])


class TestJitterModeC1z:
    def test_gcl_epoch_with_c1z_jitter_mode(self, synth_env, tmp_path):
        """--jitter_mode c1z trains end to end. On CPU the fused/c1z
        kernels are unavailable, so this exercises the SparseConv-owned
        reference-exact input-jitter fallback plus the rngs plumbing;
        the c1z injection itself is covered kernel-level in
        test_core.TestC1zJitteredConv."""
        cfg = tiny_config(synth_env, tmp_path / "runjc",
                          trainer="FinestContrastiveLossTrainer",
                          jitter_mode="c1z")
        tl, vl = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        p_before = jax.device_get(trainer.state.params)
        trainer.train()
        p_after = jax.device_get(trainer.state.params)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0


class TestSampleGates:
    def test_gate_constant_within_sample(self):
        """The jitter p-gate is one draw per sample (reference
        lib/transforms.py:25 runs per __getitem__): every row of a
        sample shares the gate, p=0/1 are exact, and out-of-range
        padding rows clip into a valid sample (their noise is masked
        elsewhere)."""
        from gcl_tpu.train.steps import _sample_gates
        key = jax.random.PRNGKey(3)
        row_to_sample = jnp.asarray(
            np.repeat(np.arange(4, dtype=np.int32), 10))
        g = np.asarray(_sample_gates(key, 0.5, 4, row_to_sample))
        assert set(np.unique(g)) <= {0.0, 1.0}
        for s in range(4):
            assert len(np.unique(g[s * 10:(s + 1) * 10])) == 1
        assert np.all(np.asarray(_sample_gates(key, 1.0, 4,
                                               row_to_sample)) == 1.0)
        assert np.all(np.asarray(_sample_gates(key, 0.0, 4,
                                               row_to_sample)) == 0.0)
        # rows flagged with the padding batch id clip to a valid gate
        pad_rows = jnp.full((5,), 10 ** 6, jnp.int32)
        gp = np.asarray(_sample_gates(key, 0.5, 4, pad_rows))
        assert gp.shape == (5,)


class TestIterSizeAccumulation:
    def test_accum_equals_one_step_on_mean_gradient(self):
        """iter_size=2 over two fixed micro-batches == one SGD step on the
        averaged gradient (reference lib/trainer.py:230-283: grads of
        loss/iter_size accumulate, one optimizer.step per window)."""
        from gcl_tpu.train.steps import (AccumStepper, StepConfig,
                                         TrainState, _apply_sgd,
                                         make_optimizer)

        cfg = StepConfig(voxel_size=1.0, nv_cap=8, level_caps={1: 8},
                         momentum=0.8, weight_decay=1e-2)
        tx = make_optimizer(cfg)

        def grad_fn(params, batch_stats, rng, x):
            # loss = 0.5 * sum((w - x)^2); grad = w - x
            g = {"w": params["w"] - x}
            stats = {"seen": batch_stats["seen"] + 1}
            return g, stats, {"loss": jnp.sum(g["w"] ** 2)}

        params = {"w": jnp.arange(4.0)}
        state = TrainState(params, {"seen": jnp.zeros(())},
                           tx.init(params), jax.random.PRNGKey(0),
                           jnp.zeros((), jnp.int32))
        xa = jnp.array([1.0, -2.0, 3.0, 0.5])
        xb = jnp.array([-1.0, 4.0, 0.0, 2.0])

        stepper = AccumStepper(tx, grad_fn, iter_size=2)
        s1, _ = stepper(state, 0.1, xa)
        # mid-window: params unchanged, BN stats advanced
        np.testing.assert_array_equal(np.asarray(s1.params["w"]),
                                      np.asarray(params["w"]))
        assert float(s1.batch_stats["seen"]) == 1
        assert int(s1.step) == 0
        s2, _ = stepper(s1, 0.1, xb)
        assert int(s2.step) == 1

        # oracle: one step on the mean gradient
        g_mean = {"w": ((params["w"] - xa) + (params["w"] - xb)) / 2}
        want, _ = _apply_sgd(tx, g_mean, tx.init(params), params, 0.1)
        np.testing.assert_allclose(np.asarray(s2.params["w"]),
                                   np.asarray(want["w"]), rtol=1e-6)

    def test_reset_discards_partial_window(self):
        from gcl_tpu.train.steps import (AccumStepper, StepConfig,
                                         TrainState, make_optimizer)
        cfg = StepConfig(voxel_size=1.0, nv_cap=8, level_caps={1: 8})
        tx = make_optimizer(cfg)

        def grad_fn(params, batch_stats, rng, x):
            return {"w": params["w"] - x}, batch_stats, {}

        params = {"w": jnp.ones(2)}
        state = TrainState(params, {}, tx.init(params),
                           jax.random.PRNGKey(0), jnp.zeros((), jnp.int32))
        stepper = AccumStepper(tx, grad_fn, iter_size=3)
        s1, _ = stepper(state, 0.1, jnp.zeros(2))
        stepper.reset()
        # a fresh window after reset behaves like a clean start
        s2, _ = stepper(s1, 0.1, jnp.full(2, 9.0))
        np.testing.assert_array_equal(np.asarray(s2.params["w"]),
                                      np.asarray(params["w"]))
        assert stepper._count == 1

    def test_gcl_trainer_epoch_with_iter_size(self, synth_env, tmp_path):
        """The trainer runs full windows only: 2 loader batches at
        iter_size=2 -> exactly one optimizer step."""
        cfg = tiny_config(synth_env, tmp_path / "run_is",
                          trainer="FinestContrastiveLossTrainer",
                          iter_size=2, batch_size=1)
        tl, _ = small_loaders(cfg)
        trainer = get_trainer(cfg.trainer)(cfg, tl, None)
        n_windows = len(tl) // 2
        assert n_windows >= 1
        p_before = jax.device_get(trainer.state.params)
        trainer.train()
        assert int(trainer.state.step) == n_windows
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), p_before,
            jax.device_get(trainer.state.params))
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
