"""Data-parallel training on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.core.kernel_maps import default_level_caps
from gcl_tpu.losses.gcl import GCLLossConfig
from gcl_tpu.models.resunet import ResUNetBN2C
from gcl_tpu.parallel import make_mesh, make_parallel_train_step
from gcl_tpu.train.steps import (StepConfig, TrainState, make_gcl_grad_fn,
                                 make_optimizer)


def build(model_cls=ResUNetBN2C, nv=256, n_clouds=3, b=8):
    model = model_cls(1, 16, bn_momentum=0.05, normalize_feature=True,
                      conv1_kernel_size=3, D=3)
    specs = model_cls.conv_specs(3)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    # per-device level caps: shard batch of b over n_dev devices
    n_dev = len(jax.devices())
    per_dev_flat = nv * n_clouds * (b // n_dev)
    cfg = StepConfig(voxel_size=0.4, nv_cap=nv,
                     level_caps=default_level_caps(per_dev_flat, strides,
                                                   0.8),
                     knn_chunk=128, pos_pair_cap=1 << 14)
    return model, specs, cfg


def init_state(model, specs, cfg, key):
    import numpy as np

    from gcl_tpu.core.kernel_maps import build_graph
    cap = 64
    coords = np.zeros((cap, 4), np.int32)
    coords[:, 1] = np.arange(cap)
    mask = np.ones(cap, bool)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    g = build_graph(jnp.asarray(coords), jnp.asarray(mask), specs,
                    {s: cap for s in strides})
    variables = model.init(key, g, jnp.ones((cap, 1)), train=False)
    tx = make_optimizer(cfg)
    return TrainState(variables["params"], variables["batch_stats"],
                      tx.init(variables["params"]), key,
                      jnp.zeros((), jnp.int32))


class TestParallel:
    def test_8device_gcl_step(self, rng):
        assert len(jax.devices()) == 8
        b, c, p = 8, 3, 512
        model, specs, cfg = build(b=b, n_clouds=c)
        mesh = make_mesh()
        grad_fn = make_gcl_grad_fn(
            model, specs, cfg, GCLLossConfig(), "finest",
            max_pos_cluster=32, max_hn_samples=64, pos_weight=1.0,
            finest_weight=1.0, neg_weight=1.0, jitter=True)
        tx, step = make_parallel_train_step(grad_fn, cfg, mesh)

        state = init_state(model, specs, cfg, jax.random.PRNGKey(0))
        points = rng.randn(b, c, p, 3).astype(np.float32) * 8
        pmask = np.ones((b, c, p), bool)
        transforms = np.broadcast_to(np.eye(4, dtype=np.float32),
                                     (b, c, 4, 4)).copy()
        radius = np.full((b,), 0.9, np.float32)

        state2, metrics = step(state, 0.1, jnp.asarray(points),
                               jnp.asarray(pmask), jnp.asarray(transforms),
                               jnp.asarray(radius))
        metrics = jax.device_get(metrics)
        assert np.isfinite(metrics["loss"])
        assert metrics["num_groups"] > 0
        # params updated and replicated (identical across devices)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state.params, state2.params)
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_grad_matches_mean_of_shards(self, rng):
        """pmean'd parallel gradients == mean of per-shard gradients
        computed serially with the same per-device RNG folding."""
        b, c, p = 8, 2, 256
        model, specs, cfg = build(b=b, n_clouds=c, nv=128)
        mesh = make_mesh()
        grad_fn = make_gcl_grad_fn(
            model, specs, cfg, GCLLossConfig(), "finest",
            max_pos_cluster=16, max_hn_samples=32, pos_weight=1.0,
            finest_weight=1.0, neg_weight=1.0, jitter=False)
        tx, step = make_parallel_train_step(grad_fn, cfg, mesh)
        state = init_state(model, specs, cfg, jax.random.PRNGKey(1))

        points = rng.randn(b, c, p, 3).astype(np.float32) * 8
        pmask = np.ones((b, c, p), bool)
        transforms = np.broadcast_to(np.eye(4, dtype=np.float32),
                                     (b, c, 4, 4)).copy()
        radius = np.full((b,), 0.9, np.float32)
        args = (jnp.asarray(points), jnp.asarray(pmask),
                jnp.asarray(transforms), jnp.asarray(radius))

        lr = 0.1
        state2, _ = step(state, lr, *args)

        # serial oracle
        rng_step, k = jax.random.split(state.rng)
        n_dev = 8
        per = b // n_dev
        grads_sum = None
        for d in range(n_dev):
            kd = jax.random.fold_in(k, d)
            sl = slice(d * per, (d + 1) * per)
            g, _, _ = grad_fn(state.params, state.batch_stats, kd,
                              args[0][sl], args[1][sl], args[2][sl],
                              args[3][sl])
            grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
                jnp.add, grads_sum, g)
        grads_mean = jax.tree_util.tree_map(lambda x: x / n_dev, grads_sum)
        updates, _ = tx.update(grads_mean, state.opt_state, state.params)
        want = jax.tree_util.tree_map(lambda p_, u: p_ - lr * u,
                                      state.params, updates)
        got_flat = jax.tree_util.tree_leaves(state2.params)
        want_flat = jax.tree_util.tree_leaves(want)
        for a, w in zip(got_flat, want_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                       atol=1e-4)


class TestHostToGlobal:
    def test_single_process_device_put_with_sharding(self):
        """host_to_global on a single process = device_put with the
        batch sharding: values identical, arrays sharded by sample over
        the mesh (the multi-host make_array_from_process_local_data
        branch shares the same sharding contract)."""
        from gcl_tpu.parallel import batch_sharding, host_to_global, make_mesh

        mesh = make_mesh(8)
        a = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
        b = np.arange(8, dtype=np.int32)
        ga, gb = host_to_global(mesh, a, b)
        np.testing.assert_array_equal(np.asarray(ga), a)
        np.testing.assert_array_equal(np.asarray(gb), b)
        assert ga.sharding == batch_sharding(mesh)
        assert len({d.id for d in ga.sharding.device_set}) == 8
