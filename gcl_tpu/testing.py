"""Test/check-leg helpers.

The production kernel paths are Mosaic (Pallas) kernels that only compile
on TPU; `kernel_interpret()` forces every dispatch site to take the Pallas
path in INTERPRET mode instead of the XLA fallback, so off-TPU checks
(pytest on CPU, the driver's dryrun_multichip) trace the exact kernel
signatures and index math that production uses. A kernel-signature
regression (e.g. a changed required kwarg) then fails in seconds on CPU
instead of only at TPU bench time.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def kernel_interpret():
    """Force all Pallas kernel dispatch sites into interpret mode.

    Covers: the fused conv forward/backward + presence (c1z) kernels
    (core.sparse_ops.FORCE_INTERPRET), the fused kernel-map selection in
    build_graph (core.kernel_maps.FORCE_FUSED_INTERPRET), and the
    windowed cell-top-k group search
    (data.device_pipeline.FORCE_INTERPRET). No-op on TPU backends where
    the kernels compile natively anyway.
    """
    from .core import kernel_maps, sparse_ops
    from .data import device_pipeline

    prev = (sparse_ops.FORCE_INTERPRET, kernel_maps.FORCE_FUSED_INTERPRET,
            device_pipeline.FORCE_INTERPRET)
    sparse_ops.FORCE_INTERPRET = True
    kernel_maps.FORCE_FUSED_INTERPRET = True
    device_pipeline.FORCE_INTERPRET = True
    try:
        yield
    finally:
        (sparse_ops.FORCE_INTERPRET, kernel_maps.FORCE_FUSED_INTERPRET,
         device_pipeline.FORCE_INTERPRET) = prev


def tiny_kernel_exec(cap: int = 64, n_clouds: int = 2,
                     points_per_cloud: int = 128) -> dict:
    """EXECUTE the production Pallas kernels in interpret mode on tiny
    shapes — catches index-math / out-of-bounds kernel bugs that the
    trace-only leg (tiny_gcl_interpret_step) cannot see, at ~1 min on
    one CPU instead of the ~5 min a full-step interpret execute costs.

    Covers, with real compute and value checks:
      * fused kernel-map construction (build_graph in interpret mode);
      * every ResUNetFatBN conv forward + one-pass fused backward,
        including the Cin==1 presence kernels on conv1 (value_and_grad
        through model.apply);
      * the windowed cell-top-k radius search used by the colocation
        group builder (build_colocation_groups with an explicit cell).

    Returns {"out_sumsq", "grad_norm", "n_groups"} after asserting all
    are finite / positive.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .core.kernel_maps import build_graph
    from .data.device_pipeline import (build_colocation_groups,
                                       voxelize_per_cloud)
    from .models.resunet import ResUNetFatBN

    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})

    with kernel_interpret():
        coords = np.zeros((cap, 4), np.int32)
        coords[:, 1] = np.arange(cap)
        g = build_graph(jnp.asarray(coords),
                        jnp.asarray(np.ones(cap, bool)), specs,
                        {s: cap for s in strides})
        variables = model.init(jax.random.PRNGKey(0), g,
                               jnp.ones((cap, 1)), train=False)

        # target projection: sum(out^2) would be constant under the
        # model's feature normalization (zero gradient everywhere)
        tgt = jnp.asarray(
            np.random.RandomState(1).randn(cap, 32).astype(np.float32))

        def f(params, feats):
            out = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, g, feats,
                train=False)
            return jnp.sum((out - tgt) ** 2)

        val, grads = jax.jit(jax.value_and_grad(f))(
            variables["params"], jnp.ones((cap, 1)))
        gnorm = jnp.sqrt(sum(
            jnp.sum(x * x) for x in jax.tree_util.tree_leaves(grads)))
        jax.block_until_ready(val)

        rng = np.random.RandomState(0)
        pts = jnp.asarray(
            rng.randn(n_clouds, points_per_cloud, 3).astype(np.float32)
            * 3)
        vox = voxelize_per_cloud(pts, jnp.ones((n_clouds,
                                                points_per_cloud), bool),
                                 0.5, cap)
        eye = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                          (n_clouds, 4, 4)).copy())
        groups = jax.jit(lambda v, t: build_colocation_groups(
            v, t, 0.8, k=4, chunk=128, cell=1.6))(vox, eye)
        n_groups = int(jnp.sum(groups.valid))

    assert bool(jnp.isfinite(val)), f"non-finite kernel forward: {val}"
    assert float(gnorm) > 0, "zero gradient through the fused backward"
    assert n_groups > 0, "windowed top-k search produced no groups"
    return {"out_sumsq": float(val), "grad_norm": float(gnorm),
            "n_groups": n_groups}


def tiny_gcl_interpret_step(nv: int = 128, n_clouds: int = 2,
                            points_per_cloud: int = 192,
                            execute: bool = False):
    """One full GCL train step at tiny shapes through the Pallas kernels
    in interpret mode.

    This is the kernel-smoke contract shared by tests/test_kernel_smoke.py
    and __graft_entry__.dryrun_multichip: it traces windowed_cell_topk,
    the fused conv fwd/bwd and the c1z presence kernels with
    interpret=True, so any kernel signature/shape breakage fails off-TPU.

    By default only traces/lowers the step (signature breakage like the
    round-2 missing-ROWB bug raises at trace time) and returns None —
    compiling the interpret-mode kernels on CPU takes minutes, which is
    too slow for a pre-snapshot smoke. Pass execute=True to also compile
    and run one step; then returns the metrics dict (loss checked finite).
    Compute stays float32: CPU XLA cannot execute bf16 dots.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .core.kernel_maps import build_graph, default_level_caps
    from .losses.gcl import GCLLossConfig
    from .models.resunet import ResUNetFatBN
    from .train.steps import (StepConfig, TrainState, make_gcl_train_step)

    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    cfg = StepConfig(voxel_size=0.5, nv_cap=nv,
                     level_caps=default_level_caps(nv * n_clouds, strides,
                                                   0.8),
                     knn_chunk=128, pos_pair_cap=1 << 12,
                     search_cell=1.6, compute_dtype=jnp.float32)

    with kernel_interpret():
        tx, step = make_gcl_train_step(
            model, specs, cfg, GCLLossConfig(), "finest",
            max_pos_cluster=16, max_hn_samples=32, pos_weight=1.0,
            finest_weight=1.0, neg_weight=1.0)

        cap = 64
        coords = np.zeros((cap, 4), np.int32)
        coords[:, 1] = np.arange(cap)
        g = build_graph(jnp.asarray(coords),
                        jnp.asarray(np.ones(cap, bool)), specs,
                        {s: cap for s in strides})
        variables = model.init(jax.random.PRNGKey(0), g,
                               jnp.ones((cap, 1)), train=False)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]),
                           jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))

        rng = np.random.RandomState(0)
        b = 1
        points = jnp.asarray(
            rng.randn(b, n_clouds, points_per_cloud, 3).astype(np.float32)
            * 4)
        pmask = jnp.ones((b, n_clouds, points_per_cloud), bool)
        transforms = jnp.asarray(np.broadcast_to(
            np.eye(4, dtype=np.float32), (b, n_clouds, 4, 4)).copy())
        radius = jnp.full((b,), 0.8, jnp.float32)

        if not execute:
            step.lower(state, 0.1, points, pmask, transforms, radius)
            return None
        state, metrics = step(state, 0.1, points, pmask, transforms,
                              radius)
        jax.block_until_ready(metrics["loss"])
    assert bool(jnp.isfinite(metrics["loss"])), \
        f"non-finite interpret-mode loss: {metrics['loss']}"
    return metrics
