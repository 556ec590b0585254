"""Trace the --data_parallel bench step on a 1-chip mesh to find where
its time goes (it measured ~20x slower than the plain step on v5e).

Usage: python -u scripts/probe_dp.py [trace_dir]
"""
import collections
import glob
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_dp"
    import jax
    import jax.numpy as jnp

    from bench import synth_lidar
    from gcl_tpu.core.kernel_maps import build_graph, default_level_caps
    from gcl_tpu.losses.gcl import GCLLossConfig
    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.parallel import make_mesh
    from gcl_tpu.parallel.mesh import host_to_global, \
        make_parallel_train_step
    from gcl_tpu.train.steps import (StepConfig, TrainState,
                                     make_gcl_grad_fn)

    b, n_clouds = 4, 7
    n_dev = 1
    p_cap, nv_cap = 65536, 18432
    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    n_flat = b * n_clouds * nv_cap
    cfg = StepConfig(voxel_size=0.3, nv_cap=nv_cap,
                     level_caps=default_level_caps(n_flat, strides, 0.55),
                     knn_chunk=1024, pos_pair_cap=1 << 21,
                     search_cell=1.08, compute_dtype=jnp.bfloat16)
    loss_args = dict(max_pos_cluster=256 * b, max_hn_samples=256 * b,
                     pos_weight=1.0, finest_weight=1.0, neg_weight=1.0)
    mesh = make_mesh(n_dev)
    grad_fn = make_gcl_grad_fn(model, specs, cfg,
                               GCLLossConfig(block_finest_gradient=False),
                               "finest", **loss_args)
    tx, step = make_parallel_train_step(grad_fn, cfg, mesh)

    cap = 64
    coords = np.zeros((cap, 4), np.int32)
    coords[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(coords), jnp.asarray(np.ones(cap, bool)),
                    specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g, jnp.ones((cap, 1)),
                           train=False)
    state = TrainState(variables["params"], variables["batch_stats"],
                       tx.init(variables["params"]),
                       jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
    rng = np.random.RandomState(0)
    points = np.zeros((b, n_clouds, p_cap, 3), np.float32)
    for i in range(b):
        for c in range(n_clouds):
            points[i, c] = synth_lidar(rng, p_cap)
    pmask = np.ones((b, n_clouds, p_cap), bool)
    transforms = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (b, n_clouds, 4, 4)).copy()
    radius = np.full((b,), 0.45, np.float32)
    args = host_to_global(mesh, points, pmask, transforms, radius)

    import time
    state, metrics = step(state, 0.1, *args)
    _ = float(metrics["loss"])
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    print("state leaf sharding:", leaf.sharding, flush=True)
    print("committed:", leaf.committed,
          "fully_addr:", leaf.sharding.is_fully_addressable, flush=True)
    for it in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, 0.1, *args)
        _ = float(metrics["loss"])
        print(f"step {it}: {time.perf_counter() - t0:.2f} s", flush=True)
    with jax.profiler.trace(outdir):
        state, metrics = step(state, 0.1, *args)
        _ = float(metrics["loss"])
    print("traced", flush=True)

    from gcl_tpu.utils.xplane import parse_xspace
    p = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))[-1]
    for plane in parse_xspace(p):
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.defaultdict(float)
            for ev in line.events:
                agg[ev.name.split(".")[0]] += ev.duration_ps / 1e9
            tot = sum(agg.values())
            print(f"total busy {tot:.1f} ms")
            for nm, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
                print(f"  {nm:30s} {ms:9.2f} ms")


if __name__ == "__main__":
    main()
