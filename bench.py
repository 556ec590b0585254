"""Benchmark: GCL training-step throughput on real hardware.

Runs the flagship configuration (ResUNetFatBN, voxel 0.3 m, batch 4 x 7
clouds — scripts/train_gcl_kitti.sh defaults) on synthetic KITTI-scale
LiDAR clouds and measures full train-step time: voxelization, colocation
group search, kernel-map construction, U-Net forward+backward, GCL loss
and the SGD update — everything the reference splits across CPU workers
and the GPU — as one XLA program.

Baseline: the reference (MinkowskiEngine + Open3D data workers, RTX 3090)
trains GCL-KITTI at ~0.81 s/step for this batch shape (200-epoch run,
~1300 steps/epoch, ~2 days wall clock reported for the shipped config;
see BASELINE.md). At 516,096 padded voxels per step that is
~6.4e5 voxels/s through the model. vs_baseline below is
(our voxels/s) / (6.4e5 voxels/s); > 1 means faster than the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Flags: --batch_size N (default 4 — the reference shape; the TPU fits
larger batches, voxels/s is the comparable metric), --data_parallel
(run the shard_map data-parallel step over all visible devices — on a
single chip this proves the sharded step costs nothing over the plain
one), --jitter_mode {input,c1z}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

# Single source: BASELINE.md — the reference trains this shape at
# ~0.81 s/step on an RTX 3090 = 516,096 padded voxels / 0.81 s.
BASELINE_VOXELS_PER_SEC = 6.4e5


def _enable_compile_cache():
    """Persistent XLA compile cache: the bench-scale step takes 5-10 min
    to compile fresh on the tunneled TPU; an identical program reloads
    from .jax_cache/ in seconds across processes (including the profile
    scripts, which import this module)."""
    try:
        import jax
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10.0)
    except Exception:
        pass


_enable_compile_cache()


def synth_lidar(rng, n_points):
    """LiDAR-like scan: ground disc + vertical structures, ~120 m spread."""
    n_ground = int(n_points * 0.6)
    r = np.sqrt(rng.rand(n_ground)) * 55.0
    th = rng.rand(n_ground) * 2 * np.pi
    ground = np.stack([r * np.cos(th), r * np.sin(th),
                       rng.randn(n_ground) * 0.05], 1)
    n_obj = n_points - n_ground
    centers = rng.randn(64, 3) * [18, 18, 0]
    pick = rng.randint(0, 64, n_obj)
    obj = centers[pick] + rng.randn(n_obj, 3) * [0.6, 0.6, 1.2] \
        + [0, 0, 1.5]
    return np.concatenate([ground, obj]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int,
                    default=int(os.environ.get("GCL_BENCH_BATCH", "4")))
    ap.add_argument("--data_parallel", action="store_true")
    ap.add_argument("--jitter_mode", type=str,
                    default=os.environ.get("GCL_JITTER_MODE", "input"),
                    choices=["input", "c1z"])
    flags = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import default_level_caps
    from gcl_tpu.losses.gcl import GCLLossConfig
    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.train.steps import (StepConfig, TrainState,
                                     make_gcl_grad_fn, make_gcl_train_step,
                                     make_optimizer)
    from gcl_tpu.core.kernel_maps import build_graph

    # train_gcl_kitti.sh: BATCH_SIZE=4, 6 neighbors.
    b, n_clouds = flags.batch_size, 7
    n_dev = len(jax.devices()) if flags.data_parallel else 1
    assert b % n_dev == 0, f"batch {b} not divisible by {n_dev} devices"
    p_cap = 65536       # points per cloud fed to the voxelizer
    nv_cap = 18432      # ~KITTI voxel count at 0.3 m
    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    b_shard = b // n_dev  # static capacities are PER SHARD
    n_flat = b_shard * n_clouds * nv_cap
    cfg = StepConfig(voxel_size=0.3, nv_cap=nv_cap,
                     level_caps=default_level_caps(n_flat, strides, 0.55),
                     knn_chunk=1024, pos_pair_cap=1 << 21,
                     search_cell=1.08,  # 2 * (0.45 search radius) * 1.2
                     jitter_mode=flags.jitter_mode,
                     compute_dtype=jnp.bfloat16)

    loss_args = dict(max_pos_cluster=256 * b_shard,
                     max_hn_samples=256 * b_shard,
                     pos_weight=1.0, finest_weight=1.0, neg_weight=1.0)
    mesh = None
    if flags.data_parallel:
        from gcl_tpu.parallel import make_mesh
        from gcl_tpu.parallel.mesh import (host_to_global,
                                           make_parallel_train_step)
        mesh = make_mesh(n_dev)
        grad_fn = make_gcl_grad_fn(
            model, specs, cfg, GCLLossConfig(block_finest_gradient=False),
            "finest", **loss_args)
        tx, step = make_parallel_train_step(grad_fn, cfg, mesh)
    else:
        tx, step = make_gcl_train_step(
            model, specs, cfg, GCLLossConfig(block_finest_gradient=False),
            "finest", **loss_args)

    # init
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
    if mesh is not None:
        # Replicate the state onto the mesh BEFORE the first step: the
        # step returns NamedSharding-committed state, so an unsharded
        # initial state would make the first timed call recompile the
        # whole program for the new input shardings (~2 min — measured
        # 13.3 s/step averaged into a 10-iter window on v5e).
        from jax.sharding import NamedSharding, PartitionSpec
        state = jax.device_put(state, NamedSharding(mesh,
                                                    PartitionSpec()))

    rng = np.random.RandomState(0)
    points = np.zeros((b, n_clouds, p_cap, 3), np.float32)
    for i in range(b):
        for c in range(n_clouds):
            points[i, c] = synth_lidar(rng, p_cap)
    pmask = np.ones((b, n_clouds, p_cap), bool)
    # neighbors displaced along a synthetic trajectory
    transforms = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (b, n_clouds, 4, 4)).copy()
    for i in range(b):
        for c in range(1, n_clouds):
            transforms[i, c, :3, 3] = [((c + 1) // 2) * 8.0
                                       * (1 if c % 2 else -1), 0, 0]
    radius = np.full((b,), 0.45, np.float32)
    if mesh is not None:
        args = host_to_global(mesh, points, pmask, transforms, radius)
    else:
        args = (jnp.asarray(points), jnp.asarray(pmask),
                jnp.asarray(transforms), jnp.asarray(radius))

    # warmup (compile) + 1 step
    state, metrics = step(state, 0.1, *args)
    jax.block_until_ready(metrics["loss"])
    # parallel metrics are pmean'd per shard; scale back to the full batch
    n_vox = float(metrics["num_valid_voxels"]) * n_dev

    # 3 repeats of 10 timed iters: median is the headline (steady-state
    # representative), min/max bound the run-to-run variance so BENCH
    # deltas across rounds are interpretable (+-1-2 % is noise).
    iters, reps = 10, 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, 0.1, *args)
        jax.block_until_ready(metrics["loss"])
        times.append((time.perf_counter() - t0) / iters)
    dt = sorted(times)[len(times) // 2]

    voxels_per_sec = n_vox / dt
    out = {
        "metric": "gcl_train_voxels_per_sec",
        "value": round(voxels_per_sec, 1),
        "unit": "voxel/s",
        "vs_baseline": round(voxels_per_sec / BASELINE_VOXELS_PER_SEC, 3),
        "step_time_s": round(dt, 4),
        "step_time_min_s": round(min(times), 4),
        "step_time_max_s": round(max(times), 4),
        "voxels_per_step": int(n_vox),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
