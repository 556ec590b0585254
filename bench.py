"""Benchmark: GCL training-step throughput on real hardware.

Runs the flagship configuration (ResUNetFatBN, voxel 0.3 m, batch 4 x 7
clouds — scripts/train_gcl_kitti.sh defaults) on synthetic KITTI-scale
LiDAR clouds and measures full train-step time: voxelization, colocation
group search, kernel-map construction, U-Net forward+backward, GCL loss
and the SGD update — everything the reference splits across CPU workers
and the GPU — as one XLA program.

Baseline: the reference (MinkowskiEngine + Open3D data workers, RTX 3090)
trains GCL-KITTI at ~0.66 s/step for this batch shape (200-epoch run,
~1300 steps/epoch, ~2 days wall clock reported for the shipped config) —
about 6.4e5 voxels/s through the model. vs_baseline below is
(our voxels/s) / (6.4e5 voxels/s); > 1 means faster than the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

BASELINE_VOXELS_PER_SEC = 6.4e5


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
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import default_level_caps
    from gcl_tpu.losses.gcl import GCLLossConfig
    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.train.steps import (StepConfig, TrainState,
                                     make_gcl_train_step, make_optimizer)
    from gcl_tpu.core.kernel_maps import build_graph

    # train_gcl_kitti.sh: BATCH_SIZE=4, 6 neighbors. GCL_BENCH_BATCH
    # overrides the batch (the TPU fits larger batches than the
    # reference's consumer GPU; voxels/s is the comparable metric).
    import os
    b, n_clouds = int(os.environ.get("GCL_BENCH_BATCH", "4")), 7
    p_cap = 65536       # points per cloud fed to the voxelizer
    nv_cap = 18432      # ~KITTI voxel count at 0.3 m
    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    n_flat = b * n_clouds * nv_cap
    cfg = StepConfig(voxel_size=0.3, nv_cap=nv_cap,
                     level_caps=default_level_caps(n_flat, strides, 0.55),
                     knn_chunk=1024, pos_pair_cap=1 << 21,
                     search_cell=1.08,  # 2 * (0.45 search radius) * 1.2
                     jitter_mode=os.environ.get("GCL_JITTER_MODE",
                                                "input"),
                     compute_dtype=jnp.bfloat16)

    tx, step = make_gcl_train_step(
        model, specs, cfg, GCLLossConfig(block_finest_gradient=False),
        "finest", max_pos_cluster=256 * b, max_hn_samples=256 * b,
        pos_weight=1.0, finest_weight=1.0, neg_weight=1.0)

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
    args = (jnp.asarray(points), jnp.asarray(pmask),
            jnp.asarray(transforms), jnp.asarray(radius))

    # warmup (compile) + 1 step
    state, metrics = step(state, 0.1, *args)
    jax.block_until_ready(metrics["loss"])
    n_vox = float(metrics["num_valid_voxels"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, 0.1, *args)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    voxels_per_sec = n_vox / dt
    out = {
        "metric": "gcl_train_voxels_per_sec",
        "value": round(voxels_per_sec, 1),
        "unit": "voxel/s",
        "vs_baseline": round(voxels_per_sec / BASELINE_VOXELS_PER_SEC, 3),
        "step_time_s": round(dt, 4),
        "voxels_per_step": int(n_vox),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
