"""Inference benchmark: GCL features + SC2-PCR registration throughput.

Measures the reference's headline inference pipeline (README.md:193 —
"about 7 FPS on an RTX 3090, GCL features + SC2-PCR") end-to-end on the
TPU as ONE jitted program per pair:

  voxelize both clouds -> kernel maps -> ResUNet features ->
  random 5000-keypoint subsample per cloud (scripts/test_kitti.py:157
  semantics) -> SC2-PCR feature matching + pose estimation.

The reference splits this across Open3D CPU preprocessing, a
MinkowskiEngine forward and a torch SC2-PCR pass with host round-trips
(/root/reference/scripts/SC2_PCR/common.py:36); here the whole pair is a
single XLA program with static shapes.

Prints ONE JSON line {"metric": "infer_fps", ...}; vs_baseline is
FPS / 7.0. Env knobs: GCL_INFER_POINTS (default 65536), GCL_INFER_NV
(default 18432), GCL_INFER_KEYPTS (default 5000), GCL_INFER_ITERS.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import synth_lidar  # noqa: E402

BASELINE_FPS = 7.0  # reference README.md:193 (RTX 3090)


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import default_level_caps
    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.reg.sc2pcr import Matcher
    from gcl_tpu.train.steps import StepConfig, make_feature_extractor

    p_cap = int(os.environ.get("GCL_INFER_POINTS", "65536"))
    nv_cap = int(os.environ.get("GCL_INFER_NV", "18432"))
    n_key = int(os.environ.get("GCL_INFER_KEYPTS", "5000"))
    iters = int(os.environ.get("GCL_INFER_ITERS", "10"))

    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    step_cfg = StepConfig(voxel_size=0.3, nv_cap=nv_cap,
                          level_caps=default_level_caps(nv_cap, strides,
                                                        0.7))
    extract = make_feature_extractor(model, specs, step_cfg)

    # SC2-PCR at the shipped KITTI settings
    # (scripts/SC2_PCR/config_json/config_KITTI.json), on the
    # 5000-keypoint subsample of scripts/test_kitti.py:157.
    matcher = Matcher(inlier_threshold=0.6, num_node="all",
                      use_mutual=False, d_thre=0.1, num_iterations=20,
                      ratio=0.2, nms_radius=0.6, max_points=n_key,
                      k1=30, k2=20)

    def subsample(vox_xyz, vox_mask, feats, key):
        # random n_key of the valid voxels (test_kitti random_sample)
        score = jnp.where(vox_mask, jax.random.uniform(key,
                                                       vox_mask.shape),
                          -1.0)
        _, sel = jax.lax.top_k(score, n_key)
        return vox_xyz[sel], feats[sel]

    @jax.jit
    def register_pair(params, batch_stats, points, pmask, key):
        vox, f = extract(params, batch_stats, points, pmask)
        k0, k1, k2 = jax.random.split(key, 3)
        x0, f0 = subsample(vox.xyz[0], vox.mask[0], f[0], k0)
        x1, f1 = subsample(vox.xyz[1], vox.mask[1], f[1], k1)
        t_est, _, _, _ = matcher.estimator(x0[None], x1[None],
                                           f0[None], f1[None], k2)
        return t_est[0]

    rng = np.random.RandomState(0)
    pts = np.stack([synth_lidar(rng, p_cap) for _ in range(2)])
    pmask = np.ones((2, p_cap), bool)

    # template init (tiny graph; params shapes are geometry-independent)
    from gcl_tpu.core.kernel_maps import build_graph
    cap = 64
    tcoords = np.zeros((cap, 4), np.int32)
    tcoords[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(tcoords), jnp.asarray(np.ones(cap, bool)),
                    specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g,
                           jnp.ones((cap, 1)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    points_d = jnp.asarray(pts)
    pmask_d = jnp.asarray(pmask)
    key = jax.random.PRNGKey(0)

    # warmup / compile
    t = register_pair(params, batch_stats, points_d, pmask_d, key)
    float(jnp.sum(t))  # force sync (block_until_ready unreliable on axon)

    # per-pair host sync: the stricter latency-inclusive convention —
    # and measured FASTER than end-only sync on the axon tunnel (9.19
    # vs 8.52 pairs/s; unsynced dispatch chains serialize worse there)
    t0 = time.perf_counter()
    s = 0.0
    for i in range(iters):
        t = register_pair(params, batch_stats, points_d, pmask_d,
                          jax.random.fold_in(key, i))
        s += float(jnp.sum(t))
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "gcl_sc2pcr_inference",
        "value": round(fps, 3),
        "unit": "pairs/s",
        "pair_time_s": round(dt, 4),
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
