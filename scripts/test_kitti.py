"""KITTI / LoKITTI / nuScenes benchmark runner — mirror of the reference
scripts/test_kitti.py:76-288: load a run's config.json + best checkpoint,
extract features per pair, subsample 5000 points, register with RANSAC or
SC2-PCR, report RR / RRE / RTE at (TE < rte_thresh, RE < rre_thresh).
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

ch = logging.StreamHandler(sys.stdout)
logging.getLogger().setLevel(logging.INFO)
logging.basicConfig(format="%(asctime)s %(message)s",
                    datefmt="%m/%d %H:%M:%S", handlers=[ch])


def random_sample(pcd, feats, n, rng):
    """Exact-N sampling (reference scripts/test_kitti.py:55-74)."""
    n1 = pcd.shape[0]
    if n1 == n:
        return pcd, feats
    if n1 > n:
        choice = rng.permutation(n1)[:n]
    else:
        choice = rng.choice(n1, n)
    return pcd[choice], feats[choice]


def main(config):
    import jax
    import jax.numpy as jnp

    from gcl_tpu.config import Config
    from gcl_tpu.data import make_data_loader
    from gcl_tpu.models import load_model
    from gcl_tpu.reg import Matcher, find_nn, ransac_pose
    from gcl_tpu.train import load_checkpoint, make_feature_extractor, \
        restore_into
    from gcl_tpu.train.steps import StepConfig
    from gcl_tpu.core.kernel_maps import default_level_caps
    from gcl_tpu.utils.timer import AverageMeter, Timer

    from gcl_tpu.core.pallas_conv import configure_from
    configure_from(config)  # kernel tuning from the run's config.json

    test_loader = make_data_loader(config, config.test_phase, 1,
                                   num_threads=config.test_num_thread,
                                   shuffle=False)

    model_cls = load_model(config.model)
    model = model_cls(1, config.model_n_out,
                      bn_momentum=config.bn_momentum,
                      conv1_kernel_size=config.conv1_kernel_size,
                      normalize_feature=config.normalize_feature, D=3)
    specs = model_cls.conv_specs(config.conv1_kernel_size)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    step_cfg = StepConfig(
        voxel_size=config.voxel_size, nv_cap=config.voxel_capacity,
        level_caps=default_level_caps(config.voxel_capacity, strides,
                                      config.level_cap_shrink),
        knn_chunk=config.knn_chunk)
    extract = make_feature_extractor(model, specs, step_cfg)

    state = load_checkpoint(config.save_dir + "/best_val_checkpoint.pth")
    # template init
    from gcl_tpu.core.kernel_maps import build_graph
    cap = 64
    tcoords = np.zeros((cap, 4), np.int32)
    tcoords[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(tcoords),
                    jnp.asarray(np.ones(cap, bool)), specs,
                    {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g,
                           jnp.ones((cap, 1)), train=False)
    params = restore_into(variables["params"],
                          state["state_dict"]["params"])
    batch_stats = restore_into(variables["batch_stats"],
                               state["state_dict"]["batch_stats"])

    use_sc2pcr = not config.use_RANSAC
    if use_sc2pcr:
        matcher = Matcher(
            inlier_threshold=config.inlier_threshold,
            num_node=config.num_node, use_mutual=config.use_mutual,
            d_thre=config.d_thre, num_iterations=config.num_iterations,
            ratio=config.ratio, nms_radius=config.nms_radius,
            max_points=config.max_points, k1=config.k1, k2=config.k2)

    success_meter, rte_meter, rre_meter = (AverageMeter(), AverageMeter(),
                                           AverageMeter())
    data_timer, feat_timer, reg_timer = Timer(), Timer(), Timer()
    rte_thresh, rre_thresh = config.rte_thresh, config.rre_thresh
    print(f"rre thresh: {rre_thresh}; rte_thresh: {rte_thresh}")

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    n_points = 5000
    n_total = len(test_loader)
    for i, batch in enumerate(test_loader):
        data_timer.tic()
        t_gth = np.asarray(batch["trans"][0])
        data_timer.toc()

        feat_timer.tic()
        vox0, f0 = extract(params, batch_stats,
                           jnp.asarray(batch["points0"]),
                           jnp.asarray(batch["pmask0"]))
        vox1, f1 = extract(params, batch_stats,
                           jnp.asarray(batch["points1"]),
                           jnp.asarray(batch["pmask1"]))
        m0 = np.asarray(vox0.mask[0])
        m1 = np.asarray(vox1.mask[0])
        xyz0 = np.asarray(vox0.xyz[0])[m0]
        xyz1 = np.asarray(vox1.xyz[0])[m1]
        F0 = np.asarray(f0[0])[m0]
        F1 = np.asarray(f1[0])[m1]
        feat_timer.toc()

        xyz0s, F0s = random_sample(xyz0, F0, n_points, rng)
        xyz1s, F1s = random_sample(xyz1, F1, n_points, rng)

        reg_timer.tic()
        if not use_sc2pcr:
            # feature-matching RANSAC: NN correspondences + parallel
            # hypothesis RANSAC (o3d checker semantics)
            nn, _ = find_nn(jnp.asarray(F0s), jnp.asarray(F1s),
                            chunk=config.knn_chunk)
            key, sub = jax.random.split(key)
            distance_threshold = config.voxel_size * 1.0
            t_est, _, _ = ransac_pose(
                jnp.asarray(xyz0s), jnp.asarray(xyz1s)[nn], sub,
                distance_threshold,
                num_hypotheses=config.ransac_hypotheses, sample_size=4,
                edge_length_ratio=0.9)
            t_est = np.asarray(t_est)
        else:
            key, sub = jax.random.split(key)
            t_est, _, _, _ = matcher.estimator(
                jnp.asarray(xyz0s)[None], jnp.asarray(xyz1s)[None],
                jnp.asarray(F0s)[None], jnp.asarray(F1s)[None], sub)
            t_est = np.asarray(t_est)[0]
        reg_timer.toc()

        rte = np.linalg.norm(t_est[:3, 3] - t_gth[:3, 3])
        tm = t_est[:3, :3].T @ t_gth[:3, :3]
        rre = np.arccos(np.clip((np.trace(tm) - 1) / 2, -1, 1))

        if rte < rte_thresh:
            rte_meter.update(rte)
        if not np.isnan(rre) and rre < np.pi / 180 * rre_thresh:
            rre_meter.update(rre * 180 / np.pi)
        if (rte < rte_thresh and not np.isnan(rre)
                and rre < np.pi / 180 * rre_thresh):
            success_meter.update(1)
        else:
            success_meter.update(0)
            logging.info(
                f"Failed with RTE: {rte}, RRE: {rre * 180 / np.pi}")

        if i % 10 == 0:
            logging.info(
                f"{i} / {n_total}: Data time: {data_timer.avg}, "
                f"Feat time: {feat_timer.avg}, "
                f"Reg time: {reg_timer.avg}, RTE: {rte_meter.avg},"
                f" RRE: {rre_meter.avg}, Success: {success_meter.sum} "
                f"/ {success_meter.count} ({success_meter.avg * 100} %)")

    logging.info(
        f"RTE: {rte_meter.avg}, var: {rte_meter.var},"
        f" RRE: {rre_meter.avg}, var: {rre_meter.var},"
        f" Success: {success_meter.sum} / {success_meter.count}"
        f" ({success_meter.avg * 100} %)")
    return {"rr": success_meter.avg * 100, "rte": rte_meter.avg,
            "rre": rre_meter.avg}


def str2bool(v):
    return v.lower() in ("true", "1")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_dir", default=None, type=str)
    parser.add_argument("--test_phase", default="test", type=str)
    parser.add_argument("--LoKITTI", default=False, type=str2bool)
    parser.add_argument("--LoNUSCENES", default=False, type=str2bool)
    parser.add_argument("--test_num_thread", default=5, type=int)
    parser.add_argument("--pair_min_dist", default=None, type=int)
    parser.add_argument("--pair_max_dist", default=None, type=int)
    parser.add_argument("--downsample_single", default=1.0, type=float)
    parser.add_argument("--kitti_root", type=str, default="/data/kitti/")
    parser.add_argument("--use_RANSAC", type=str2bool, default=True)
    parser.add_argument("--ransac_hypotheses", type=int, default=131072)
    parser.add_argument("--rre_thresh", default=5.0, type=float)
    parser.add_argument("--rte_thresh", default=2.0, type=float)
    args = parser.parse_args()

    from gcl_tpu.config import Config, default_config

    config = default_config()
    run_cfg = json.load(open(args.save_dir + "/config.json", "r"))
    config.update(run_cfg)
    config.save_dir = args.save_dir
    config.test_phase = args.test_phase
    config.kitti_root = args.kitti_root
    config.test_num_thread = args.test_num_thread
    config.LoKITTI = args.LoKITTI
    config.LoNUSCENES = args.LoNUSCENES
    config.phase = "test"
    config.use_RANSAC = args.use_RANSAC
    config.ransac_hypotheses = args.ransac_hypotheses

    if args.LoNUSCENES:
        config.dataset = "PairComplementNuscenesDataset"
        config.use_old_pose = True
    if args.LoKITTI:
        config.dataset = "PairComplementKittiDataset"

    if not config.use_RANSAC:
        here = os.path.dirname(os.path.abspath(__file__))
        sc2 = json.load(open(os.path.join(
            here, "SC2_PCR/config_json/config_KITTI.json"), "r"))
        config.update(sc2)

    if args.pair_min_dist is not None and args.pair_max_dist is not None:
        config.pair_min_dist = args.pair_min_dist
        config.pair_max_dist = args.pair_max_dist
    config.downsample_single = args.downsample_single
    config.rte_thresh = args.rte_thresh
    config.rre_thresh = args.rre_thresh

    main(config)
