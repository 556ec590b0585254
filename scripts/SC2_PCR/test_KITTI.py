"""Standalone SC2-PCR KITTI benchmark over precomputed descriptors
(reference scripts/SC2_PCR/test_KITTI.py:18-151): run the Matcher on each
pair, report RR/RE/TE (TransformationLoss) and inlier P/R/F1
(ClassificationLoss).
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(message)s",
                    datefmt="%m/%d %H:%M:%S")


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.reg import (ClassificationLoss, Matcher,
                             TransformationLoss, transform)
    from scripts.SC2_PCR.dataset import KITTILoader, ThreeDLoader

    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default=os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            "config_json/config_KITTI.json"))
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--descriptor", type=str, default="fcgf")
    # benchmark_utils parity (reference
    # scripts/SC2_PCR/benchmark_utils.py:27-57): set_seed(51) fixed all
    # RNGs before a run; icp_refine() optionally polished the estimate
    # with a 0.10 m point-to-point ICP before scoring.
    parser.add_argument("--seed", type=int, default=51,
                        help="deterministic run seed (ref set_seed)")
    parser.add_argument("--use_icp", action="store_true",
                        help="refine each estimate with 0.10 m "
                        "point-to-point ICP (ref icp_refine)")
    args = parser.parse_args()
    cfg = json.load(open(args.config_path))
    np.random.seed(args.seed)

    if cfg.get("dataset", "KITTI") in ("3DMatch", "3DLoMatch"):
        # the 3DMatch/3DLoMatch shims reroute here with their configs
        loader = ThreeDLoader(args.data_root,
                              descriptor=args.descriptor,
                              inlier_threshold=cfg["inlier_threshold"],
                              num_node=cfg["num_node"],
                              downsample=cfg["downsample"])
    else:
        loader = KITTILoader(args.data_root, descriptor=args.descriptor,
                             inlier_threshold=cfg["inlier_threshold"],
                             num_node=cfg["num_node"])
    matcher = Matcher(inlier_threshold=cfg["inlier_threshold"],
                      num_node=cfg["num_node"],
                      use_mutual=cfg["use_mutual"], d_thre=cfg["d_thre"],
                      num_iterations=cfg["num_iterations"],
                      ratio=cfg["ratio"], nms_radius=cfg["nms_radius"],
                      max_points=cfg["max_points"], k1=cfg["k1"],
                      k2=cfg["k2"])
    trans_loss = TransformationLoss(re_thre=cfg["re_thre"],
                                    te_thre=cfg["te_thre"])
    class_loss = ClassificationLoss()

    key = jax.random.PRNGKey(args.seed)
    recalls, res, tes, f1s = [], [], [], []
    for i in range(len(loader)):
        xyz0, xyz1, f0, f1, gt = loader[i]
        key, sub = jax.random.split(key)
        pred, labels, src_c, tgt_c = matcher.estimator(
            jnp.asarray(xyz0)[None], jnp.asarray(xyz1)[None],
            jnp.asarray(f0)[None], jnp.asarray(f1)[None], sub)
        pred = np.asarray(pred)
        if args.use_icp:
            from gcl_tpu.reg import registration_icp
            refined = registration_icp(
                np.asarray(src_c, np.float64)[0],
                np.asarray(tgt_c, np.float64)[0], 0.10,
                init=np.asarray(pred[0], np.float64))
            pred = refined[None].astype(np.float32)
        recall, re, te = trans_loss(pred, gt[None], src_c, tgt_c, labels)
        # gt inlier labels from the GT transform
        warp = np.asarray(transform(src_c, jnp.asarray(gt)[None]))[0]
        gt_labels = (np.linalg.norm(warp - np.asarray(tgt_c)[0], axis=1)
                     < cfg["inlier_threshold"])
        cls = class_loss(np.asarray(labels)[0], gt_labels)
        recalls.append(recall)
        if recall > 0:
            res.append(re)
            tes.append(te)
        f1s.append(cls["f1"])
        if i % 10 == 0:
            logging.info(
                f"{i}/{len(loader)} RR={np.mean(recalls):.2f} "
                f"RE={np.mean(res) if res else 0:.3f} "
                f"TE={np.mean(tes) if tes else 0:.3f} "
                f"F1={np.mean(f1s):.3f}")
    stats = {"RR": float(np.mean(recalls)),
             "RE": float(np.mean(res)) if res else 0.0,
             "TE": float(np.mean(tes)) if tes else 0.0,
             "F1": float(np.mean(f1s))}
    logging.info(
        f"FINAL RR={stats['RR']:.2f} RE={stats['RE']:.3f}deg "
        f"TE={stats['TE']:.3f}cm F1={stats['F1']:.3f}")
    return stats


if __name__ == "__main__":
    main()
