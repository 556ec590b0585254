"""ETH indoor->outdoor generalization evaluation — rebuild of the
reference generalization_ETH/evaluate.py:60-289.

Per scene (gazebo_summer/winter, wood_autmn/summer): for every fragment
pair with a gt.log entry, extract voxel features with a trained model,
look up features at the provided ETH keypoints via nearest voxel, compute
mutual-NN correspondences and the inlier ratio under the GT transform,
estimate a pose with feature RANSAC, and report the feature-match recall
(fraction of pairs with inlier-ratio > 0.05) and average inlier ratio.

The nearest-voxel lookup (pytorch3d knn_points in the reference, :110-122)
and RANSAC run on device through this framework's kernels.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

SCENE_LIST = [
    "gazebo_summer",
    "gazebo_winter",
    "wood_autmn",
    "wood_summer",
]


def get_pcd_xyz(pcdpath, filename):
    from gcl_tpu.utils.pointcloud import read_ply_xyz

    return read_ply_xyz(os.path.join(pcdpath, filename + ".ply"))


def get_eth_keypts(pcd_xyz, keyptspath, filename):
    """ETH keypoints are stored as indices into the fragment cloud."""
    key_ind = np.loadtxt(
        os.path.join(keyptspath, filename + "_Keypoints.txt"),
        dtype=np.int64)
    return pcd_xyz[key_ind]


def read_gt_log(path):
    """{'{i}_{j}': 4x4} from an ETH gt.log."""
    out = {}
    with open(path) as f:
        lines = f.readlines()
    for i in range(0, len(lines), 5):
        meta = lines[i].split()
        mat = np.array([[float(v) for v in lines[i + 1 + r].split()]
                        for r in range(4)])
        out[f"{int(meta[0])}_{int(meta[1])}"] = mat
    return out


def mutual_nn(source_desc, target_desc):
    """Mutually-closest pairs in feature space (reference :62-77)."""
    import jax.numpy as jnp

    from gcl_tpu.reg import find_nn

    s2t, _ = find_nn(jnp.asarray(source_desc), jnp.asarray(target_desc))
    t2s, _ = find_nn(jnp.asarray(target_desc), jnp.asarray(source_desc))
    s2t = np.asarray(s2t)
    t2s = np.asarray(t2s)
    i = np.arange(len(s2t))
    mutual = t2s[s2t] == i
    return np.stack([i[mutual], s2t[mutual]], 1)


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.models import load_model
    from gcl_tpu.reg import find_nn, ransac_pose
    from gcl_tpu.train import load_checkpoint, restore_into
    from gcl_tpu.utils.misc import extract_features

    parser = argparse.ArgumentParser()
    parser.add_argument("--eth_root", required=True,
                        help="dir with <scene>/{*.ply, Keypoints, gt.log}")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model", default="ResUNetFatBN")
    parser.add_argument("--model_n_out", default=32, type=int)
    parser.add_argument("--conv1_kernel_size", default=5, type=int)
    parser.add_argument("--voxel_size", default=0.05, type=float)
    parser.add_argument("--inlier_dist", default=0.1, type=float)
    parser.add_argument("--ransac_dist", default=0.05, type=float)
    parser.add_argument("--rr_te", default=0.3, type=float,
                        help="registration-recall translation threshold "
                             "(m)")
    parser.add_argument("--rr_re", default=15.0, type=float,
                        help="registration-recall rotation threshold "
                             "(deg)")
    parser.add_argument("--log_dir", default="",
                        help="write per-scene est .log files here "
                             "(reference writes them for offline RR "
                             "evaluation, :189-200)")
    args = parser.parse_args()

    model_cls = load_model(args.model)
    model = model_cls(1, args.model_n_out, bn_momentum=0.05,
                      normalize_feature=True,
                      conv1_kernel_size=args.conv1_kernel_size, D=3)
    # init + restore
    from gcl_tpu.core.kernel_maps import build_graph
    specs = model_cls.conv_specs(args.conv1_kernel_size)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    cap = 64
    tc = np.zeros((cap, 4), np.int32)
    tc[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(tc), jnp.asarray(np.ones(cap, bool)),
                    specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g, jnp.ones((cap, 1)),
                           train=False)
    state = load_checkpoint(args.checkpoint)
    params = restore_into(variables["params"],
                          state["state_dict"]["params"])
    batch_stats = restore_into(variables["batch_stats"],
                               state["state_dict"]["batch_stats"])

    key = jax.random.PRNGKey(0)
    inliers_list, recall_list, rr_list = [], [], []
    for scene in SCENE_LIST:
        pcdpath = os.path.join(args.eth_root, scene)
        keyptspath = os.path.join(pcdpath, "Keypoints")
        gt_log = read_gt_log(os.path.join(pcdpath, "gt.log"))
        num_frag = len([f for f in os.listdir(pcdpath)
                        if f.endswith(".ply")])
        est_log = (os.path.join(args.log_dir, f"est_{scene}.log")
                   if args.log_dir else None)
        if est_log:
            os.makedirs(args.log_dir, exist_ok=True)
            open(est_log, "w").close()

        ratios, rr_hits = [], []
        for id1 in range(num_frag):
            for id2 in range(id1 + 1, num_frag):
                k = f"{id1}_{id2}"
                if k not in gt_log:
                    continue
                x0 = get_pcd_xyz(pcdpath, f"Hokuyo_{id1}")
                x1 = get_pcd_xyz(pcdpath, f"Hokuyo_{id2}")
                kp0 = get_eth_keypts(x0, keyptspath, f"Hokuyo_{id1}")
                kp1 = get_eth_keypts(x1, keyptspath, f"Hokuyo_{id2}")

                v0, f0 = extract_features(model, params, batch_stats, x0,
                                          voxel_size=args.voxel_size)
                v1, f1 = extract_features(model, params, batch_stats, x1,
                                          voxel_size=args.voxel_size)
                # nearest-voxel feature at keypoints (reference :110-122)
                nn0, _ = find_nn(jnp.asarray(kp0), jnp.asarray(v0))
                nn1, _ = find_nn(jnp.asarray(kp1), jnp.asarray(v1))
                d0 = f0[np.asarray(nn0)]
                d1 = f1[np.asarray(nn1)]

                corr = mutual_nn(d0, d1)
                gt = gt_log[k]  # maps fragment id2 into id1's frame
                frag1 = kp0[corr[:, 0]]
                frag2 = kp1[corr[:, 1]] @ gt[:3, :3].T + gt[:3, 3]
                dist = np.sqrt(((frag1 - frag2) ** 2).sum(1))
                inlier_ratio = float((dist < args.inlier_dist).mean())
                ratios.append(inlier_ratio)

                # RANSAC pose on the mutual-NN keypoint correspondences
                # (device hypothesis RANSAC; the reference runs o3d
                # feature RANSAC over the full keypoint sets, :173-188)
                # — estimated in the SAME direction as gt (id2 -> id1).
                key, sub = jax.random.split(key)
                t_est, _, _ = ransac_pose(
                    jnp.asarray(kp1[corr[:, 1]]),
                    jnp.asarray(kp0[corr[:, 0]]), sub,
                    args.ransac_dist, num_hypotheses=16384, sample_size=3)
                t_est = np.asarray(t_est)
                rte = float(np.linalg.norm(t_est[:3, 3] - gt[:3, 3]))
                cosv = (np.trace(t_est[:3, :3].T @ gt[:3, :3]) - 1) / 2
                rre = float(np.degrees(np.arccos(np.clip(cosv, -1, 1))))
                rr_hit = rte < args.rr_te and rre < args.rr_re
                rr_hits.append(rr_hit)
                if est_log:
                    # reference's .log layout: header + 4x4 rows
                    # (evaluate.py:189-200, already inverted to id2->id1)
                    with open(est_log, "a") as f:
                        f.write(f"{id1}\t {id2}\t  {num_frag}\n")
                        for r in range(4):
                            f.write("\t ".join(str(t_est[r, cc])
                                               for cc in range(4))
                                    + "\t \n")
                print(f"{scene} {id1}-{id2}: inlier ratio "
                      f"{inlier_ratio:.4f}, RTE {rte:.3f} m, "
                      f"RRE {rre:.2f} deg, registered={rr_hit}")
        ratios = np.asarray(ratios)
        recall = float((ratios > 0.05).mean() * 100) if len(ratios) else 0
        avg_inlier = float(ratios[ratios > 0.05].mean()) \
            if (ratios > 0.05).any() else 0.0
        rr = float(np.mean(rr_hits) * 100) if rr_hits else 0.0
        print(f"Scene {scene}: feature-match recall {recall:.2f}%, "
              f"avg inlier ratio {avg_inlier:.4f}, "
              f"registration recall {rr:.2f}% "
              f"(TE<{args.rr_te} m, RE<{args.rr_re} deg)")
        recall_list.append(recall)
        inliers_list.append(avg_inlier)
        rr_list.append(rr)
    print(f"All scene feature-match recall: {np.mean(recall_list)}")
    print(f"All scene inliers: {np.mean(inliers_list)}")
    print(f"All scene registration recall: {np.mean(rr_list)}")


if __name__ == "__main__":
    main()
