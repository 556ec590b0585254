"""nuScenes -> KITTI-layout converter (reference
assets/export_kitti_minimal.py:48-166): exports each log's LIDAR_TOP
sweeps as `sequences/<log>/velodyne/%06d.bin` (points rotated into the
KITTI lidar frame) plus `poses.npy` with the lidar->world transforms.

Requires the nuscenes-devkit (not bundled in this image); the conversion
is a one-time offline preprocessing step run wherever the raw nuScenes
blobs live. The quaternion math is done with plain numpy so only the
devkit itself is an external dependency.
"""
import argparse
import os
from typing import List

import numpy as np


def quat_to_rot(w, x, y, z):
    """Rotation matrix from a unit quaternion."""
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def transform_matrix(translation, rotation_wxyz):
    t = np.eye(4)
    t[:3, :3] = quat_to_rot(*rotation_wxyz)
    t[:3, 3] = translation
    return t


# KITTI lidar x-forward vs nuScenes lidar y-forward: rotate pi/2 about z.
KITTI_TO_NU_LIDAR = transform_matrix(
    [0, 0, 0], (np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)))


class KittiConverter:
    def __init__(self, nusc_dir="/data/nuscenes",
                 nusc_kitti_dir="/data/nuscenes/nusc_kitti",
                 lidar_name="LIDAR_TOP", nusc_version="v1.0-trainval",
                 split="val"):
        from nuscenes.nuscenes import NuScenes

        self.nusc_kitti_dir = os.path.expanduser(nusc_kitti_dir)
        self.lidar_name = lidar_name
        self.nusc_version = nusc_version
        self.split = split
        os.makedirs(self.nusc_kitti_dir, exist_ok=True)
        self.nusc = NuScenes(version=nusc_version, dataroot=nusc_dir,
                             verbose=True)

    def _split_to_samples(self, split_logs: List[str]) -> List[str]:
        samples = []
        for sample in self.nusc.sample:
            scene = self.nusc.get("scene", sample["scene_token"])
            log = self.nusc.get("log", scene["log_token"])
            if log["logfile"] in split_logs:
                samples.append(sample["token"])
        return samples

    def nuscenes_construct_kitti_PCR_data(self) -> None:
        from nuscenes.utils.splits import create_splits_logs

        split_logs = create_splits_logs(self.split, self.nusc)
        base_folder = os.path.join(self.nusc_kitti_dir, self.split,
                                   "sequences")
        os.makedirs(base_folder, exist_ok=True)
        kitti_to_nu_inv = np.linalg.inv(KITTI_TO_NU_LIDAR)

        for log in split_logs:
            sample_tokens = self._split_to_samples([log])
            log_folder = os.path.join(base_folder, log, "velodyne")
            os.makedirs(log_folder, exist_ok=True)
            trans = []
            for token_idx, sample_token in enumerate(sample_tokens):
                print(f"Processing {log}, {token_idx}")
                sample = self.nusc.get("sample", sample_token)
                lidar_token = sample["data"][self.lidar_name]
                sd = self.nusc.get("sample_data", lidar_token)
                cs = self.nusc.get("calibrated_sensor",
                                   sd["calibrated_sensor_token"])
                pos = self.nusc.get("ego_pose", sd["ego_pose_token"])
                ego_to_world = transform_matrix(pos["translation"],
                                                pos["rotation"])
                lid_to_ego = transform_matrix(cs["translation"],
                                              cs["rotation"])
                lid_to_world = ego_to_world @ lid_to_ego
                trans.append(lid_to_world @ KITTI_TO_NU_LIDAR)

                # single-sweep lidar blob: float32 [5, N] (x y z i ring)
                src = os.path.join(self.nusc.dataroot, sd["filename"])
                pts = np.fromfile(src, dtype=np.float32).reshape(-1, 5)
                xyz = pts[:, :3] @ kitti_to_nu_inv[:3, :3].T
                out = np.concatenate([xyz, pts[:, 3:4]], 1).astype(
                    np.float32)
                out.tofile(os.path.join(log_folder,
                                        "%06d.bin" % token_idx))
            np.save(os.path.join(base_folder, log, "poses"),
                    np.asarray(trans))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--nusc_dir", default="/data/nuscenes")
    parser.add_argument("--nusc_kitti_dir",
                        default="/data/nuscenes/nusc_kitti")
    parser.add_argument("--version", default="v1.0-trainval")
    args = parser.parse_args()
    for convert_split in ["train", "val", "test"]:
        converter = KittiConverter(nusc_dir=args.nusc_dir,
                                   nusc_kitti_dir=args.nusc_kitti_dir,
                                   nusc_version=args.version,
                                   split=convert_split)
        converter.nuscenes_construct_kitti_PCR_data()
