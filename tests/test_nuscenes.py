"""nuScenes dataset tests on a synthetic nuScenes-as-KITTI export.

Covers the nuScenes-specific behaviors the KITTI tests cannot reach
(reference lib/colocation_data_loader.py:478-699 and
lib/complement_data_loader.py:825-1221): string log directories,
poses.npy trusted directly as GT (no ICP), the train [::3][:1200]
subsample, and the LoNuScenes fixed 994-pair list.
"""
import os

import numpy as np
import pytest

from gcl_tpu.config import default_config
from gcl_tpu.data.colocation import ColocationNuscenesDataset, \
    apply_transform
from gcl_tpu.data.pairs import PairComplementNuscenesDataset
from gcl_tpu.data.synthetic import generate_synthetic_nuscenes


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    generate_synthetic_nuscenes(str(root), n_logs=1, n_frames=60, step=3.0)
    return root


def make_cfg(root, **kw):
    cfg = default_config(
        kitti_root=str(root), voxel_size=0.3, min_dist=3, max_dist=18,
        num_neighborhood=4, point_capacity=8192, voxel_capacity=4096,
        nghb_point_capacity=8192,
        pair_min_dist=3, pair_max_dist=10, complement_pair_dist=3,
        num_complement_one_side=2, use_old_pose=False,
        use_random_rotation=True, use_random_scale=True)
    cfg.update(kw)
    return cfg


def _median_nn_dist(queries, target):
    from scipy.spatial import cKDTree
    d, _ = cKDTree(target).query(queries[::10])
    return float(np.median(d))


class TestColocationNuscenes:
    def test_index_and_sample(self, nusc_root):
        cfg = make_cfg(nusc_root)
        ds = ColocationNuscenesDataset("train", config=cfg)
        assert len(ds) > 0
        drive, t, nghb = ds.files[0]
        assert isinstance(drive, str) and drive.startswith("n000-")
        s = ds[0]
        c = cfg.num_neighborhood + 1
        assert s["points"].shape == (c, cfg.point_capacity, 3)
        assert s["transforms"].shape == (c, 4, 4)
        np.testing.assert_allclose(s["transforms"][0], np.eye(4))
        assert s["pmask"].sum(axis=1).min() > 100

    def test_transforms_align_clouds(self, nusc_root):
        """poses.npy must be trusted directly: aligned neighbors land on
        the center cloud (same check as the KITTI variant)."""
        cfg = make_cfg(nusc_root)
        ds = ColocationNuscenesDataset(
            "train", config=cfg, random_rotation=True, random_scale=False)
        s = ds[0]
        center = s["points"][0][s["pmask"][0]]
        for i in range(1, 3):
            nb = s["points"][i][s["pmask"][i]]
            aligned = apply_transform(nb, s["transforms"][i])
            assert _median_nn_dist(aligned, center) < 1.0


class TestPairNuscenes:
    def test_test_phase_pair(self, nusc_root):
        cfg = make_cfg(nusc_root)
        ds = PairComplementNuscenesDataset(
            "test", config=cfg, random_rotation=False, random_scale=False)
        assert len(ds) > 0
        s = ds[0]
        assert s["points0"].shape == (cfg.point_capacity, 3)
        x0 = s["points0"][s["pmask0"]]
        x1 = s["points1"][s["pmask1"]]
        aligned = apply_transform(x0, s["trans"])
        # trusted-pose GT maps cloud0 onto cloud1
        assert _median_nn_dist(aligned, x1) < 1.0

    def test_train_phase_subsample(self, nusc_root):
        cfg = make_cfg(nusc_root)
        ds = PairComplementNuscenesDataset(
            "train", config=cfg, random_rotation=False, random_scale=False)
        # reference :929-931 keeps every 3rd pair, capped at 1200
        assert 0 < len(ds) <= 1200
        s = ds[0]
        assert s["nghb0"].shape == (cfg.nghb_point_capacity, 3)
        assert s["nghb_mask0"].any()

    def test_lonuscenes_fixed_list(self, nusc_root):
        cfg = make_cfg(nusc_root, LoNUSCENES=True)
        ds = PairComplementNuscenesDataset(
            "test", config=cfg, random_rotation=False, random_scale=False)
        assert len(ds.files) == 994
        log, t0, t1 = ds.files[0]
        assert isinstance(log, str) and log.startswith("n008-")
        assert isinstance(t0, int) and isinstance(t1, int)

    def test_lokitti_list_resolves_from_any_cwd(self, nusc_root,
                                                tmp_path, monkeypatch):
        from gcl_tpu.data.pairs import PairComplementKittiDataset
        monkeypatch.chdir(tmp_path)  # away from the repo root
        cfg = make_cfg(nusc_root, LoKITTI=True)
        ds = PairComplementKittiDataset.__new__(PairComplementKittiDataset)
        ds.config = cfg
        files = ds._fixed_pair_list("test")
        assert len(files) == 545 and files[0] == (8, 381, 422)
