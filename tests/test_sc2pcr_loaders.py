"""SC2-PCR standalone-benchmark loaders on synthetic npz fixtures
(scripts/SC2_PCR/dataset.py — reference scripts/SC2_PCR/dataset.py:8-240)
and the 3DMatch driver rerouting (test_3DMatch -> test_KITTI with the
ThreeDLoader).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_pair(rng, n=400):
    xyz0 = (rng.rand(n, 3) * [8, 8, 3]).astype(np.float32)
    th = 0.5
    r = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([1.0, -2.0, 0.3], np.float32)
    xyz1 = xyz0 @ r.T + t
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = r
    gt[:3, 3] = t
    # descriptors: identical per-point vectors -> perfect matches
    feat = rng.randn(n, 16).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    return xyz0, xyz1, feat, feat.copy(), gt


@pytest.fixture
def threed_root(tmp_path, rng):
    root = tmp_path / "3dmatch"
    scene = "7-scenes-redkitchen"
    (root / "fragments" / scene).mkdir(parents=True)
    gt_dir = root / "gt_result" / f"{scene}-evaluation"
    gt_dir.mkdir(parents=True)
    for i in range(2):
        xyz0, xyz1, f0, f1, gt = _make_pair(rng)
        np.savez(gt_dir / f"pair_{i}.npz", xyz0=xyz0, xyz1=xyz1,
                 feat0=f0, feat1=f1, gt_trans=gt)
    return root


def test_threed_loader_layout(threed_root):
    from scripts.SC2_PCR.dataset import ThreeDLoader

    loader = ThreeDLoader(str(threed_root), num_node=200)
    assert len(loader) == 2
    xyz0, xyz1, f0, f1, gt = loader[0]
    assert xyz0.shape == xyz1.shape and xyz0.shape[1] == 3
    assert f0.shape[0] == xyz0.shape[0]
    assert gt.shape == (4, 4)


def test_3dmatch_driver_end_to_end(threed_root, tmp_path,
                                   monkeypatch):
    """The 3DMatch shim reroutes into the shared driver with the
    3DMatch config; with perfect synthetic descriptors SC2-PCR must
    register the pairs (RR = 100)."""
    from scripts.SC2_PCR import test_KITTI

    here = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "SC2_PCR")
    cfg = json.load(open(os.path.join(here, "config_json",
                                      "config_3DMatch.json")))
    cfg["num_node"] = 200  # keep the test tiny
    cfg["max_points"] = 500
    cfg_path = tmp_path / "cfg.json"
    json.dump(cfg, open(cfg_path, "w"))

    monkeypatch.setattr(sys, "argv", [
        "test_3DMatch.py", "--config_path", str(cfg_path),
        "--data_root", str(threed_root)])
    stats = test_KITTI.main()
    assert stats["RR"] == 100.0
    assert stats["TE"] < 5.0  # cm
