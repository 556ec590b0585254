"""Smoke test for the demo entry point (reference demo.py:25-49):
synthetic scan -> voxelize -> ResUNetBN2C -> t-SNE-colored .ply."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_demo_writes_colored_ply(tmp_path):
    import demo

    out = str(tmp_path / "feat.ply")
    cfg = argparse.Namespace(input=None, output=out, weights=None,
                             model="ResUNetBN2C", model_n_out=16,
                             voxel_size=0.3, conv1_kernel_size=3)
    demo.main(cfg)
    assert os.path.isfile(out)
    from gcl_tpu.utils.pointcloud import read_ply_xyz
    xyz = read_ply_xyz(out)
    assert len(xyz) > 200 and np.isfinite(xyz).all()
