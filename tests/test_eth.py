"""End-to-end test of the ETH generalization evaluation CLI
(generalization_ETH/evaluate.py, rebuild of the reference's
:60-289): synthetic scene with two fragments under a known rigid
transform, random-init checkpoint, full keypoint-lookup -> mutual-NN ->
inlier-ratio -> RANSAC -> registration-recall path.
"""
import os
import sys

import numpy as np
import pytest


@pytest.fixture
def eth_scene(tmp_path, rng):
    scene = tmp_path / "eth" / "gazebo_summer"
    kp_dir = scene / "Keypoints"
    kp_dir.mkdir(parents=True)

    from gcl_tpu.utils.pointcloud import write_ply_xyz

    # fragment 0: structured cloud; fragment 1 = rigid transform of it
    x0 = np.concatenate([
        rng.rand(400, 3) * [4, 4, 0.1],
        rng.rand(200, 3) * [0.5, 0.5, 2] + [1, 1, 0],
        rng.rand(200, 3) * [0.5, 2, 1.5] + [2.5, 0.5, 0],
    ]).astype(np.float32)
    th = 0.4
    r_mat = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1]], np.float32)
    t_vec = np.array([0.7, -0.4, 0.15], np.float32)
    # gt maps fragment 1 into fragment 0's frame: x0 = gt @ x1
    x1 = (x0 - t_vec) @ r_mat  # x1 = R^T (x0 - t)  =>  x0 = R x1 + t
    gt = np.eye(4)
    gt[:3, :3] = r_mat
    gt[:3, 3] = t_vec

    write_ply_xyz(str(scene / "Hokuyo_0.ply"), x0)
    write_ply_xyz(str(scene / "Hokuyo_1.ply"), x1.astype(np.float32))
    kp_idx = rng.choice(len(x0), 120, replace=False)
    np.savetxt(str(kp_dir / "Hokuyo_0_Keypoints.txt"), kp_idx, fmt="%d")
    np.savetxt(str(kp_dir / "Hokuyo_1_Keypoints.txt"), kp_idx, fmt="%d")

    with open(scene / "gt.log", "w") as f:
        f.write("0\t1\t2\n")
        for r in range(4):
            f.write("\t".join(str(gt[r, c]) for c in range(4)) + "\n")
    return tmp_path / "eth", gt


def test_eth_evaluate_cli(eth_scene, tmp_path, monkeypatch, capsys):
    root, gt = eth_scene
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import generalization_ETH.evaluate as ev

    # random-init checkpoint for a tiny model
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import build_graph
    from gcl_tpu.models.resunet import ResUNetBN2C
    from gcl_tpu.train import checkpoint as ckpt

    model = ResUNetBN2C(1, 16, bn_momentum=0.05, normalize_feature=True,
                        conv1_kernel_size=3, D=3)
    specs = ResUNetBN2C.conv_specs(3)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    cap = 64
    tc = np.zeros((cap, 4), np.int32)
    tc[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(tc), jnp.asarray(np.ones(cap, bool)),
                    specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g, jnp.ones((cap, 1)),
                           train=False)
    ck = str(tmp_path / "rand.pth")
    ckpt.save_checkpoint(ck, epoch=0, params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state={}, config={}, best_val=0,
                         best_val_epoch=0, best_val_metric="x")

    monkeypatch.setattr(ev, "SCENE_LIST", ["gazebo_summer"])
    log_dir = str(tmp_path / "logs")
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--eth_root", str(root), "--checkpoint", ck,
        "--model", "ResUNetBN2C", "--model_n_out", "16",
        "--conv1_kernel_size", "3", "--voxel_size", "0.12",
        "--log_dir", log_dir])
    ev.main()
    out = capsys.readouterr().out
    assert "feature-match recall" in out
    assert "registration recall" in out
    # est log written in the reference's 5-line layout
    est = os.path.join(log_dir, "est_gazebo_summer.log")
    assert os.path.exists(est)
    lines = open(est).read().strip().split("\n")
    assert len(lines) == 5
    t_est = np.array([[float(v) for v in lines[1 + r].split()]
                      for r in range(4)])
    # identical geometry + identical keypoint indices -> mutual-NN
    # correspondences are exact and even a random-init model registers
    rte = np.linalg.norm(t_est[:3, 3] - gt[:3, 3])
    assert rte < 0.3, f"RTE {rte}"
