"""Multiway pose-graph GT refinement vs synthetic-trajectory oracles
(reference lib/complement_data_loader.py:423-516 rebuilt in
gcl_tpu/data/posegraph.py).
"""
import numpy as np
import pytest

from gcl_tpu.data.posegraph import (Edge, full_registration,
                                    multiway_transforms,
                                    optimize_pose_graph, se3_exp, se3_log)


def rand_se3(rng, rot=0.5, trans=2.0):
    xi = np.concatenate([rng.randn(3) * rot, rng.randn(3) * trans])
    return se3_exp(xi)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        for _ in range(20):
            xi = rng.randn(6) * np.array([0.5] * 3 + [3.0] * 3)
            np.testing.assert_allclose(se3_log(se3_exp(xi)), xi,
                                       rtol=1e-6, atol=1e-8)

    def test_exp_small_angle(self):
        xi = np.array([1e-14, 0, 0, 1.0, 2.0, 3.0])
        t = se3_exp(xi)
        np.testing.assert_allclose(t[:3, 3], [1, 2, 3], atol=1e-9)
        np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-9)


class TestPoseGraph:
    def test_consistent_chain_reproduces_composition(self, rng):
        """Odometry-only graph with exact measurements: the optimum is
        the composed chain (the reference's odometry initialization,
        :435-446)."""
        n = 4
        gt = [np.eye(4)]
        for _ in range(n - 1):
            gt.append(gt[-1] @ rand_se3(rng, 0.3, 1.5))
        edges = [Edge(i, i + 1,
                      np.linalg.inv(gt[i + 1]) @ gt[i], 100.0,
                      uncertain=False) for i in range(n - 1)]
        poses = optimize_pose_graph(n, edges)
        for i in range(n):
            np.testing.assert_allclose(poses[i], gt[i], atol=1e-6)

    def test_loop_closure_reduces_drift(self, rng):
        """Noisy odometry + exact loop closures: optimized poses must be
        closer to GT than the raw composed chain."""
        n = 5
        gt = [np.eye(4)]
        for _ in range(n - 1):
            gt.append(gt[-1] @ rand_se3(rng, 0.25, 1.0))

        def rel(i, j):  # measurement mapping i -> j frame
            return np.linalg.inv(gt[j]) @ gt[i]

        noisy = []
        for i in range(n - 1):
            noise = se3_exp(np.concatenate([rng.randn(3) * 0.02,
                                            rng.randn(3) * 0.05]))
            noisy.append(Edge(i, i + 1, rel(i, i + 1) @ noise, 50.0,
                              uncertain=False))
        loops = [Edge(i, j, rel(i, j), 50.0, uncertain=True)
                 for i in range(n) for j in range(i + 2, n)]
        # raw chain from noisy odometry
        chain = [np.eye(4)]
        for e in noisy:
            chain.append(chain[-1] @ np.linalg.inv(e.m_st))
        init = chain
        poses = optimize_pose_graph(n, noisy + loops, init=init)

        def err(p):
            return sum(np.linalg.norm(se3_log(np.linalg.inv(p[i]) @ gt[i]))
                       for i in range(n))

        assert err(poses) < 0.5 * err(chain)

    def test_bad_loop_edge_downweighted(self, rng):
        """A wildly wrong loop closure must not corrupt an otherwise
        exact graph (the line process / edge_prune_threshold role,
        reference :454-461)."""
        n = 4
        gt = [np.eye(4)]
        for _ in range(n - 1):
            gt.append(gt[-1] @ rand_se3(rng, 0.2, 1.0))
        edges = [Edge(i, i + 1, np.linalg.inv(gt[i + 1]) @ gt[i], 100.0,
                      uncertain=False) for i in range(n - 1)]
        garbage = rand_se3(rng, 1.5, 8.0)
        edges.append(Edge(0, 3, garbage, 100.0, uncertain=True))
        poses = optimize_pose_graph(n, edges, init=gt)
        for i in range(n):
            d = np.linalg.norm(se3_log(np.linalg.inv(poses[i]) @ gt[i]))
            assert d < 0.05, f"node {i} drifted {d}"


class TestMultiwayTransforms:
    def test_recovers_gt_from_noisy_odometry(self, rng):
        """End-to-end: world cloud observed from 5 poses (curr + 2 per
        side), noisy odometry priors; refined complement->curr
        transforms must beat the priors and land near GT."""
        world = np.concatenate([
            rng.rand(600, 3) * [12, 12, 0.2],
            rng.rand(300, 3) * [1, 1, 3] + [3, 3, 0],
            rng.rand(300, 3) * [1, 3, 2] + [8, 5, 0],
        ]).astype(np.float64)

        poses = []  # sensor poses (sensor -> world)
        for k in range(5):
            xi = np.concatenate([rng.randn(3) * 0.1,
                                 [2.0 * k, 0.3 * k, 0]])
            poses.append(se3_exp(xi))
        curr = 2
        cmpls = [1, 0, 3, 4]  # left pair then right pair
        clouds = {i: (world - poses[i][:3, 3]) @ poses[i][:3, :3]
                  for i in range(5)}  # world points in sensor frame

        def gt_to_curr(i):
            return np.linalg.inv(poses[curr]) @ poses[i]

        odo, gt = [], []
        for i in cmpls:
            g = gt_to_curr(i)
            noise = se3_exp(np.concatenate([rng.randn(3) * 0.01,
                                            rng.randn(3) * 0.05]))
            odo.append(g @ noise)
            gt.append(g)

        ms = multiway_transforms(clouds[curr],
                                 [clouds[i] for i in cmpls], odo,
                                 num_one_side=2, icp_voxel_size=0.1)
        for m, g, o in zip(ms, gt, odo):
            e_ref = np.linalg.norm(se3_log(np.linalg.inv(m) @ g))
            e_odo = np.linalg.norm(se3_log(np.linalg.inv(o) @ g))
            assert e_ref < 0.02, f"refined err {e_ref}"
            assert e_ref < e_odo
