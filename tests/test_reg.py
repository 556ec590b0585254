"""Registration stack tests: synthetic rigid problems with known GT."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.reg import (Matcher, est_quad_linear_robust, find_nn,
                         kabsch, ransac_pose, registration_icp,
                         registration_success, rigid_transform_3d,
                         rte_rre, transform)

KEY = jax.random.PRNGKey(0)


def rand_pose(rng, max_angle=np.pi, max_t=5.0):
    a = rng.randn(3)
    a /= np.linalg.norm(a)
    th = rng.rand() * max_angle
    K = np.cross(np.eye(3), a)
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3) * max_t
    return T.astype(np.float32)


class TestProcrustes:
    def test_exact_recovery(self, rng):
        src = rng.randn(1, 50, 3).astype(np.float32)
        t = rand_pose(rng)
        tgt = np.asarray(transform(jnp.asarray(src), jnp.asarray(t)[None]))
        est = np.asarray(rigid_transform_3d(jnp.asarray(src),
                                            jnp.asarray(tgt)))[0]
        np.testing.assert_allclose(est, t, atol=1e-4)

    def test_weighted_ignores_outliers(self, rng):
        src = rng.randn(1, 50, 3).astype(np.float32)
        t = rand_pose(rng)
        tgt = np.array(transform(jnp.asarray(src), jnp.asarray(t)[None]))
        tgt[0, :10] += 100.0  # corrupted
        w = np.ones((1, 50), np.float32)
        w[0, :10] = 0
        est = np.asarray(rigid_transform_3d(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w)))[0]
        np.testing.assert_allclose(est, t, atol=1e-4)


class TestRobustPose:
    def test_recovers_small_pose_with_outliers(self, rng):
        src = rng.randn(500, 3).astype(np.float32) * 10
        t = rand_pose(rng, max_angle=0.3, max_t=1.0)
        tgt = src @ t[:3, :3].T + t[:3, 3]
        tgt[:50] += rng.randn(50, 3) * 5  # 10% outliers
        est = np.asarray(est_quad_linear_robust(jnp.asarray(src),
                                                jnp.asarray(tgt)))
        rte, rre = rte_rre(est, t)
        assert rte < 0.1 and rre < 1.0

    def test_masked_padding(self, rng):
        src = rng.randn(300, 3).astype(np.float32) * 10
        t = rand_pose(rng, max_angle=0.2, max_t=1.0)
        tgt = src @ t[:3, :3].T + t[:3, 3]
        srcp = np.concatenate([src, rng.randn(100, 3) * 50]).astype(
            np.float32)
        tgtp = np.concatenate([tgt, rng.randn(100, 3) * 50]).astype(
            np.float32)
        mask = np.zeros(400, bool)
        mask[:300] = True
        est = np.asarray(est_quad_linear_robust(
            jnp.asarray(srcp), jnp.asarray(tgtp), mask=jnp.asarray(mask)))
        rte, rre = rte_rre(est, t)
        assert rte < 0.05 and rre < 0.5


class TestICP:
    def test_aligns_clouds(self, rng):
        src = rng.randn(800, 3) * 5
        t = rand_pose(rng, max_angle=0.1, max_t=0.15)
        tgt = src @ t[:3, :3].T + t[:3, 3]
        est = registration_icp(src, tgt, 0.5)
        rte, rre = rte_rre(est, t)
        assert rte < 0.02 and rre < 0.2

    def test_kabsch(self, rng):
        src = rng.randn(20, 3)
        t = rand_pose(rng)
        tgt = src @ t[:3, :3].T + t[:3, 3]
        np.testing.assert_allclose(kabsch(src, tgt), t, atol=1e-6)


class TestRansac:
    def test_high_outlier_rate(self, rng):
        n = 1000
        src = rng.randn(n, 3).astype(np.float32) * 20
        t = rand_pose(rng)
        tgt = (src @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
        # 70% outliers
        out = rng.choice(n, int(0.7 * n), replace=False)
        tgt[out] = rng.randn(len(out), 3).astype(np.float32) * 20
        est, inl, fit = ransac_pose(
            jnp.asarray(src), jnp.asarray(tgt), KEY, 0.6,
            num_hypotheses=4096)
        ok, rte, rre = registration_success(np.asarray(est), t)
        assert ok, (rte, rre)
        assert float(fit) > 0.25


class TestSC2PCR:
    def test_registration_kitti_config(self, rng):
        """KITTI SC2-PCR config (config_json/config_KITTI.json): d_thre
        0.1... scaled scene: use lidar-like spread with 60% outliers."""
        n = 1500
        src = (rng.randn(n, 3) * [20, 20, 2]).astype(np.float32)
        t = rand_pose(rng)
        tgt = (src @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
        out = rng.choice(n, int(0.6 * n), replace=False)
        tgt[out] += rng.randn(len(out), 3).astype(np.float32) * 10
        matcher = Matcher(inlier_threshold=0.6, d_thre=0.1, num_node="all",
                          ratio=0.2, nms_radius=0.6, max_points=8000,
                          k1=30, k2=20)
        est = np.asarray(matcher.SC2_PCR(jnp.asarray(src)[None],
                                         jnp.asarray(tgt)[None]))[0]
        ok, rte, rre = registration_success(est, t)
        assert ok, (rte, rre)

    def test_estimator_with_features(self, rng):
        """Feature matching path: descriptors of true correspondences are
        similar; estimator recovers the pose."""
        n, c = 1200, 16
        src = (rng.randn(n, 3) * [15, 15, 2]).astype(np.float32)
        t = rand_pose(rng)
        tgt_pts = (src @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
        f = rng.randn(n, c).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        f_noise = f + rng.randn(n, c).astype(np.float32) * 0.05
        f_noise /= np.linalg.norm(f_noise, axis=1, keepdims=True)
        perm = rng.permutation(n)
        matcher = Matcher(inlier_threshold=0.6, d_thre=0.1, ratio=0.2,
                          nms_radius=0.6, k1=30, k2=20)
        est, labels, sc, tc = matcher.estimator(
            jnp.asarray(src)[None], jnp.asarray(tgt_pts[perm])[None],
            jnp.asarray(f)[None], jnp.asarray(f_noise[perm])[None])
        ok, rte, rre = registration_success(np.asarray(est)[0], t)
        assert ok, (rte, rre)
        assert float(jnp.mean(labels)) > 0.5


class TestMatching:
    def test_find_nn(self, rng):
        f0 = rng.randn(300, 8).astype(np.float32)
        f1 = rng.randn(200, 8).astype(np.float32)
        inds, d = find_nn(jnp.asarray(f0), jnp.asarray(f1), chunk=64)
        want = np.argmin(
            ((f0[:, None] - f1[None]) ** 2).sum(-1), axis=1)
        np.testing.assert_array_equal(np.asarray(inds), want)

    def test_find_nn_masked(self, rng):
        f0 = rng.randn(64, 4).astype(np.float32)
        f1 = rng.randn(64, 4).astype(np.float32)
        m1 = np.zeros(64, bool)
        m1[:32] = True
        inds, _ = find_nn(jnp.asarray(f0), jnp.asarray(f1),
                          jnp.asarray(m1), chunk=64)
        assert np.asarray(inds).max() < 32
