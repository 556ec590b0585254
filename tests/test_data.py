"""Host data pipeline tests on a generated synthetic mini-KITTI."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.config import default_config
from gcl_tpu.data import (ColocationKittiDataset, DataLoader,
                          PairComplementKittiDataset,
                          batch_colocation_groups, build_correspondences,
                          voxelize_per_cloud)
from gcl_tpu.data.colocation import apply_transform
from gcl_tpu.data.synthetic import generate_synthetic_kitti, write_split_files


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    generate_synthetic_kitti(str(root), n_drives=1, n_frames=50, step=3.0)
    write_split_files(str(root / "config"), 1)
    return root


def make_cfg(root, **kw):
    cfg = default_config(
        kitti_root=str(root), voxel_size=0.3, min_dist=3, max_dist=18,
        num_neighborhood=4, point_capacity=8192, voxel_capacity=4096,
        pair_min_dist=3, pair_max_dist=10, complement_pair_dist=3,
        num_complement_one_side=2, use_old_pose=False,
        use_random_rotation=True, use_random_scale=True)
    cfg.update(kw)
    return cfg


def patch_splits(ds_cls, root):
    ds_cls.DATA_FILES = {
        p: os.path.join(str(root), "config", f"{p}_kitti.txt")
        for p in ("train", "val", "test")}


class TestColocationDataset:
    def test_index_and_sample(self, synth_root):
        cfg = make_cfg(synth_root)
        patch_splits(ColocationKittiDataset, synth_root)
        ds = ColocationKittiDataset("train", config=cfg)
        assert len(ds) > 0
        s = ds[0]
        c = cfg.num_neighborhood + 1
        assert s["points"].shape == (c, cfg.point_capacity, 3)
        assert s["pmask"].shape == (c, cfg.point_capacity)
        assert s["transforms"].shape == (c, 4, 4)
        np.testing.assert_allclose(s["transforms"][0], np.eye(4))
        # every cloud has real points
        assert s["pmask"].sum(axis=1).min() > 100

    def test_transforms_align_clouds(self, synth_root):
        """GT transforms must map neighbor clouds onto the center: the
        median NN distance between the aligned neighbor and the center
        cloud should be far below the scan spacing."""
        cfg = make_cfg(synth_root)
        patch_splits(ColocationKittiDataset, synth_root)
        ds = ColocationKittiDataset("train", config=cfg)
        s = ds[0]
        center = s["points"][0][s["pmask"][0]]
        nghb = s["points"][1][s["pmask"][1]]
        aligned = apply_transform(nghb, s["transforms"][1])
        from scipy.spatial import cKDTree
        d, _ = cKDTree(center).query(aligned[::10])
        assert np.median(d) < 1.0

    def test_device_flow_groups(self, synth_root):
        cfg = make_cfg(synth_root)
        patch_splits(ColocationKittiDataset, synth_root)
        ds = ColocationKittiDataset("train", config=cfg)
        loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
        batch = next(iter(loader))
        vox = voxelize_per_cloud(jnp.asarray(batch["points"]).reshape(
            -1, cfg.point_capacity, 3),
            jnp.asarray(batch["pmask"]).reshape(-1, cfg.point_capacity),
            cfg.voxel_size, cfg.voxel_capacity)
        b, c = batch["points"].shape[:2]
        vox_b = jax.tree_util.tree_map(
            lambda x: x.reshape((b, c) + x.shape[1:]), vox)
        groups = batch_colocation_groups(
            vox_b, jnp.asarray(batch["transforms"]),
            float(batch["search_radius"].max()), k=cfg.group_k)
        g = jax.device_get(groups)
        assert g.valid.sum() > 50  # plenty of colocation groups
        # finest member of a valid group is a real member
        vi = np.where(g.valid)[0][:50]
        for i in vi:
            col = g.finest_pos[i]
            assert g.member_mask[i, col]


class TestPairDataset:
    def test_test_phase_pairs(self, synth_root):
        cfg = make_cfg(synth_root)
        patch_splits(PairComplementKittiDataset, synth_root)
        ds = PairComplementKittiDataset("test", config=cfg,
                                        random_rotation=False,
                                        random_scale=False)
        assert len(ds) > 0
        s = ds[0]
        # trans maps cloud0 onto cloud1 (after the built-in test-phase
        # rotation augmentation): aligned NN distance small
        p0 = s["points0"][s["pmask0"]]
        p1 = s["points1"][s["pmask1"]]
        aligned = apply_transform(p0, s["trans"])
        from scipy.spatial import cKDTree
        d, _ = cKDTree(p1).query(aligned[::10])
        assert np.median(d) < 1.0

    def test_train_phase_with_complement(self, synth_root):
        cfg = make_cfg(synth_root)
        patch_splits(PairComplementKittiDataset, synth_root)
        ds = PairComplementKittiDataset("train", config=cfg,
                                        random_rotation=True,
                                        random_scale=True)
        assert len(ds) > 0
        s = ds[0]
        assert s["nghb_mask0"].sum() > 0
        assert s["nghb_mask1"].sum() > 0

    def test_icp_cache_roundtrip(self, synth_root):
        cfg = make_cfg(synth_root, use_old_pose=True)
        patch_splits(PairComplementKittiDataset, synth_root)
        ds = PairComplementKittiDataset("test", config=cfg,
                                        random_rotation=False,
                                        random_scale=False)
        drive, t0, t1 = ds.files[0][:3]
        _ = ds[0]
        key = "%d_%d_%d" % (drive, t0, t1)  # reference: drive_tnext_tcurr
        assert os.path.exists(os.path.join(ds.icp_path, key + ".npy"))
        # ICP-refined GT close to the true relative pose (synthetic poses
        # are exact, so ICP should stay near the odometry prior)
        from gcl_tpu.data import kitti_io
        slam = kitti_io.slam_poses(str(synth_root) + "/dataset", drive)
        want = np.linalg.inv(slam[t1]) @ slam[t0]
        got = np.load(os.path.join(ds.icp_path, key + ".npy"))
        assert np.abs(got[:3, 3] - want[:3, 3]).max() < 0.5

    def test_debug_use_old_complement(self, synth_root):
        """reference :567-570 'old method': per-pair complement ICP
        instead of multiway pose-graph, writing the same cache files."""
        cfg = make_cfg(synth_root, use_old_pose=True,
                       debug_use_old_complement=True,
                       debug_force_icp_recalculation=True)
        patch_splits(PairComplementKittiDataset, synth_root)
        ds = PairComplementKittiDataset("train", config=cfg,
                                        random_rotation=False,
                                        random_scale=False)
        s = ds[0]
        assert s["nghb_mask0"].sum() > 0
        drive, t0, t1, cmpl0, _ = ds.files[0]
        for tt in cmpl0:
            f = os.path.join(ds.icp_path, "%d_%d_%d.npy" % (drive, tt, t0))
            assert os.path.exists(f)

    def test_debug_force_icp_recalculation(self, synth_root):
        cfg = make_cfg(synth_root, use_old_pose=True)
        patch_splits(PairComplementKittiDataset, synth_root)
        ds = PairComplementKittiDataset("test", config=cfg,
                                        random_rotation=False,
                                        random_scale=False)
        drive, t0, t1 = ds.files[0][:3]
        _ = ds[0]
        f = os.path.join(ds.icp_path, "%d_%d_%d.npy" % (drive, t0, t1))
        good = np.load(f)
        np.save(f, np.eye(4))  # poison the on-disk cache
        import gcl_tpu.data.pairs as pairs_mod
        pairs_mod._icp_cache.clear()
        # without the flag the poisoned value is served back
        ds2 = PairComplementKittiDataset("test", config=cfg,
                                         random_rotation=False,
                                         random_scale=False)
        _ = ds2[0]
        np.testing.assert_allclose(np.load(f), np.eye(4))
        # with the flag the GT is recomputed and the file overwritten
        pairs_mod._icp_cache.clear()
        cfg3 = make_cfg(synth_root, use_old_pose=True,
                        debug_force_icp_recalculation=True)
        ds3 = PairComplementKittiDataset("test", config=cfg3,
                                         random_rotation=False,
                                         random_scale=False)
        _ = ds3[0]
        recomputed = np.load(f)
        assert np.abs(recomputed - np.eye(4)).max() > 1e-3
        np.testing.assert_allclose(recomputed[:3, 3], good[:3, 3],
                                   atol=0.2)

    def test_device_correspondences(self, synth_root):
        cfg = make_cfg(synth_root)
        patch_splits(PairComplementKittiDataset, synth_root)
        ds = PairComplementKittiDataset("test", config=cfg,
                                        random_rotation=False,
                                        random_scale=False)
        s = ds[0]
        vox = voxelize_per_cloud(
            jnp.stack([jnp.asarray(s["points0"]),
                       jnp.asarray(s["points1"])]),
            jnp.stack([jnp.asarray(s["pmask0"]), jnp.asarray(s["pmask1"])]),
            cfg.voxel_size, cfg.voxel_capacity)
        pairs, pm = build_correspondences(
            vox.xyz[0], vox.mask[0], vox.xyz[1], vox.mask[1],
            jnp.asarray(s["trans"]), float(s["search_radius"]),
            k=cfg.corr_k)
        assert int(np.asarray(pm).sum()) > 200


class TestLoader:
    def test_multihost_shards_partition_global_batches(self):
        """Every host enumerates the same seeded global order and keeps
        its contiguous slice: shard batches concatenated across hosts
        must reproduce the unsharded loader's batches exactly."""
        class Ixs:
            def __len__(self):
                return 37

            def __getitem__(self, i):
                return {"i": np.array([i])}

        def cat(samples):
            return np.concatenate([s["i"] for s in samples])

        full = DataLoader(Ixs(), batch_size=4, shuffle=True, drop_last=True,
                          collate_fn=cat)
        sh = [DataLoader(Ixs(), batch_size=4, shuffle=True, drop_last=True,
                         collate_fn=cat, shard_id=h, num_shards=2)
              for h in range(2)]
        got_full = list(full)
        got_sh = [list(s) for s in sh]
        assert len(got_full) == len(got_sh[0]) == len(got_sh[1]) == 9
        for b, (b0, b1) in zip(got_full, zip(*got_sh)):
            np.testing.assert_array_equal(b, np.concatenate([b0, b1]))
        # second epoch reshuffles, still consistently across hosts
        e2_full, e2_0, e2_1 = list(full), list(sh[0]), list(sh[1])
        assert not all(np.array_equal(a, b)
                       for a, b in zip(got_full, e2_full))
        for b, b0, b1 in zip(e2_full, e2_0, e2_1):
            np.testing.assert_array_equal(b, np.concatenate([b0, b1]))

    def test_multiworker_order(self, synth_root):
        cfg = make_cfg(synth_root)
        patch_splits(ColocationKittiDataset, synth_root)
        ds = ColocationKittiDataset("train", config=cfg)
        l0 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                        seed=7)
        l2 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                        seed=7)
        b0 = next(iter(l0))
        b2 = next(iter(l2))
        assert b0["meta"] == b2["meta"]  # same order, same indices


class TestTrajectoryIO:
    def test_gt_log_roundtrip(self, tmp_path):
        from gcl_tpu.utils.trajectory import (TrajectoryEntry,
                                              read_trajectory,
                                              write_trajectory)
        rng = np.random.RandomState(3)
        entries = [TrajectoryEntry((i, i + 1, 37), rng.randn(4, 4))
                   for i in range(5)]
        path = tmp_path / "gt.log"
        write_trajectory(entries, path)
        back = read_trajectory(path)
        assert len(back) == 5
        for a, b in zip(entries, back):
            assert a.metadata == b.metadata
            np.testing.assert_allclose(a.pose, b.pose, atol=1e-12)

    def test_rejects_truncated_file(self, tmp_path):
        from gcl_tpu.utils.trajectory import read_trajectory
        path = tmp_path / "gt.log"
        path.write_text("0 1 2\n1 0 0 0\n0 1 0 0\n")
        with pytest.raises(ValueError):
            read_trajectory(path)
