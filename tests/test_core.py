"""Core sparse engine tests: voxelizer, kernel maps, sparse conv.

Oracles are straightforward numpy/dict implementations (the reference has
no tests at all — SURVEY.md §4 — so these define the framework's own
correctness contract: quantization parity with ME.utils.sparse_quantize
semantics, kernel maps vs a dict lookup, sparse conv vs dense conv).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.core import (ConvSpec, INVALID_BATCH, build_graph,
                          default_level_caps, kernel_offsets, l2_normalize,
                          masked_mean_var, sparse_conv, voxelize_points,
                          representative_xyz)


def _np_voxelize(points, voxel_size):
    """Oracle: unique floor(p/vs) per cloud, first occurrence kept."""
    coords = np.floor(points / voxel_size).astype(np.int32)
    seen = {}
    for i, c in enumerate(map(tuple, coords)):
        if c not in seen:
            seen[c] = i
    return seen


class TestVoxelize:
    def test_unique_and_representatives(self, rng):
        B, P = 3, 500
        pts = rng.randn(B, P, 3).astype(np.float32) * 5.0
        mask = np.ones((B, P), bool)
        mask[1, 400:] = False
        batch, rep = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                                     0.7, n_cap=2048)
        batch, rep = jax.device_get((batch, rep))

        for b in range(B):
            oracle = _np_voxelize(pts[b][mask[b]], 0.7)
            got_rows = np.where((batch.coords[:, 0] == b) & batch.mask)[0]
            got = {tuple(batch.coords[r, 1:4]) for r in got_rows}
            assert got == set(oracle.keys())
            # representative point falls inside its voxel
            for r in got_rows:
                cb, pi = rep[r]
                assert cb == b
                c = np.floor(pts[b, pi] / 0.7).astype(np.int32)
                assert tuple(c) == tuple(batch.coords[r, 1:4])

    def test_padding_is_clean(self, rng):
        pts = rng.randn(1, 100, 3).astype(np.float32)
        mask = np.ones((1, 100), bool)
        batch, _ = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                                   0.5, n_cap=512)
        batch = jax.device_get(batch)
        pad = ~batch.mask
        assert np.all(batch.coords[pad, 0] == int(INVALID_BATCH))
        assert np.all(batch.feats[pad] == 0)
        assert np.all(batch.feats[batch.mask] == 1.0)

    def test_capacity_overflow_drops(self, rng):
        # in key range (|xy| < 512, |z| < 128 voxels) but way over n_cap
        pts = (rng.rand(1, 1000, 3).astype(np.float32)
               * np.asarray([45.0, 45.0, 10.0], np.float32))
        mask = np.ones((1, 1000), bool)
        batch, _ = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                                   0.1, n_cap=64)
        batch = jax.device_get(batch)
        assert batch.mask.sum() == 64  # full, no crash

    def test_out_of_key_range_dropped_not_aliased(self, rng):
        # Points beyond the per-cloud conv key window must be DROPPED
        # (clipping would alias distinct voxels and could break the
        # sorted-blocks row order the fused conv windows rely on). A
        # dense near-origin cluster pins the density-weighted
        # recentring at zero; the two glitch returns must vanish.
        base = (rng.randn(100, 3) * 3.0).astype(np.float32)
        pts = np.concatenate(
            [base, [[1000.0, 0.0, 0.0],    # |x| >= 512 voxels
                    [0.0, 0.0, 200.0]]],   # |z| >= 64 voxels
            0).astype(np.float32)[None]
        mask = np.ones((1, 102), bool)
        batch, _ = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                                   1.0, n_cap=256)
        batch = jax.device_get(batch)
        got = {tuple(c) for c in batch.coords[batch.mask][:, 1:]}
        oracle = {tuple(v) for v in np.floor(base).astype(np.int32)}
        assert got == oracle

    def test_recentring_keeps_far_and_tall_clouds(self, rng):
        """Clouds outside the absolute key window (fine-voxel indoor /
        outdoor eval; the reference's absolute coords are unbounded)
        are recentred per cloud rather than truncated, preserving the
        full relative voxel pattern."""
        for center in ([5000.0, -3000.0, 300.0],   # far from origin
                       [0.0, 0.0, 80.0]):          # z span alone > 64
            # z spread stays inside the 128-voxel window once centred
            base = (rng.randn(300, 3) * np.asarray([8.0, 8.0, 15.0])
                    + np.asarray(center)).astype(np.float32)
            base = base.clip(np.asarray(center) - 55,
                             np.asarray(center) + 55)
            pts = base[None]
            mask = np.ones((1, 300), bool)
            batch, _ = voxelize_points(jnp.asarray(pts),
                                       jnp.asarray(mask), 1.0,
                                       n_cap=512)
            batch = jax.device_get(batch)
            got = np.asarray(sorted(
                tuple(c) for c in batch.coords[batch.mask][:, 1:]))
            oracle = np.asarray(sorted(_np_voxelize(base, 1.0).keys()))
            assert len(got) == len(oracle), center
            # identical relative pattern (one global shift per cloud)
            np.testing.assert_array_equal(
                got - got.min(0), oracle - oracle.min(0))

    def test_representative_xyz(self, rng):
        pts = rng.randn(2, 200, 3).astype(np.float32)
        mask = np.ones((2, 200), bool)
        batch, rep = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                                     0.4, n_cap=512)
        xyz = np.asarray(representative_xyz(jnp.asarray(pts), rep, batch.mask))
        m = np.asarray(batch.mask)
        c = np.floor(xyz[m] / 0.4).astype(np.int32)
        assert np.array_equal(c, np.asarray(batch.coords)[m][:, 1:4])


def _oracle_kmap(out_coords, in_coords, offsets):
    table = {tuple(c): i for i, c in enumerate(in_coords)}
    K, N = len(offsets), len(out_coords)
    km = np.full((K, N), -1, np.int64)
    for k, off in enumerate(offsets):
        for i, c in enumerate(out_coords):
            q = (c[0], c[1] + off[0], c[2] + off[1], c[3] + off[2])
            km[k, i] = table.get(q, -1)
    return km


class TestKernelMaps:
    def _random_batch(self, rng, n=300, cap=512, span=12):
        coords = rng.randint(-span, span, size=(n, 3))
        b = rng.randint(0, 3, size=(n, 1))
        coords = np.unique(np.concatenate([b, coords], 1), axis=0)
        n = len(coords)
        pad = np.full((cap - n, 4), -1, np.int32)
        pad[:, 0] = int(INVALID_BATCH)
        all_c = np.concatenate([coords.astype(np.int32), pad])
        mask = np.zeros(cap, bool)
        mask[:n] = True
        return all_c, mask, coords

    def test_self_map_matches_oracle(self, rng):
        all_c, mask, coords = self._random_batch(rng)
        spec = ConvSpec("c", 1, 1, 3)
        g = build_graph(jnp.asarray(all_c), jnp.asarray(mask), [spec],
                        {1: all_c.shape[0]})
        km = np.asarray(g.kmaps[spec.key])
        oracle = _oracle_kmap(all_c[mask], all_c[mask],
                              kernel_offsets(3))
        assert np.array_equal(km[:, mask], oracle)
        assert np.all(km[:, ~mask] == -1)

    def test_downsample_levels_and_strided_map(self, rng):
        all_c, mask, coords = self._random_batch(rng)
        specs = [ConvSpec("down", 1, 2, 3), ConvSpec("up", 2, 1, 3),
                 ConvSpec("self2", 2, 2, 3)]
        caps = {1: all_c.shape[0], 2: all_c.shape[0]}
        g = build_graph(jnp.asarray(all_c), jnp.asarray(mask), specs, caps)

        # Level-2 coords = unique floor(c/2)*2
        l2 = jax.device_get(g.levels[2])
        got = {tuple(c) for c in l2.coords[l2.mask]}
        want = {(c[0],) + tuple((np.floor_divide(c[1:], 2) * 2))
                for c in coords}
        assert got == want

        # Strided down map: out at L2, offsets in L1 units
        l2_valid = l2.coords[l2.mask]
        oracle = _oracle_kmap(l2.coords, all_c[mask], kernel_offsets(3))
        km = np.asarray(g.kmaps[specs[0].key])
        assert np.array_equal(km, oracle)

        # Transpose (up) map: out at L1, offsets in L1 units, lookup in L2
        lut_in = l2.coords.copy()
        lut_in[~l2.mask] = np.array([1 << 30, 0, 0, 0])
        oracle_up = _oracle_kmap(all_c, lut_in, kernel_offsets(3))
        oracle_up[:, ~mask] = -1
        km_up = np.asarray(g.kmaps[specs[1].key])
        assert np.array_equal(km_up, oracle_up)

        # Self map at L2: offsets scaled by stride 2
        oracle_s2 = _oracle_kmap(lut_in, lut_in, kernel_offsets(3) * 2)
        oracle_s2[:, ~l2.mask] = -1
        km_s2 = np.asarray(g.kmaps[specs[2].key])
        assert np.array_equal(km_s2, oracle_s2)

    def test_downsample_blocked_narrow_keys(self, rng):
        """The blocked (n_clouds declared) downsample sorts with a
        single packed int32 key instead of the (hi, lo) pair; the
        resulting level must hold the same voxel set, a sorted emitted
        key index, and per-cloud aligned bases."""
        from gcl_tpu.core.kernel_maps import _downsample_level

        all_c, mask, coords = self._random_batch(rng)
        cap = all_c.shape[0] + 2 * 256
        plain = jax.device_get(_downsample_level(
            jnp.asarray(all_c), jnp.asarray(mask), 2, cap))
        blocked = jax.device_get(_downsample_level(
            jnp.asarray(all_c), jnp.asarray(mask), 2, cap, n_clouds=2))
        want = {tuple(c) for c in plain.coords[plain.mask]}
        got = {tuple(c) for c in blocked.coords[blocked.mask]}
        assert got == want
        # emitted key index must be ascending over the valid prefix of
        # the sorted view and consistent with coord_keys of the coords
        from gcl_tpu.core.coords import coord_keys
        hi, lo = jax.device_get(coord_keys(jnp.asarray(blocked.coords), 2))
        nv = int(blocked.mask.sum())
        kh, kl, pm = blocked.key_hi[:nv], blocked.key_lo[:nv], \
            blocked.perm[:nv]
        assert np.array_equal(kh, hi[pm])
        assert np.array_equal(kl, lo[pm])
        order = np.lexsort((kl, kh))
        assert np.array_equal(order, np.arange(nv))

    def test_pallas_join_matches_bsearch(self, rng):
        """Mosaic merge-join builder == binary-search builder (interpret
        mode; the TPU path is exercised by bench.py)."""
        from gcl_tpu.core.kernel_maps import (_build_kmap,
                                              _build_kmap_pallas,
                                              _downsample_level,
                                              _index_level)
        all_c, mask, coords = self._random_batch(rng)
        l1 = _index_level(jnp.asarray(all_c), jnp.asarray(mask), 1)
        l2 = _downsample_level(jnp.asarray(all_c), jnp.asarray(mask), 2,
                               all_c.shape[0])
        cases = [  # (out, in, in_stride, kernel, offset_scale)
            (l1, l1, 1, 3, 1), (l2, l1, 1, 3, 1),  # self, down
            (l1, l2, 2, 3, 1), (l2, l2, 2, 3, 2),  # transpose, self-L2
            (l1, l1, 1, 5, 1),
        ]
        for out_l, in_l, in_s, k, scale in cases:
            offs = kernel_offsets(k) * scale
            ref = np.asarray(_build_kmap(out_l, in_l, in_s, offs))
            got = np.asarray(_build_kmap_pallas(out_l, in_l, in_s, offs,
                                                interpret=True))
            assert np.array_equal(ref, got), (in_s, k)

    def test_dilation(self, rng):
        all_c, mask, coords = self._random_batch(rng)
        spec = ConvSpec("d", 1, 1, 3, dilation=2)
        g = build_graph(jnp.asarray(all_c), jnp.asarray(mask), [spec],
                        {1: all_c.shape[0]})
        oracle = _oracle_kmap(all_c[mask], all_c[mask],
                              kernel_offsets(3) * 2)
        km = np.asarray(g.kmaps[spec.key])
        assert np.array_equal(km[:, mask], oracle)


class TestSparseConv:
    def test_matches_dense_conv(self, rng):
        """Sparse conv == dense 3D conv evaluated at occupied sites."""
        span, cin, cout, k = 6, 4, 8, 3
        dense = np.zeros((span, span, span, cin), np.float32)
        occ = rng.rand(span, span, span) < 0.3
        occ[0, 0, 0] = True
        dense[occ] = rng.randn(occ.sum(), cin).astype(np.float32)

        idxs = np.argwhere(occ).astype(np.int32)
        n = len(idxs)
        cap = 128
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = idxs
        mask = np.zeros(cap, bool)
        mask[:n] = True
        feats = np.zeros((cap, cin), np.float32)
        feats[:n] = dense[occ]

        spec = ConvSpec("c", 1, 1, k)
        g = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                        {1: cap})
        w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.1
        out = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(w),
                                     g.kmaps[spec.key]))

        # dense oracle: out[p] = sum_off dense[p+off] @ w[off], zeros outside
        offs = kernel_offsets(k)
        for i in range(n):
            acc = np.zeros(cout, np.float32)
            for kk, off in enumerate(offs):
                q = idxs[i] + off
                if np.all(q >= 0) and np.all(q < span) and occ[tuple(q)]:
                    acc += dense[tuple(q)] @ w[kk]
            np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-5)
        assert np.all(out[n:] == 0)

    def test_grad_flows(self, rng):
        n, cin, cout = 32, 4, 4
        coords = np.zeros((n, 4), np.int32)
        coords[:, 1] = np.arange(n)
        mask = np.ones(n, bool)
        spec = ConvSpec("c", 1, 1, 3)
        g = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                        {1: n})
        feats = jnp.asarray(rng.randn(n, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

        def loss(w, f):
            return jnp.sum(sparse_conv(f, w, g.kmaps[spec.key]) ** 2)

        gw, gf = jax.grad(loss, argnums=(0, 1))(w, feats)
        assert np.isfinite(np.asarray(gw)).all()
        assert np.abs(np.asarray(gf)).sum() > 0

    @pytest.mark.parametrize("in_s,out_s,k", [(1, 1, 3), (1, 2, 3),
                                              (2, 1, 3), (1, 1, 5)])
    def test_reverse_map_grads_match_scatter(self, rng, in_s, out_s, k):
        """The scatter-free backward (reverse kernel maps) must produce
        exactly the same dX/dW as the scatter-add reference path."""
        cap, cin, cout = 96, 4, 6
        n = 60
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = rng.randint(-6, 7, (n, 3))
        # dedupe (keep first)
        _, first = np.unique(coords[:n, 1:], axis=0, return_index=True)
        keep = np.zeros(n, bool)
        keep[first] = True
        coords[:n][~keep] = [int(INVALID_BATCH), -1, -1, -1]
        mask = np.zeros(cap, bool)
        mask[:n] = keep

        spec = ConvSpec("c", in_s, out_s, k)
        caps = {1: cap, 2: cap}
        g = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                        caps)
        rev_key = ConvSpec("r", out_s, in_s, k).key
        assert rev_key in g.kmaps  # build_graph materializes reverses
        n_in_cap = caps[in_s]
        feats = jnp.asarray(rng.randn(n_in_cap, cin).astype(np.float32))
        feats = feats * jnp.asarray(
            np.asarray(g.levels[in_s].mask))[:, None]
        w = jnp.asarray(rng.randn(k ** 3, cin, cout).astype(np.float32))
        cot = jnp.asarray(
            rng.randn(caps[out_s], cout).astype(np.float32))

        def loss_scatter(w, f):
            return jnp.sum(sparse_conv(f, w, g.kmaps[spec.key]) * cot)

        def loss_rev(w, f):
            return jnp.sum(sparse_conv(f, w, g.kmaps[spec.key],
                                       g.kmaps[rev_key]) * cot)

        gw0, gf0 = jax.grad(loss_scatter, argnums=(0, 1))(w, feats)
        gw1, gf1 = jax.grad(loss_rev, argnums=(0, 1))(w, feats)
        np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf0), np.asarray(gf1),
                                   rtol=1e-5, atol=1e-5)


class TestPallasConv:
    """Interpret-mode checks of the Mosaic windowed gather-GEMM kernel
    against the XLA scan path (the TPU path is exercised by bench.py)."""

    def _case(self, rng, n=700, c=16, cout=24, k=27):
        x = rng.randn(n, c).astype(np.float32)
        w = (rng.randn(k, c, cout) * 0.1).astype(np.float32)
        base = np.arange(n, dtype=np.int32)
        idx = np.zeros((k, n), np.int32)
        for kk in range(k):
            v = np.clip(base + (kk - k // 2) * 11
                        + np.sort(rng.randint(-3, 4, n)), 0, n - 1)
            v[rng.rand(n) < 0.3] = n  # missing
            idx[kk] = v
        # a hard jump (cloud boundary) to exercise multi-chunk windows
        idx[:, n // 2:n // 2 + 40] = 0
        return (jnp.asarray(x), jnp.asarray(w), jnp.asarray(idx))

    def _scan_ref(self, x, w, idx):
        n, c = x.shape
        xp = jnp.concatenate([x, jnp.zeros((1, c), x.dtype)], 0)

        def body(acc, kw):
            i, wk = kw
            return acc + xp[i] @ wk, None

        out, _ = jax.lax.scan(
            body, jnp.zeros((idx.shape[1], w.shape[-1]), jnp.float32),
            (idx, w))
        return out

    def test_fwd_matches_scan(self, rng):
        from gcl_tpu.core.pallas_conv import pallas_conv_fwd
        x, w, idx = self._case(rng)
        ref = np.asarray(self._scan_ref(x, w, idx))
        got = np.asarray(pallas_conv_fwd(x, w, idx, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_fwd_c1_matches_scan(self, rng):
        """Cin == 1 specialization (occupancy conv1)."""
        from gcl_tpu.core.pallas_conv import pallas_conv_fwd
        x, w, idx = self._case(rng, c=1, cout=24)
        ref = np.asarray(self._scan_ref(x, w, idx))
        got = np.asarray(pallas_conv_fwd(x, w, idx, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_fwd_cout1_matches_scan(self, rng):
        """Cout == 1 specialization (dX of a Cin==1 conv)."""
        from gcl_tpu.core.pallas_conv import pallas_conv_fwd
        x, w, idx = self._case(rng, c=16, cout=1)
        ref = np.asarray(self._scan_ref(x, w, idx))
        got = np.asarray(pallas_conv_fwd(x, w, idx, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_dw_c1_matches_scan(self, rng):
        from gcl_tpu.core.pallas_conv import pallas_conv_dw
        x, w, idx = self._case(rng, c=1, cout=24)
        n = x.shape[0]
        g = jnp.asarray(rng.randn(idx.shape[1], 24).astype(np.float32))
        xp = jnp.concatenate([x, jnp.zeros((1, 1), x.dtype)], 0)
        ref = np.stack([np.asarray(xp[idx[kk]].T @ g)
                        for kk in range(idx.shape[0])])
        got = np.asarray(pallas_conv_dw(x, g, idx, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_dw_matches_scan(self, rng):
        from gcl_tpu.core.pallas_conv import pallas_conv_dw
        x, w, idx = self._case(rng)
        n, c = x.shape
        g = jnp.asarray(rng.randn(idx.shape[1], w.shape[-1]).astype(
            np.float32))
        xp = jnp.concatenate([x, jnp.zeros((1, c), x.dtype)], 0)
        ref = np.stack([np.asarray(xp[idx[kk]].T @ g)
                        for kk in range(idx.shape[0])])
        got = np.asarray(pallas_conv_dw(x, g, idx, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestFusedGraph:
    """The implicit-map (fused) path must match the explicit-map path:
    same forward values and same dX/dW, for same-level, strided and
    transpose geometries (interpret mode; TPU path via bench.py)."""

    def _coords(self, rng, cap=96, n=60):
        """Cloud-blocked key-sorted layout (the fused-map contract —
        what voxelize_per_cloud produces)."""
        raw = np.concatenate([rng.randint(0, 2, (n, 1)),
                              rng.randint(-6, 7, (n, 3))], axis=1)
        uniq = np.unique(raw, axis=0)  # lex-sorted by (cloud, x, y, z)
        m = len(uniq)
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:m] = uniq
        mask = np.zeros(cap, bool)
        mask[:m] = True
        return coords, mask

    @pytest.mark.parametrize("in_s,out_s,k", [(1, 1, 3), (1, 2, 3),
                                              (2, 1, 3), (1, 1, 5)])
    def test_fused_matches_explicit(self, rng, in_s, out_s, k):
        coords, mask = self._coords(rng)
        self._check(rng, coords, mask, in_s, out_s, k)

    @pytest.mark.parametrize("cin,cout,in_s,out_s", [
        (32, 32, 1, 1), (64, 64, 1, 1), (32, 64, 1, 2), (64, 32, 2, 1),
        (16, 16, 1, 1)])
    def test_fused_folded_channels(self, rng, monkeypatch, cin, cout,
                                   in_s, out_s):
        """Narrow-channel geometries route through the folded kernels
        (pallas_conv._conv_fold_fwd/_conv_fold_bwd, F = 128 // C) and
        must match the explicit map forward + dX/dW, including the
        mixed-fold case (fwd folds Cin, bwd folds Cout). Opt-in
        (GCL_CONV_FOLD=1): the fold is exact but currently a step-time
        loss at bench scale, so production defaults it off."""
        from gcl_tpu.core import pallas_conv
        monkeypatch.setattr(pallas_conv, "FOLD", True)
        assert pallas_conv._fold_factor(cin) > 1
        coords, mask = self._coords(rng)
        self._check(rng, coords, mask, in_s, out_s, 3, tol=1e-4,
                    cin=cin, cout=cout)

    def test_fused_folded_multichunk(self, rng, monkeypatch):
        """Folded path with window spans > win: extra chunks rerun the
        folded gather on synchronously-DMA'd key/feature slabs and must
        still be exact (the map's nch > 1 here; the kernel's own
        re-windowed nchf can be smaller since folded chunks are wider)."""
        from gcl_tpu.core import pallas_conv
        monkeypatch.setattr(pallas_conv, "FOLD", True)
        xs, ys, zs = 2, 14, 64
        coords = np.array([(0, x, y, z - 32) for x in range(xs)
                           for y in range(ys) for z in range(zs)],
                          np.int32)
        n = len(coords)
        cap = n + 128
        full = np.full((cap, 4), -1, np.int32)
        full[:, 0] = int(INVALID_BATCH)
        full[:n] = coords
        mask = np.zeros(cap, bool)
        mask[:n] = True
        fm = self._check(rng, full, mask, 1, 1, 3, tol=1e-4,
                         cin=32, cout=32)
        assert int(np.asarray(fm.nch).max()) > 1, \
            "geometry failed to produce a multi-chunk window"

    def test_fused_multichunk_windows(self, rng):
        """Group spans wider than one window chunk (nch > 1) must hit
        the kernels' extra-chunk path and still match the explicit map.
        Full z-columns (64 rows, the packed-key z range) make a
        dx-group's dy spread cover TILE + 2*64 + alignment > win=384
        rows per output tile. z stays inside pack_keys' 7-bit range —
        out-of-range coords legitimately never match on the fused path."""
        xs, ys, zs = 2, 14, 64
        coords = np.array([(0, x, y, z - 32) for x in range(xs)
                           for y in range(ys) for z in range(zs)],
                          np.int32)
        n = len(coords)  # 1792, key-sorted by construction
        cap = n + 128
        full = np.full((cap, 4), -1, np.int32)
        full[:, 0] = int(INVALID_BATCH)
        full[:n] = coords
        mask = np.zeros(cap, bool)
        mask[:n] = True
        # chunked accumulation reorders fp32 sums; grads reach ~1e2
        fm = self._check(rng, full, mask, 1, 1, 3, tol=1e-4)
        assert int(np.asarray(fm.nch).max()) > 1, \
            "geometry failed to produce a multi-chunk window"

    def test_fused_split_windows(self, rng, monkeypatch):
        """Dense enough geometry that some 256-output tiles' halves fit
        the (win-128)-wide static window slices: kernel_maps negates
        their FusedMap.rows and the kernels take the split compare
        variant (pallas_conv run_group_split) — values and grads must
        stay exact, and the geometry must actually produce such tiles
        (otherwise this test silently stops covering the branch).
        Opt-in (GCL_CONV_SPLIT=1): at bench scale too few tiles qualify
        and the extra dispatch branch regresses the wide-channel
        backward, so production defaults it off."""
        from gcl_tpu.core import pallas_conv
        monkeypatch.setattr(pallas_conv, "SPLIT", True)
        raw = np.stack(np.meshgrid(np.arange(-4, 5), np.arange(-12, 13),
                                   np.arange(-16, 17),
                                   indexing="ij")).reshape(3, -1).T
        keep = rng.rand(len(raw)) < 0.35
        sel = raw[keep]
        coords = np.concatenate(
            [np.zeros((len(sel), 1), np.int64), sel], axis=1)
        uniq = np.unique(coords, axis=0).astype(np.int32)
        n = len(uniq)
        cap = n + 128
        full = np.full((cap, 4), -1, np.int32)
        full[:, 0] = int(INVALID_BATCH)
        full[:n] = uniq
        mask = np.zeros(cap, bool)
        mask[:n] = True
        fm = self._check(rng, full, mask, 1, 1, 3, tol=1e-4,
                         cin=32, cout=32)
        assert (np.asarray(fm.rows) < 0).any(), \
            "geometry produced no split-eligible tiles"

    def test_upmap_window_soundness(self, rng):
        """Regression: upsample-map windows must cover every match at a
        scale where tile windows don't span the whole level.

        The old conservative coord-clamped window bounds were unsound
        for in_stride > 1 queries (floor-division collapses the leading
        packed-key component and lets a trailing one overshoot the
        bound), silently dropping matches at window edges — invisible
        at the tiny caps above, real at a few thousand voxels. Windows
        now come from exact min/max reductions over the query keys."""
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.types import map_key as mk

        pts = rng.randint(-30, 30, size=(4000, 2))
        z = rng.randint(-16, 16, size=(4000, 1))
        xyz = np.unique(np.concatenate([pts, z], axis=1), axis=0)
        xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
        n = len(xyz)
        cap = -(-n // 256) * 256 + 256
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = xyz
        mask = np.zeros(cap, bool)
        mask[:n] = True

        spec = ConvSpec("d", 1, 2, 3)
        caps = {1: cap, 2: cap}
        g_f = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                          [spec], caps, method="fused",
                          sorted_blocks=True, n_clouds=1)
        rk = mk(2, 1, 3, 1)
        rfm = g_f.fused[rk]  # UP map: level-1 queries into level 2
        n2 = g_f.levels[2].coords.shape[0]
        cin = 8
        feats2 = (rng.randn(n2, cin).astype(np.float32)
                  * np.asarray(g_f.levels[2].mask)[:, None])
        w = rng.randn(27, cin, cin).astype(np.float32) * 0.05

        from gcl_tpu.core.kernel_maps import _build_kmap, kernel_offsets
        km = np.asarray(_build_kmap(g_f.levels[1], g_f.levels[2], 2,
                                    kernel_offsets(3)))
        xp = np.concatenate([feats2, np.zeros((1, cin), np.float32)])
        idx0 = np.where(km < 0, n2, km)
        ref = sum(xp[idx0[kk]] @ w[kk] for kk in range(27))

        from gcl_tpu.core.pallas_conv import fused_conv_fwd
        sparse_ops.FORCE_INTERPRET = True
        try:
            out = fused_conv_fwd(
                jnp.asarray(feats2), jnp.asarray(w), rfm.qkey,
                rfm.starts, rfm.nch, rfm.tkeys, win=rfm.win,
                rows=rfm.rows, hstarts=rfm.hstarts, hnch=rfm.hnch,
                hwin=rfm.hwin, interpret=True)
        finally:
            sparse_ops.FORCE_INTERPRET = False
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("in_s,out_s", [(1, 1), (1, 2)])
    def test_fused_stacked_offsets(self, rng, monkeypatch, in_s, out_s):
        """Stacked-offset accumulate GEMMs (--conv_stack / GCL_CONV_STACK
        > 1): STACK consecutive offsets' gathers lane-concat into one
        full-depth GEMM — fwd weight reshape [K/S, S*C, Cout], bwd spad
        lane padding and the dw unstack+transpose+[::-1] are nontrivial
        layout transforms that must stay exact vs the explicit map.
        Opt-in (a measured wash at bench scale; ships default-off)."""
        from gcl_tpu.core import pallas_conv
        monkeypatch.setattr(pallas_conv, "STACK", 3)
        # cin = cout = 32: both the fwd (contract over Cin) and the
        # one-pass bwd (contract over Cout) take the stacked path
        assert pallas_conv._stack_for(27, 3, 32, 1) == 3
        coords, mask = self._coords(rng)
        self._check(rng, coords, mask, in_s, out_s, 3, tol=1e-4,
                    cin=32, cout=32)

    def _check(self, rng, coords, mask, in_s, out_s, k, tol=1e-5,
               cin=4, cout=6):
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.types import map_key as mk

        cap = coords.shape[0]
        spec = ConvSpec("c", in_s, out_s, k)
        caps = {1: cap, 2: cap}
        g_ref = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                            [spec], caps, method="bsearch")
        g_fused = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                              [spec], caps, method="fused",
                              sorted_blocks=True)
        assert g_fused.fused is not None and spec.key in g_fused.fused
        rk = mk(out_s, in_s, k, 1)
        feats = rng.randn(caps[in_s], cin).astype(np.float32)
        feats *= np.asarray(g_ref.levels[in_s].mask)[:, None]
        w = rng.randn(k ** 3, cin, cout).astype(np.float32)
        cot = rng.randn(caps[out_s], cout).astype(np.float32)

        def loss_ref(w, f):
            return jnp.sum(sparse_conv(f, w, g_ref.kmaps[spec.key],
                                       g_ref.kmaps[rk]) * cot)

        def loss_fused(w, f):
            from gcl_tpu.core import sparse_conv_fused
            return jnp.sum(sparse_conv_fused(
                f, w, g_fused.fused[spec.key], g_fused.fused[rk]) * cot)

        sparse_ops.FORCE_INTERPRET = True
        try:
            o_ref = sparse_conv(jnp.asarray(feats), jnp.asarray(w),
                                g_ref.kmaps[spec.key], g_ref.kmaps[rk])
            from gcl_tpu.core import sparse_conv_fused
            o_fused = sparse_conv_fused(
                jnp.asarray(feats), jnp.asarray(w),
                g_fused.fused[spec.key], g_fused.fused[rk])
            np.testing.assert_allclose(np.asarray(o_fused),
                                       np.asarray(o_ref),
                                       rtol=tol, atol=tol)
            gw0, gf0 = jax.grad(loss_ref, argnums=(0, 1))(
                jnp.asarray(w), jnp.asarray(feats))
            gw1, gf1 = jax.grad(loss_fused, argnums=(0, 1))(
                jnp.asarray(w), jnp.asarray(feats))
            np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                       rtol=tol, atol=tol)
            np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf0),
                                       rtol=tol, atol=tol)
        finally:
            sparse_ops.FORCE_INTERPRET = False
        return g_fused.fused[spec.key]


class TestC1zOccupancyConv:
    """Presence-bitmask occupancy conv (sparse_ops.sparse_conv_c1z) vs
    the explicit-map reference with all-ones features, including full
    z-columns touching the packed-key z boundary (vmask aliasing)."""

    @pytest.mark.parametrize("k", [3, 5])
    def test_matches_reference_with_ones(self, rng, k):
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.types import map_key as mk

        pts = rng.randint(-20, 20, size=(600, 3))
        col = np.array([(5, 5, z) for z in range(-64, 64)])
        xyz = np.unique(np.concatenate([pts, col]), axis=0)
        xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
        n = len(xyz)
        cap = n + 64
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = xyz
        mask = np.zeros(cap, bool)
        mask[:n] = True

        spec = ConvSpec("c", 1, 1, k)
        caps = {1: cap}
        g_ref = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                            [spec], caps, method="bsearch")
        g_fused = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                              [spec], caps, method="fused",
                              sorted_blocks=True, n_clouds=1)
        fm = g_fused.fused[spec.key]
        assert fm.c1z is not None
        rk = mk(1, 1, k, 1)

        cout = 6
        w = rng.randn(k ** 3, 1, cout).astype(np.float32)
        ones = np.asarray(mask, np.float32)[:, None]
        cot = rng.randn(cap, cout).astype(np.float32)

        def loss_ref(w):
            return jnp.sum(sparse_conv(jnp.asarray(ones), w,
                                       g_ref.kmaps[spec.key],
                                       g_ref.kmaps[rk]) * cot)

        def loss_c1z(w):
            return jnp.sum(sparse_ops.sparse_conv_c1z(
                w, fm, jnp.float32) * cot)

        sparse_ops.FORCE_INTERPRET = True
        try:
            o_ref = sparse_conv(jnp.asarray(ones), jnp.asarray(w),
                                g_ref.kmaps[spec.key], g_ref.kmaps[rk])
            o_c1z = sparse_ops.sparse_conv_c1z(jnp.asarray(w), fm,
                                               jnp.float32)
            np.testing.assert_allclose(np.asarray(o_c1z),
                                       np.asarray(o_ref),
                                       rtol=1e-5, atol=1e-5)
            gw0 = jax.grad(loss_ref)(jnp.asarray(w))
            gw1 = jax.grad(loss_c1z)(jnp.asarray(w))
            np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                       rtol=1e-4, atol=1e-4)
        finally:
            sparse_ops.FORCE_INTERPRET = False


class TestMaskedStats:
    def test_mean_var_ignores_padding(self, rng):
        f = rng.randn(100, 8).astype(np.float32)
        m = np.zeros(100, bool)
        m[:60] = True
        f[~m] = 1e6  # poison padding
        mean, var, cnt = masked_mean_var(jnp.asarray(f), jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(mean), f[:60].mean(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var), f[:60].var(0), rtol=1e-4)
        assert int(cnt) == 60

    def test_l2_normalize(self, rng):
        f = rng.randn(50, 32).astype(np.float32)
        out = np.asarray(l2_normalize(jnp.asarray(f)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                                   np.ones(50), rtol=1e-5)


class TestC1zJitteredConv:
    """sparse_conv_c1z_jittered: presence-masked output-space jitter on
    the occupancy fast path (StepConfig.jitter_mode='c1z')."""

    def _tiny_fused(self, rng, k=3):
        pts = rng.randint(-10, 10, size=(300, 3))
        xyz = np.unique(pts, axis=0)
        xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
        n = len(xyz)
        cap = n + 32
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = xyz
        mask = np.zeros(cap, bool)
        mask[:n] = True
        spec = ConvSpec("c", 1, 1, k)
        caps = {1: cap}
        g_ref = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                            [spec], caps, method="bsearch")
        g_fused = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                              [spec], caps, method="fused",
                              sorted_blocks=True, n_clouds=1)
        return spec, g_ref, g_fused, n, cap, mask

    def test_bit_order_matches_explicit_kmap(self, rng):
        """c1z_unpack_bits offset enumeration == kernel_offsets row order
        (the weight-row order), proven against the explicit gather map."""
        from gcl_tpu.core import sparse_ops

        for k in (3, 5):
            spec, g_ref, g_fused, n, cap, mask = self._tiny_fused(rng, k)
            fm = g_fused.fused[spec.key]
            sparse_ops.FORCE_INTERPRET = True
            try:
                w = jnp.asarray(rng.randn(k ** 3, 1, 4).astype(np.float32))
                _, sbits = sparse_ops._sparse_conv_c1z_core(
                    fm.win, jnp.dtype(jnp.float32), w, fm.c1z, fm.starts,
                    fm.nch, fm.tkeys)
            finally:
                sparse_ops.FORCE_INTERPRET = False
            bits = np.asarray(sparse_ops.c1z_unpack_bits(sbits, k ** 3))
            want = (np.asarray(g_ref.kmaps[spec.key]) >= 0).T  # [N, K^3]
            np.testing.assert_array_equal(bits[:n], want[:n].astype(
                np.int32), err_msg=f"k={k}")
            assert bits[n:].sum() == 0  # padded rows: no presence

    def test_noise_distribution_and_masks(self, rng):
        from gcl_tpu.core import sparse_ops

        spec, g_ref, g_fused, n, cap, mask = self._tiny_fused(rng, 3)
        fm = g_fused.fused[spec.key]
        cout = 4
        w = jnp.asarray(rng.randn(27, 1, cout).astype(np.float32))
        key = jax.random.PRNGKey(7)
        sigma = 0.1

        sparse_ops.FORCE_INTERPRET = True
        try:
            plain = sparse_ops.sparse_conv_c1z(w, fm, jnp.float32)
            out_j = sparse_ops.sparse_conv_c1z_jittered(
                w, fm, jnp.float32, key, sigma, p=1.0)
            out_p0 = sparse_ops.sparse_conv_c1z_jittered(
                w, fm, jnp.float32, key, sigma, p=0.0)
            row_sel = jnp.zeros((cap,), jnp.float32)
            out_sel0 = sparse_ops.sparse_conv_c1z_jittered(
                w, fm, jnp.float32, key, sigma, p=1.0, row_sel=row_sel)
            _, sbits = sparse_ops._sparse_conv_c1z_core(
                fm.win, jnp.dtype(jnp.float32), w, fm.c1z, fm.starts,
                fm.nch, fm.tkeys)
        finally:
            sparse_ops.FORCE_INTERPRET = False

        # p-gate off / fully-masked row_sel -> exactly the plain conv
        np.testing.assert_array_equal(np.asarray(out_p0),
                                      np.asarray(plain))
        np.testing.assert_array_equal(np.asarray(out_sel0),
                                      np.asarray(plain))

        # the injected noise equals presence-masked iid normals through
        # the weights (mirrors the implementation's RNG consumption —
        # the semantic content is the masking and the matmul algebra)
        _, k_eps = jax.random.split(key)
        bits = np.asarray(sparse_ops.c1z_unpack_bits(sbits, 27))
        eps = np.asarray(jax.random.normal(k_eps, (cap, 27),
                                           jnp.float32)) * sigma
        want = plain + (eps * bits) @ np.asarray(w)[:, 0, :]
        np.testing.assert_allclose(np.asarray(out_j), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_includes_noise_term(self, rng):
        """dW of the jittered conv = presence-exact dW + a^T cot for the
        realized noise mask a — the regularizer reaches the weights."""
        from gcl_tpu.core import sparse_ops

        spec, g_ref, g_fused, n, cap, mask = self._tiny_fused(rng, 3)
        fm = g_fused.fused[spec.key]
        cout = 4
        w = jnp.asarray(rng.randn(27, 1, cout).astype(np.float32))
        cot = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
        key = jax.random.PRNGKey(11)
        sigma = 0.05

        def loss_plain(w):
            return jnp.sum(sparse_ops.sparse_conv_c1z(
                w, fm, jnp.float32) * cot)

        def loss_jit(w):
            return jnp.sum(sparse_ops.sparse_conv_c1z_jittered(
                w, fm, jnp.float32, key, sigma, p=1.0) * cot)

        sparse_ops.FORCE_INTERPRET = True
        try:
            g0 = jax.grad(loss_plain)(w)
            g1 = jax.grad(loss_jit)(w)
            _, sbits = sparse_ops._sparse_conv_c1z_core(
                fm.win, jnp.dtype(jnp.float32), w, fm.c1z, fm.starts,
                fm.nch, fm.tkeys)
        finally:
            sparse_ops.FORCE_INTERPRET = False

        _, k_eps = jax.random.split(key)
        bits = np.asarray(sparse_ops.c1z_unpack_bits(sbits, 27))
        a = np.asarray(jax.random.normal(k_eps, (cap, 27),
                                         jnp.float32)) * sigma * bits
        want_delta = (a.T @ np.asarray(cot))[:, None, :]
        np.testing.assert_allclose(np.asarray(g1 - g0), want_delta,
                                   rtol=1e-4, atol=1e-4)


class TestC1zExactJitterConv:
    """sparse_conv_c1z_exact_jitter: reference-EXACT input jitter on the
    presence fast path via conv(1+eps) = presence(1) + conv(eps), with the
    eps conv's windows gated to jittered rows (window_support_gate).
    Oracle: the explicit-map conv over the literally jittered features."""

    def _two_cloud_fused(self, rng, k=3, nv=256):
        """Cloud-blocked 2-cloud layout (pads at block tails), fused +
        bsearch graphs over the same coords."""
        blocks = []
        mask = np.zeros(2 * nv, bool)
        coords = np.full((2 * nv, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        for c in range(2):
            pts = rng.randint(-10, 10, size=(300, 3))
            xyz = np.unique(pts, axis=0)
            xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))][:nv]
            n = len(xyz)
            coords[c * nv:c * nv + n, 0] = c
            coords[c * nv:c * nv + n, 1:] = xyz
            mask[c * nv:c * nv + n] = True
            blocks.append(n)
        spec = ConvSpec("c", 1, 1, k)
        caps = {1: 2 * nv}
        g_ref = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                            [spec], caps, method="bsearch")
        g_fused = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                              [spec], caps, method="fused",
                              sorted_blocks=True, n_clouds=2)
        return spec, g_ref, g_fused, mask

    @pytest.mark.parametrize("restrict", [True, False])
    def test_matches_literal_input_jitter(self, rng, restrict):
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.types import map_key as mk

        spec, g_ref, g_fused, mask = self._two_cloud_fused(rng)
        fm = g_fused.fused[spec.key]
        rfm = g_fused.fused[mk(1, 1, 3, 1)]
        assert fm.c1z is not None
        cap = mask.shape[0]
        cout = 4
        w = jnp.asarray(rng.randn(27, 1, cout).astype(np.float32))
        cot = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
        key = jax.random.PRNGKey(3)
        sigma = 0.5
        lv_mask = g_fused.levels[1].mask
        # jitter cloud 0 only (the GCL center-cloud pattern) or all rows
        row_sel = None
        if restrict:
            row_sel = jnp.asarray(
                (np.arange(cap) < cap // 2) & mask, jnp.float32)

        eps = sparse_ops.draw_input_eps(key, sigma, 1.0, lv_mask, row_sel)
        feats = jnp.asarray(mask, jnp.float32)[:, None] + eps
        rk = mk(1, 1, 3, 1)

        def loss_ref(w):
            return jnp.sum(sparse_conv(feats, w, g_ref.kmaps[spec.key],
                                       g_ref.kmaps[rk]) * cot)

        def loss_exact(w):
            return jnp.sum(sparse_ops.sparse_conv_c1z_exact_jitter(
                w, fm, rfm, jnp.float32, key, sigma, 1.0, lv_mask,
                row_sel) * cot)

        sparse_ops.FORCE_INTERPRET = True
        try:
            o_ref = sparse_conv(feats, w, g_ref.kmaps[spec.key],
                                g_ref.kmaps[rk])
            o_x = sparse_ops.sparse_conv_c1z_exact_jitter(
                w, fm, rfm, jnp.float32, key, sigma, 1.0, lv_mask,
                row_sel)
            np.testing.assert_allclose(np.asarray(o_x), np.asarray(o_ref),
                                       rtol=1e-4, atol=1e-4)
            gw0 = jax.grad(loss_ref)(w)
            gw1 = jax.grad(loss_exact)(w)
            np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                       rtol=1e-4, atol=1e-4)
        finally:
            sparse_ops.FORCE_INTERPRET = False

    def test_window_support_gate_skips_only_dead_windows(self, rng):
        """Gated nch produces identical output to full nch when the conv's
        features vanish off the selected rows; empty selection gates every
        window off."""
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.types import FusedMap
        from gcl_tpu.core.types import map_key as mk

        spec, g_ref, g_fused, mask = self._two_cloud_fused(rng)
        fm = g_fused.fused[spec.key]
        rfm = g_fused.fused[mk(1, 1, 3, 1)]
        cap = mask.shape[0]
        sel = np.zeros(cap, np.float32)
        sel[:40] = mask[:40]
        feats = jnp.asarray(
            rng.randn(cap, 1).astype(np.float32) * sel[:, None] * mask[:, None])
        w = jnp.asarray(rng.randn(27, 1, 4).astype(np.float32))

        nch_g = sparse_ops.window_support_gate(
            fm.nch, fm.starts, fm.win, jnp.asarray(sel),
            fm.tkeys.shape[1])
        fm_g = FusedMap(fm.qkey, fm.starts, nch_g, fm.tkeys, fm.win)

        sparse_ops.FORCE_INTERPRET = True
        try:
            full = sparse_ops.sparse_conv_fused(feats, w, fm, rfm)
            gated = sparse_ops.sparse_conv_fused(feats, w, fm_g, rfm)
        finally:
            sparse_ops.FORCE_INTERPRET = False
        np.testing.assert_allclose(np.asarray(gated), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)
        assert int(jnp.sum(nch_g)) < int(jnp.sum(fm.nch))

        empty = sparse_ops.window_support_gate(
            fm.nch, fm.starts, fm.win, jnp.zeros((cap,), jnp.float32),
            fm.tkeys.shape[1])
        assert int(jnp.sum(empty)) == 0
