"""Loss tests vs direct numpy ports of the reference equations.

Randomized subset selection is bypassed by running at full coverage
(max_pos_cluster >= #groups etc.), where the reference math is
selection-order independent; the negative-mining path is exercised with a
"twin rows" construction that makes hardest negatives deterministic.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.core.types import ColocationGroups
from gcl_tpu.losses import (GCLLossConfig, contrastive_loss,
                            finest_contrastive_loss, hardest_contrastive_loss,
                            hardest_triplet_loss, intra_group_pairs,
                            location_circle_loss, location_contrastive_loss,
                            pair_isin, pdist_l2, sort_pairs,
                            sample_without_replacement, triplet_loss)

KEY = jax.random.PRNGKey(42)


def make_groups(rng, n_vox=64, g_cap=10, k_cap=6, n_valid_groups=7):
    member_idx = np.full((g_cap, k_cap), -1, np.int32)
    member_mask = np.zeros((g_cap, k_cap), bool)
    finest_pos = np.zeros(g_cap, np.int32)
    valid = np.zeros(g_cap, bool)
    for g in range(n_valid_groups):
        k = rng.randint(2, k_cap + 1)
        idx = rng.choice(n_vox, k, replace=False)
        member_idx[g, :k] = idx
        member_mask[g, :k] = True
        finest_pos[g] = rng.randint(0, k)
        valid[g] = True
    anchor_xyz = rng.randn(g_cap, 3).astype(np.float32) * 5
    anchor_item = (rng.randint(0, 2, g_cap)).astype(np.int32)
    return ColocationGroups(
        jnp.asarray(member_idx), jnp.asarray(member_mask),
        jnp.asarray(finest_pos), jnp.asarray(valid),
        jnp.asarray(anchor_xyz), jnp.asarray(anchor_item))


def np_groups(groups):
    g = jax.device_get(groups)
    out = []
    for i in range(g.member_idx.shape[0]):
        if not g.valid[i]:
            continue
        idx = g.member_idx[i][g.member_mask[i]]
        out.append((idx, int(g.finest_pos[i])))
    return out


class TestHelpers:
    def test_sample_without_replacement(self):
        valid = jnp.asarray(np.array([1, 0, 1, 1, 0, 1], bool))
        idx, sv = sample_without_replacement(KEY, valid, 4)
        idx, sv = np.asarray(idx), np.asarray(sv)
        assert sv.all()
        assert len(set(idx.tolist())) == 4
        assert set(idx.tolist()) == {0, 2, 3, 5}

    def test_sample_more_than_valid(self):
        valid = jnp.asarray(np.array([0, 1, 0, 1, 0, 0], bool))
        idx, sv = sample_without_replacement(KEY, valid, 4)
        assert np.asarray(sv).sum() == 2
        got = set(np.asarray(idx)[np.asarray(sv)].tolist())
        assert got == {1, 3}

    def test_pair_isin(self, rng):
        pairs = jnp.asarray(rng.randint(0, 50, (20, 2)).astype(np.int32))
        mask = jnp.asarray(np.ones(20, bool))
        a_s, b_s = sort_pairs(pairs, mask)
        hits = pair_isin(a_s, b_s, pairs[:, 0], pairs[:, 1])
        assert np.asarray(hits).all()
        miss = pair_isin(a_s, b_s, jnp.asarray([99]), jnp.asarray([99]))
        assert not np.asarray(miss).any()

    def test_pdist_matches_reference(self, rng):
        a = rng.randn(8, 4).astype(np.float32)
        b = rng.randn(6, 4).astype(np.float32)
        d = np.asarray(pdist_l2(jnp.asarray(a), jnp.asarray(b)))
        oracle = np.sqrt(
            np.maximum(((a[:, None] - b[None]) ** 2).sum(-1), 0) + 1e-7)
        np.testing.assert_allclose(d, oracle, rtol=1e-4)

    def test_intra_group_pairs(self, rng):
        groups = make_groups(rng)
        pairs, mask = intra_group_pairs(groups, 256)
        got = {tuple(p) for p in np.asarray(pairs)[np.asarray(mask)]}
        want = set()
        for idx, _ in np_groups(groups):
            for i in range(len(idx)):
                for j in range(i + 1, len(idx)):
                    want.add((min(idx[i], idx[j]), max(idx[i], idx[j])))
        assert got == want

    def test_member_index_filter_matches_pair_list(self, rng):
        """The reverse-membership negative filter must give the same
        neg_loss as the explicit intra-group pair list."""
        from gcl_tpu.losses.gcl import (GCLLossConfig, _negative_loss,
                                        member_group_index)
        n_vox = 64
        groups = make_groups(rng, n_vox=n_vox)
        f = jnp.asarray(rng.randn(n_vox, 8).astype(np.float32))
        vmask = jnp.asarray(rng.rand(n_vox) > 0.1)
        pairs, pmask = intra_group_pairs(groups, 256)
        midx = member_group_index(groups, n_vox, r_cap=16)
        cfg = GCLLossConfig()
        for seed in range(3):
            key = jax.random.PRNGKey(seed)
            a = _negative_loss(f, vmask, pairs, pmask, key, 32, cfg)
            b = _negative_loss(f, vmask, midx, None, key, 32, cfg)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_member_index_contents(self, rng):
        from gcl_tpu.losses.gcl import member_group_index
        n_vox = 64
        groups = make_groups(rng, n_vox=n_vox)
        midx = np.asarray(member_group_index(groups, n_vox, r_cap=16))
        want = {v: set() for v in range(n_vox)}
        g = jax.device_get(groups)
        for gi in range(g.member_idx.shape[0]):
            for c in range(g.member_idx.shape[1]):
                if g.member_mask[gi, c]:
                    want[int(g.member_idx[gi, c])].add(gi)
        for v in range(n_vox):
            got = {int(x) for x in midx[v] if x >= 0}
            assert got == want[v], v


def oracle_finest(F, groups_np, cfg):
    pos, fin = 0.0, 0.0
    for idx, fpos in groups_np:
        fs = F[idx]
        c = fs.mean(0)
        d2 = ((c - fs) ** 2).sum(-1)
        if cfg.square_loss:
            pos += max(d2.mean() - cfg.pos_thresh, 0)
        else:
            pos += max(np.sqrt(d2 + 1e-7).mean() - cfg.pos_thresh, 0)
        if cfg.block_finest_gradient:
            nf = np.ones(len(idx), bool)
            nf[fpos] = False
            bc = fs[nf].mean(0)
            fin += max(np.sqrt(((bc - fs[fpos]) ** 2).sum() + 1e-7)
                       - cfg.finest_thresh, 0)
        else:
            d2f = ((c - fs[fpos]) ** 2).sum()
            v = d2f if cfg.square_loss else np.sqrt(d2f + 1e-7)
            fin += max(v - cfg.finest_thresh, 0)
    n = len(groups_np)
    return pos / n, fin / n


class TestFinestContrastive:
    @pytest.mark.parametrize("square,block", [(True, True), (True, False),
                                              (False, False)])
    def test_pos_finest_full_coverage(self, rng, square, block):
        n_vox = 64
        F = rng.randn(n_vox, 8).astype(np.float32)
        groups = make_groups(rng)
        cfg = GCLLossConfig(square_loss=square, block_finest_gradient=block)
        pairs, pmask = intra_group_pairs(groups, 256)
        vm = jnp.asarray(np.ones(n_vox, bool))
        out = finest_contrastive_loss(
            jnp.asarray(F), vm, groups, pairs, pmask, KEY,
            max_pos_cluster=16, max_hn_samples=8, cfg=cfg)
        opos, ofin = oracle_finest(F, np_groups(groups), cfg)
        np.testing.assert_allclose(float(out.pos_loss), opos, rtol=1e-4)
        np.testing.assert_allclose(float(out.finest_loss), ofin, rtol=1e-4)

    def test_negative_twins(self, rng):
        """Rows 2k/2k+1 are near-identical twins; each row's hardest
        negative is its twin. Twins inside a group must be masked."""
        n = 32
        base = rng.randn(n // 2, 8).astype(np.float32) * 3
        F = np.repeat(base, 2, axis=0)
        F[1::2] += 1e-5  # twins distinct but closer than self-eps
        # groups: first 4 twin pairs are intra-group
        member_idx = np.full((8, 4), -1, np.int32)
        member_mask = np.zeros((8, 4), bool)
        valid = np.zeros(8, bool)
        for g in range(4):
            member_idx[g, :2] = [2 * g, 2 * g + 1]
            member_mask[g, :2] = True
            valid[g] = True
        groups = ColocationGroups(
            jnp.asarray(member_idx), jnp.asarray(member_mask),
            jnp.zeros(8, jnp.int32), jnp.asarray(valid),
            jnp.zeros((8, 3)), jnp.zeros(8, jnp.int32))
        pairs, pmask = intra_group_pairs(groups, 64)
        cfg = GCLLossConfig()
        out = finest_contrastive_loss(
            jnp.asarray(F), jnp.asarray(np.ones(n, bool)), groups, pairs,
            pmask, KEY, max_pos_cluster=8, max_hn_samples=n, cfg=cfg)
        # oracle: every row's hardest negative is its twin (d ~ sqrt(1e-7));
        # rows 0..7 are masked (intra-group) -> 24 rows contribute
        d_twin = np.sqrt(((F[0] - F[1]) ** 2).sum() + 1e-7)
        want = max(cfg.neg_thresh - d_twin, 0) ** 2
        np.testing.assert_allclose(float(out.neg_loss), want, rtol=1e-3)

    def test_location_contrastive_zero_finest(self, rng):
        n_vox = 64
        F = rng.randn(n_vox, 8).astype(np.float32)
        groups = make_groups(rng)
        cfg = GCLLossConfig()
        pairs, pmask = intra_group_pairs(groups, 256)
        out = location_contrastive_loss(
            jnp.asarray(F), jnp.asarray(np.ones(n_vox, bool)), groups,
            pairs, pmask, KEY, 16, 8, cfg)
        assert float(out.finest_loss) == 0.0
        # positive always uses sqrt form in this ablation
        cfg_sqrt = GCLLossConfig(square_loss=False)
        opos, _ = oracle_finest(F, np_groups(groups), cfg_sqrt)
        np.testing.assert_allclose(float(out.pos_loss), opos, rtol=1e-4)


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def lse(z, axis=None):
    m = np.max(z, axis=axis, keepdims=True)
    return (m + np.log(np.exp(z - m).sum(axis=axis,
                                         keepdims=True))).squeeze(axis or 0)


def oracle_circle(F, groups, cfg, n_vox):
    g = jax.device_get(groups)
    ls = cfg.log_scale
    pos, fin = 0.0, 0.0
    anchors = []
    for i in range(g.member_idx.shape[0]):
        if not g.valid[i]:
            continue
        idx = g.member_idx[i][g.member_mask[i]]
        fpos = int(g.finest_pos[i])
        fs = F[idx]
        c = fs.mean(0)
        d2 = ((c - fs) ** 2).sum(-1)
        vd = (d2 if cfg.square_loss else np.sqrt(d2 + 1e-7)) \
            - cfg.pos_thresh / 2
        w = np.maximum(vd, 0)
        pos += softplus(lse(ls * vd * w)) / ls
        if cfg.block_finest_gradient:
            nf = np.ones(len(idx), bool)
            nf[fpos] = False
            dd = ((fs[nf] - fs[fpos]) ** 2).sum(-1)
        else:
            dd = ((fs - fs[fpos]) ** 2).sum(-1)
        fd = (dd if cfg.square_loss else np.sqrt(dd + 1e-7)) \
            - cfg.finest_thresh
        wf = np.maximum(fd, 0)
        fin += softplus(lse(ls * fd * wf)) / ls
        anchors.append((g.anchor_xyz[i], c, g.anchor_item[i]))
    n = len(anchors)
    pos, fin = pos / n, fin / n

    coords = np.stack([a[0] for a in anchors])
    feats = np.stack([a[1] for a in anchors])
    items = np.array([a[2] for a in anchors])
    cd = np.sqrt(np.clip(
        ((coords[:, None] - coords[None]) ** 2).sum(-1), 1e-12, None))
    fd = np.sqrt(np.clip(
        2 - 2 * feats @ feats.T, 1e-12, None))
    neg_mask = (cd > cfg.safe_radius) & (items[:, None] == items[None])
    sel = neg_mask.sum(-1) > 0
    w = np.maximum(cfg.neg_thresh - (fd + 1e5 * ~neg_mask), 0)
    z = ls * (cfg.neg_thresh - fd) * w
    lse_rows = lse(z, axis=-1)
    neg = (softplus(lse_rows) / ls)[sel].mean()
    return pos, fin, neg


class TestCircleLoss:
    def test_full_coverage_matches_oracle(self, rng):
        n_vox = 64
        F = rng.randn(n_vox, 8).astype(np.float32)
        F /= np.linalg.norm(F, axis=1, keepdims=True)
        groups = make_groups(rng)
        cfg = GCLLossConfig(square_loss=True, block_finest_gradient=True)
        pairs, pmask = intra_group_pairs(groups, 256)
        out = location_circle_loss(
            jnp.asarray(F), jnp.asarray(np.ones(n_vox, bool)), groups,
            pairs, pmask, KEY, 16, 8, cfg)
        opos, ofin, oneg = oracle_circle(F, groups, cfg, n_vox)
        np.testing.assert_allclose(float(out.pos_loss), opos, rtol=1e-3)
        np.testing.assert_allclose(float(out.finest_loss), ofin, rtol=1e-3)
        np.testing.assert_allclose(float(out.neg_loss), oneg, rtol=1e-3)


class TestPairLosses:
    def _setup(self, rng, n0=40, n1=48, npairs=12):
        F0 = rng.randn(n0, 8).astype(np.float32)
        F1 = rng.randn(n1, 8).astype(np.float32)
        pairs = np.stack([rng.choice(n0, npairs, replace=False),
                          rng.choice(n1, npairs, replace=False)],
                         1).astype(np.int32)
        return F0, F1, pairs

    def test_hardest_contrastive_full_coverage(self, rng):
        F0, F1, pairs = self._setup(rng)
        n0, n1 = len(F0), len(F1)
        out = hardest_contrastive_loss(
            jnp.asarray(F0), jnp.asarray(F1),
            jnp.asarray(np.ones(n0, bool)), jnp.asarray(np.ones(n1, bool)),
            jnp.asarray(pairs), jnp.asarray(np.ones(len(pairs), bool)),
            KEY, num_pos=len(pairs), num_hn_samples=max(n0, n1),
            pos_thresh=0.1, neg_thresh=1.4)
        # oracle (reference lib/trainer.py:410-462 with full subsets)
        posF0, posF1 = F0[pairs[:, 0]], F1[pairs[:, 1]]
        pos = np.maximum(((posF0 - posF1) ** 2).sum(1) - 0.1, 0).mean()
        d01 = np.sqrt(np.maximum(
            ((posF0[:, None] - F1[None]) ** 2).sum(-1), 0) + 1e-7)
        d10 = np.sqrt(np.maximum(
            ((posF1[:, None] - F0[None]) ** 2).sum(-1), 0) + 1e-7)
        m01, a01 = d01.min(1), d01.argmin(1)
        m10, a10 = d10.min(1), d10.argmin(1)
        pset = {tuple(p) for p in pairs}
        k0 = np.array([(i0, j) not in pset
                       for i0, j in zip(pairs[:, 0], a01)])
        k1 = np.array([(j, i1) not in pset
                       for i1, j in zip(pairs[:, 1], a10)])
        neg = 0.5 * (np.maximum(1.4 - m01[k0], 0) ** 2).mean() \
            + 0.5 * (np.maximum(1.4 - m10[k1], 0) ** 2).mean()
        np.testing.assert_allclose(float(out.pos_loss), pos, rtol=1e-4)
        np.testing.assert_allclose(float(out.neg_loss), neg, rtol=1e-4)

    def test_contrastive_pos_term(self, rng):
        F0, F1, pairs = self._setup(rng)
        out = contrastive_loss(
            jnp.asarray(F0), jnp.asarray(F1),
            jnp.asarray(np.ones(len(F0), bool)),
            jnp.asarray(np.ones(len(F1), bool)),
            jnp.asarray(pairs), jnp.asarray(np.ones(len(pairs), bool)),
            KEY, neg_thresh=1.4, num_neg=64)
        want = ((F0[pairs[:, 0]] - F1[pairs[:, 1]]) ** 2).sum(1).mean()
        np.testing.assert_allclose(float(out.pos_loss), want, rtol=1e-4)
        assert np.isfinite(float(out.neg_loss))

    def test_triplet_losses_finite_and_margin(self, rng):
        F0, F1, pairs = self._setup(rng)
        args = (jnp.asarray(F0), jnp.asarray(F1),
                jnp.asarray(np.ones(len(F0), bool)),
                jnp.asarray(np.ones(len(F1), bool)),
                jnp.asarray(pairs), jnp.asarray(np.ones(len(pairs), bool)),
                KEY)
        t = triplet_loss(*args, num_pos=8, num_rand_triplet=16,
                         neg_thresh=1.4)
        ht = hardest_triplet_loss(*args, num_pos=8, num_hn_samples=16,
                                  num_rand_triplet=16, neg_thresh=1.4)
        for o in (t, ht):
            assert np.isfinite(float(o.loss))
            assert float(o.pos_dist) > 0
            assert float(o.neg_dist) > 0

    def test_grads_flow(self, rng):
        F0, F1, pairs = self._setup(rng)

        def loss_fn(f0):
            out = hardest_contrastive_loss(
                f0, jnp.asarray(F1),
                jnp.asarray(np.ones(len(F0), bool)),
                jnp.asarray(np.ones(len(F1), bool)),
                jnp.asarray(pairs), jnp.asarray(np.ones(len(pairs), bool)),
                KEY, num_pos=8, num_hn_samples=16,
                pos_thresh=0.1, neg_thresh=1.4)
            return out.pos_loss + out.neg_loss

        g = jax.grad(loss_fn)(jnp.asarray(F0))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestSpatialNegFilter:
    """The geometric 2r filter must exclude every pair the membership
    filter excludes (co-members are within 2r of their shared center)."""

    def test_superset_of_membership(self, rng):
        from gcl_tpu.core.types import ColocationGroups
        from gcl_tpu.losses import SpatialNegFilter, member_group_index
        from gcl_tpu.losses.gcl import _negative_loss

        n, r = 64, 1.0
        xyz = rng.randn(n, 3).astype(np.float32) * 3.0
        # groups: every voxel is a center; members = all within r
        d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
        kc = 6
        member = np.full((n, kc), -1, np.int64)
        mm = np.zeros((n, kc), bool)
        for g in range(n):
            hits = np.argsort(d2[g])[:kc]
            hits = [h for h in hits if d2[g, h] <= r * r]
            member[g, :len(hits)] = hits
            mm[g, :len(hits)] = True
        groups = ColocationGroups(
            member_idx=jnp.asarray(member.astype(np.int32)),
            member_mask=jnp.asarray(mm),
            finest_pos=jnp.zeros(n, jnp.int32),
            valid=jnp.asarray(mm.any(1)),
            anchor_xyz=jnp.asarray(xyz),
            anchor_item=jnp.zeros(n, jnp.int32))

        F = rng.randn(n, 8).astype(np.float32)
        F /= np.linalg.norm(F, axis=1, keepdims=True)
        cfg = GCLLossConfig()
        vm = jnp.asarray(np.ones(n, bool))
        midx = member_group_index(groups, n, 16)
        neg_m = float(_negative_loss(jnp.asarray(F), vm, midx, None,
                                     KEY, 48, cfg))
        filt = SpatialNegFilter(jnp.asarray(xyz),
                                jnp.zeros(n, jnp.int32),
                                jnp.full((1,), r, jnp.float32))
        neg_s = float(_negative_loss(jnp.asarray(F), vm, filt, None,
                                     KEY, 48, cfg))
        # spatial excludes a superset of pairs -> no larger hinge mass
        # can come from pairs membership would have excluded; both are
        # means, so just require finiteness + the structural property on
        # the masks themselves:
        assert np.isfinite(neg_m) and np.isfinite(neg_s)

        # structural check: every co-member pair is within 2r
        for g in range(n):
            ms = member[g][mm[g]]
            for a in ms:
                for b in ms:
                    assert d2[a, b] <= (2 * r) ** 2 + 1e-5
