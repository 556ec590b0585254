"""Cross-implementation parity: run the REFERENCE's own torch code
(loaded from /root/reference via tests/_ref_oracle) and this repo's JAX
implementations on identical inputs, and assert the numbers match.

This replaces same-author numpy oracles as ground truth for the loss /
estimation semantics (a shared misreading cannot pass here).

Determinism strategy per function:
  * pos/finest group terms — full regime (max_pos_cluster >= n_groups):
    the reference's pos_sel degenerates to arange, ours to the identity
    selection, so both sides are sampling-free.
  * hardest-negative mining — either full candidate sets (subset
    permutation-invariant: min over ALL rows) or the exact sel arrays
    pinned on both sides (np.random.choice monkeypatched on the
    reference side, negative_loss_from_sel on ours).
  * est_quad_linear_robust / SC2-PCR — deterministic given inputs.
"""
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from tests._ref_oracle import (load_ref_method, ref_helpers,  # noqa: E402
                               ref_sc2pcr_matcher)

from gcl_tpu.core.types import ColocationGroups  # noqa: E402
from gcl_tpu.losses.gcl import (GCLLossConfig,  # noqa: E402
                                finest_contrastive_loss, intra_group_pairs,
                                location_circle_loss, member_group_index,
                                negative_loss_from_sel)
from gcl_tpu.losses.pairs import hardest_contrastive_loss  # noqa: E402


class _Self:
    """Stand-in for the reference trainer's ``self``: just the config
    attributes the extracted loss methods read."""

    def __init__(self, **kw):
        self.device = "cpu"
        self.pos_thresh = 0.1
        self.neg_thresh = 1.4
        self.finest_thresh = 0.2
        self.square_loss = True
        self.block_finest_gradient = True
        self.use_hard_negative = True
        self.use_pair_group_positive_loss = False
        self.safe_radius = 0.75
        self.log_scale = 16.0
        for k, v in kw.items():
            setattr(self, k, v)

    def cfg(self) -> GCLLossConfig:
        return GCLLossConfig(
            pos_thresh=self.pos_thresh, finest_thresh=self.finest_thresh,
            neg_thresh=self.neg_thresh, square_loss=self.square_loss,
            block_finest_gradient=self.block_finest_gradient,
            use_hard_negative=self.use_hard_negative,
            use_pair_group_positive_loss=self.use_pair_group_positive_loss,
            safe_radius=self.safe_radius, log_scale=self.log_scale)


def _make_groups(rng, n_voxels, sizes, batch_lengths=None):
    """Random colocation groups + the reference's (group, index,
    finest_flag) encoding of the same structure.

    Groups are disjoint (a voxel joins at most one group) so the
    structure is unambiguous; first members ascend so the reference's
    circle-loss batch bookkeeping (contiguous per-item blocks) holds.
    """
    g = len(sizes)
    kc = max(sizes)
    perm = rng.permutation(n_voxels)
    # reserve members; keep each group's first member ordered by group
    members, start = [], 0
    for s in sizes:
        members.append(np.sort(perm[start:start + s]))
        start += s
    members.sort(key=lambda m: m[0])
    if batch_lengths is not None:
        # re-deal members so group i's rows fall inside its batch item
        bounds = np.concatenate([[0], np.cumsum(batch_lengths)])
        per_item = [rng.permutation(
            np.arange(bounds[i], bounds[i + 1])) for i in
            range(len(batch_lengths))]
        members, used = [], [0] * len(batch_lengths)
        item_of_group = np.linspace(0, len(batch_lengths) - 1e-9,
                                    g).astype(int)
        for gi, s in enumerate(sizes):
            it = item_of_group[gi]
            pool = per_item[it]
            m = np.sort(pool[used[it]:used[it] + s])
            # the reference bins the pivot with `pivot > cum_lengths`,
            # which misassigns exact-boundary rows — keep pivots off the
            # boundaries so both sides agree
            while m[0] in bounds:
                used[it] += 1
                m = np.sort(pool[used[it]:used[it] + s])
            used[it] += s
            members.append(m)
        members.sort(key=lambda m: m[0])

    member_idx = np.full((g, kc), -1, np.int32)
    member_mask = np.zeros((g, kc), bool)
    finest_pos = np.zeros((g,), np.int32)
    index_cat, finest_cat = [], []
    for gi, m in enumerate(members):
        member_idx[gi, :len(m)] = m
        member_mask[gi, :len(m)] = True
        fp = rng.randint(len(m))
        finest_pos[gi] = fp
        index_cat.append(m)
        ff = np.zeros(len(m), bool)
        ff[fp] = True
        finest_cat.append(ff)
    groups = ColocationGroups(
        member_idx=jnp.asarray(member_idx),
        member_mask=jnp.asarray(member_mask),
        finest_pos=jnp.asarray(finest_pos),
        valid=jnp.ones((g,), bool),
        anchor_xyz=jnp.zeros((g, 3), jnp.float32),
        anchor_item=jnp.zeros((g,), jnp.int32),
    )
    ref = dict(
        group=torch.tensor([len(m) for m in members], dtype=torch.long),
        index=torch.tensor(np.concatenate(index_cat), dtype=torch.long),
        finest_flag=torch.tensor(np.concatenate(finest_cat)),
    )
    return groups, ref


SEEDS = [0, 1, 2, 3, 4]


class TestHardestContrastiveParity:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_full_candidate_regime(self, seed):
        """num_pos/num_hn_samples above the data sizes: the reference's
        random subsets become permutations of the full sets, and every
        output is permutation-invariant."""
        rng = np.random.RandomState(100 + seed)
        n0, n1, c, n_pairs = 64, 72, 16, 40
        f0 = rng.randn(n0, c).astype(np.float32)
        f1 = rng.randn(n1, c).astype(np.float32)
        i0 = rng.choice(n0, n_pairs, replace=False)
        i1 = rng.choice(n1, n_pairs, replace=False)
        pairs = np.stack([i0, i1], 1).astype(np.int32)

        ref_fn = load_ref_method("lib/trainer.py",
                                 "HardestContrastiveLossTrainer",
                                 "contrastive_hardest_negative_loss")
        np.random.seed(seed)
        ref_pos, ref_neg = ref_fn(
            _Self(), torch.from_numpy(f0), torch.from_numpy(f1),
            torch.from_numpy(pairs.astype(np.int64)),
            num_pos=4096, num_hn_samples=2048)

        out = hardest_contrastive_loss(
            jnp.asarray(f0), jnp.asarray(f1),
            jnp.ones(n0, bool), jnp.ones(n1, bool),
            jnp.asarray(pairs), jnp.ones(n_pairs, bool),
            jax.random.PRNGKey(seed), num_pos=4096, num_hn_samples=2048,
            pos_thresh=0.1, neg_thresh=1.4)
        np.testing.assert_allclose(float(out.pos_loss), float(ref_pos),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.neg_loss),
                                   float((ref_neg)), rtol=2e-5, atol=1e-6)


class TestFinestContrastiveParity:
    @pytest.mark.parametrize("seed", SEEDS)
    @pytest.mark.parametrize("block,square", [(True, True), (False, True),
                                              (False, False)])
    def test_pos_finest_full_regime(self, seed, block, square):
        rng = np.random.RandomState(200 + seed)
        n, c = 140, 16
        sizes = [int(s) for s in rng.randint(2, 7, size=12)]
        groups, ref_enc = _make_groups(rng, n, sizes)
        f = rng.randn(n, c).astype(np.float32)

        ref_fn = load_ref_method("lib/colocation_trainer.py",
                                 "FinestContrastiveLossTrainer",
                                 "finest_contrastive_loss")
        h = ref_helpers()
        index_split = torch.split(ref_enc["index"],
                                  tuple(ref_enc["group"].tolist()))
        index_hash = h["_exhaustive_hash"](index_split, n)
        np.random.seed(seed)
        ref_pos, ref_fin, _ = ref_fn(
            _Self(block_finest_gradient=block, square_loss=square),
            torch.from_numpy(f), ref_enc["group"], ref_enc["index"],
            index_hash, ref_enc["finest_flag"],
            max_pos_cluster=256, max_hn_samples=64)

        cfg = GCLLossConfig(block_finest_gradient=block,
                            square_loss=square)
        pairs, pmask = intra_group_pairs(groups, 1024)
        out = finest_contrastive_loss(
            jnp.asarray(f), jnp.ones(n, bool), groups, pairs, pmask,
            jax.random.PRNGKey(seed), max_pos_cluster=256,
            max_hn_samples=64, cfg=cfg)
        np.testing.assert_allclose(float(out.pos_loss), float(ref_pos),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.finest_loss), float(ref_fin),
                                   rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_negative_pinned_sel(self, seed, monkeypatch):
        """Pin the reference's sel_hn1/sel_hn2 draws and feed the same
        subsets to negative_loss_from_sel: the hardest-negative hinge,
        the intra-group (co-location) filter and the self-mask must all
        agree."""
        rng = np.random.RandomState(300 + seed)
        n, c, hn = 140, 16, 48
        sizes = [int(s) for s in rng.randint(2, 7, size=12)]
        groups, ref_enc = _make_groups(rng, n, sizes)
        f = rng.randn(n, c).astype(np.float32)
        sel1 = rng.choice(n, hn, replace=False)
        sel2 = rng.choice(n, hn, replace=False)

        ref_fn = load_ref_method("lib/colocation_trainer.py",
                                 "FinestContrastiveLossTrainer",
                                 "finest_contrastive_loss")
        h = ref_helpers()
        index_split = torch.split(ref_enc["index"],
                                  tuple(ref_enc["group"].tolist()))
        index_hash = h["_exhaustive_hash"](index_split, n)

        queue = [sel1.copy(), sel2.copy()]
        real_choice = np.random.choice

        def fake_choice(a, size=None, replace=True, **kw):
            if (not replace and np.ndim(a) == 0 and int(a) == n
                    and size == hn and queue):
                return queue.pop(0)
            return real_choice(a, size=size, replace=replace, **kw)

        monkeypatch.setattr(np.random, "choice", fake_choice)
        _, _, ref_neg = ref_fn(
            _Self(), torch.from_numpy(f), ref_enc["group"],
            ref_enc["index"], index_hash, ref_enc["finest_flag"],
            max_pos_cluster=256, max_hn_samples=hn)
        monkeypatch.setattr(np.random, "choice", real_choice)
        assert not queue, "reference did not consume the pinned draws"

        cfg = GCLLossConfig()
        ones = jnp.ones(hn, bool)
        pairs, pmask = intra_group_pairs(groups, 1024)
        neg = negative_loss_from_sel(
            jnp.asarray(f), jnp.asarray(sel1.astype(np.int32)), ones,
            jnp.asarray(sel2.astype(np.int32)), ones, pairs, pmask,
            jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(float(neg), float(ref_neg),
                                   rtol=2e-5, atol=1e-6)

        # the membership-index filter form must agree with the explicit
        # pair list on the same subsets
        midx = member_group_index(groups, n)
        neg_m = negative_loss_from_sel(
            jnp.asarray(f), jnp.asarray(sel1.astype(np.int32)), ones,
            jnp.asarray(sel2.astype(np.int32)), ones, midx, None,
            jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(float(neg_m), float(neg), rtol=1e-6)

    def test_gradient_parity(self):
        """d(pos + finest)/dF parity against torch autograd — catches
        stop_gradient / detach mismatches the value check cannot see."""
        rng = np.random.RandomState(7)
        n, c = 120, 12
        sizes = [int(s) for s in rng.randint(2, 6, size=10)]
        groups, ref_enc = _make_groups(rng, n, sizes)
        f = rng.randn(n, c).astype(np.float32)

        ref_fn = load_ref_method("lib/colocation_trainer.py",
                                 "FinestContrastiveLossTrainer",
                                 "finest_contrastive_loss")
        h = ref_helpers()
        index_split = torch.split(ref_enc["index"],
                                  tuple(ref_enc["group"].tolist()))
        index_hash = h["_exhaustive_hash"](index_split, n)
        ft = torch.from_numpy(f.copy()).requires_grad_(True)
        np.random.seed(0)
        ref_pos, ref_fin, _ = ref_fn(
            _Self(), ft, ref_enc["group"], ref_enc["index"], index_hash,
            ref_enc["finest_flag"], max_pos_cluster=256, max_hn_samples=8)
        (ref_pos + ref_fin).backward()
        ref_grad = ft.grad.numpy()

        cfg = GCLLossConfig()
        pairs, pmask = intra_group_pairs(groups, 1024)

        def ours(fa):
            out = finest_contrastive_loss(
                fa, jnp.ones(n, bool), groups, pairs, pmask,
                jax.random.PRNGKey(0), max_pos_cluster=256,
                max_hn_samples=8, cfg=cfg)
            return out.pos_loss + out.finest_loss

        grad = np.asarray(jax.grad(ours)(jnp.asarray(f)))
        np.testing.assert_allclose(grad, ref_grad, rtol=1e-4, atol=1e-6)


class TestLocationCircleParity:
    @pytest.mark.parametrize("seed", SEEDS[:3])
    def test_full_regime(self, seed):
        rng = np.random.RandomState(400 + seed)
        batch_lengths = [70, 70]
        n, c = sum(batch_lengths), 16
        sizes = [int(s) for s in rng.randint(2, 6, size=12)]
        groups, ref_enc = _make_groups(rng, n, sizes,
                                       batch_lengths=batch_lengths)
        f = rng.randn(n, c).astype(np.float32)
        pts = rng.randn(n, 3).astype(np.float32) * 3.0

        ref_fn = load_ref_method("lib/colocation_trainer.py",
                                 "FinestContrastiveLossTrainer",
                                 "location_circle_loss")
        np.random.seed(seed)
        ref_pos, ref_fin, ref_neg = ref_fn(
            _Self(), torch.from_numpy(f), ref_enc["group"],
            ref_enc["index"], None, ref_enc["finest_flag"],
            max_pos_cluster=256, points=torch.from_numpy(pts),
            batch_lengths=batch_lengths)

        first = np.asarray(groups.member_idx[:, 0])
        bounds = np.cumsum(batch_lengths)
        anchor_item = np.sum(first[:, None] > bounds[None, :-1], axis=1)
        g2 = groups._replace(
            anchor_xyz=jnp.asarray(pts[first]),
            anchor_item=jnp.asarray(anchor_item.astype(np.int32)))
        out = location_circle_loss(
            jnp.asarray(f), jnp.ones(n, bool), g2, None, None,
            jax.random.PRNGKey(seed), max_pos_cluster=256,
            max_hn_samples=64, cfg=GCLLossConfig())
        np.testing.assert_allclose(float(out.pos_loss), float(ref_pos),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.finest_loss), float(ref_fin),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.neg_loss), float(ref_neg),
                                   rtol=2e-5, atol=1e-6)


class TestRobustPoseParity:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_est_quad_linear_robust(self, seed):
        from gcl_tpu.reg.robust import est_quad_linear_robust
        h = ref_helpers()
        rng = np.random.RandomState(500 + seed)
        n = 60
        pts0 = rng.randn(n, 3).astype(np.float32) * 2.0
        # a modest rigid motion + noise and a few outliers
        ang = 0.3 * rng.randn(3)
        cx, sx = np.cos(ang[0]), np.sin(ang[0])
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float32)
        t = rng.randn(3).astype(np.float32)
        pts1 = pts0 @ rx.T + t + 0.01 * rng.randn(n, 3).astype(np.float32)
        pts1[:5] += rng.randn(5, 3).astype(np.float32) * 2.0

        ref_t = h["est_quad_linear_robust"](torch.from_numpy(pts0),
                                            torch.from_numpy(pts1))
        ours = est_quad_linear_robust(jnp.asarray(pts0), jnp.asarray(pts1))
        np.testing.assert_allclose(np.asarray(ours), ref_t.numpy(),
                                   rtol=1e-3, atol=2e-4)


class TestSC2PCRParity:
    @pytest.mark.parametrize("seed", SEEDS[:3])
    def test_estimator_pipeline(self, seed, monkeypatch):
        """Full SC2-PCR pipeline on a synthetic correspondence problem:
        both matchers must recover (near-identical) transforms, and the
        per-correspondence inlier labels must agree."""
        from gcl_tpu.reg.sc2pcr import Matcher
        rng = np.random.RandomState(600 + seed)
        n, c = 200, 32
        src = (rng.randn(n, 3) * 8.0).astype(np.float32)
        ang = rng.randn(3) * 0.5
        ca, sa = np.cos(ang[2]), np.sin(ang[2])
        rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
        t = (rng.randn(3) * 5.0).astype(np.float32)
        tgt = src @ rz.T + t
        inl = rng.rand(n) < 0.6
        tgt[~inl] += (rng.randn((~inl).sum(), 3) * 6.0).astype(np.float32)
        tgt += 0.02 * rng.randn(n, 3).astype(np.float32)
        feats = rng.randn(n, c).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        # identical features on both sides of each correspondence =>
        # match_pair pairs i <-> i deterministically on both impls
        kw = dict(inlier_threshold=0.6, num_node="all", d_thre=0.3,
                  num_iterations=10, ratio=0.2, nms_radius=2.0,
                  max_points=512, k1=30, k2=20)
        # the reference's match_pair hard-codes .cuda() on an index
        # tensor (SC2_PCR.py:296); run it on CPU unchanged
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
        ref_m = ref_sc2pcr_matcher(use_mutual=False, **kw)
        our_m = Matcher(use_mutual=False, **kw)

        with torch.no_grad():
            ref_trans, ref_labels, _, _ = ref_m.estimator(
                torch.from_numpy(src[None]), torch.from_numpy(tgt[None]),
                torch.from_numpy(feats[None]),
                torch.from_numpy(feats[None]))
        our_trans, our_labels, _, _ = our_m.estimator(
            jnp.asarray(src[None]), jnp.asarray(tgt[None]),
            jnp.asarray(feats[None]), jnp.asarray(feats[None]))

        np.testing.assert_allclose(np.asarray(our_trans[0]),
                                   ref_trans[0].numpy(), atol=5e-3)
        agree = np.mean(np.asarray(our_labels[0])
                        == ref_labels[0].numpy())
        assert agree > 0.99, f"inlier label agreement {agree}"
