"""FCGF pairwise metric-learning losses, segment-vectorized.

Rebuilds the reference trainers' loss math with static shapes:
  * contrastive_loss          — lib/trainer.py:214-305 (random negatives)
  * hardest_contrastive_loss  — lib/trainer.py:410-462 (hardest mining)
  * triplet_loss              — lib/trainer.py:545-592
  * hardest_triplet_loss      — lib/trainer.py:671-744

Conventions: F0/F1 are padded feature arrays with row-validity masks;
positive pairs come as a fixed-capacity (i0, i1) list with a mask. The
"is this mined negative actually a positive?" filter uses exact pair-set
membership over the sorted positive list (replacing the int64 hashing of
util/misc.py:43-55).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import (masked_mean, pair_isin, pdist_l2,
                     sample_uniform_index, sample_without_replacement,
                     sort_pairs)

_BIG = 1e9


class PairLossOut(NamedTuple):
    pos_loss: jax.Array
    neg_loss: jax.Array


def _select_pos(key, pairs, pair_mask, num_pos):
    idx, valid = sample_without_replacement(key, pair_mask, num_pos)
    p = pairs[idx]
    return p[:, 0], p[:, 1], valid


def hardest_contrastive_loss(f0, f1, mask0, mask1, pairs, pair_mask, key,
                             num_pos: int, num_hn_samples: int,
                             pos_thresh: float, neg_thresh: float
                             ) -> PairLossOut:
    """Hardest-negative contrastive loss (reference lib/trainer.py:410-462).

    pos = relu(||f0_i - f1_j||^2 - pos_thresh) over sampled GT pairs;
    neg = relu(neg_thresh - d_hardest)^2 both directions, where hardest
    negatives are mined over random candidate subsets and filtered against
    the full positive set.
    """
    k_pos, k0, k1 = jax.random.split(key, 3)
    i0, i1, pv = _select_pos(k_pos, pairs, pair_mask, num_pos)
    pos_f0, pos_f1 = f0[i0], f1[i1]

    sel0, v0 = sample_without_replacement(k0, mask0, num_hn_samples)
    sel1, v1 = sample_without_replacement(k1, mask1, num_hn_samples)

    d01 = pdist_l2(pos_f0, f1[sel1]) + _BIG * (~v1)[None, :]
    d10 = pdist_l2(pos_f1, f0[sel0]) + _BIG * (~v0)[None, :]
    d01min, j01 = jnp.min(d01, 1), jnp.argmin(d01, 1)
    d10min, j10 = jnp.min(d10, 1), jnp.argmin(d10, 1)
    n01, n10 = sel1[j01], sel0[j10]

    a_s, b_s = sort_pairs(pairs, pair_mask)
    m0 = ~pair_isin(a_s, b_s, i0, n01) & pv
    m1 = ~pair_isin(a_s, b_s, n10, i1) & pv

    pos_loss = masked_mean(
        jax.nn.relu(jnp.sum((pos_f0 - pos_f1) ** 2, 1) - pos_thresh), pv)
    neg0 = masked_mean(jax.nn.relu(neg_thresh - d01min) ** 2, m0)
    neg1 = masked_mean(jax.nn.relu(neg_thresh - d10min) ** 2, m1)
    return PairLossOut(pos_loss, 0.5 * (neg0 + neg1))


def contrastive_loss(f0, f1, mask0, mask1, pairs, pair_mask, key,
                     neg_thresh: float, num_neg: int) -> PairLossOut:
    """Random-negative contrastive loss (reference lib/trainer.py:214-305).

    pos = mean ||f0_i - f1_j||^2 over GT pairs; neg = hinge on random
    (i, j) pairs that are not positives.
    """
    k0, k1 = jax.random.split(key)
    i0 = sample_uniform_index(k0, mask0, (num_neg,))
    i1 = sample_uniform_index(k1, mask1, (num_neg,))
    a_s, b_s = sort_pairs(pairs, pair_mask)
    nm = ~pair_isin(a_s, b_s, i0, i1)

    pos_loss = masked_mean(
        jnp.sum((f0[pairs[:, 0]] - f1[pairs[:, 1]]) ** 2, 1), pair_mask)
    d = jnp.sqrt(jnp.sum((f0[i0] - f1[i1]) ** 2, 1) + 1e-4)
    neg_loss = masked_mean(jax.nn.relu(neg_thresh - d) ** 2, nm)
    return PairLossOut(pos_loss, neg_loss)


class TripletLossOut(NamedTuple):
    loss: jax.Array
    pos_dist: jax.Array
    neg_dist: jax.Array


def triplet_loss(f0, f1, mask0, mask1, pairs, pair_mask, key,
                 num_pos: int, num_rand_triplet: int,
                 neg_thresh: float) -> TripletLossOut:
    """Random triplet margin loss (reference lib/trainer.py:545-592)."""
    k_pos, k_rt, k_neg = jax.random.split(key, 3)
    i0, i1, pv = _select_pos(k_pos, pairs, pair_mask, num_pos)
    pos_dist = jnp.sqrt(jnp.sum((f0[i0] - f1[i1]) ** 2, 1) + 1e-7)

    ridx, rv = sample_without_replacement(k_rt, pair_mask, num_rand_triplet)
    rp = pairs[ridx]
    negatives, nv = sample_without_replacement(k_neg, mask1,
                                               num_rand_triplet)
    a_s, b_s = sort_pairs(pairs, pair_mask)
    rm = ~pair_isin(a_s, b_s, rp[:, 0], negatives) & rv & nv

    rand_pos = jnp.sqrt(jnp.sum((f0[rp[:, 0]] - f1[rp[:, 1]]) ** 2, 1)
                        + 1e-7)
    rand_neg = jnp.sqrt(jnp.sum((f0[rp[:, 0]] - f1[negatives]) ** 2, 1)
                        + 1e-7)
    loss = masked_mean(jax.nn.relu(rand_pos + neg_thresh - rand_neg), rm)
    return TripletLossOut(loss, masked_mean(pos_dist, pv),
                          masked_mean(rand_neg, rm))


def hardest_triplet_loss(f0, f1, mask0, mask1, pairs, pair_mask, key,
                         num_pos: int, num_hn_samples: int,
                         num_rand_triplet: int,
                         neg_thresh: float) -> TripletLossOut:
    """Hardest + random triplets (reference lib/trainer.py:671-744)."""
    k_pos, k0, k1, k_rt, k_neg = jax.random.split(key, 5)
    i0, i1, pv = _select_pos(k_pos, pairs, pair_mask, num_pos)
    pos_f0, pos_f1 = f0[i0], f1[i1]
    pos_dist = jnp.sqrt(jnp.sum((pos_f0 - pos_f1) ** 2, 1) + 1e-7)

    sel0, v0 = sample_without_replacement(k0, mask0, num_hn_samples)
    sel1, v1 = sample_without_replacement(k1, mask1, num_hn_samples)
    d01 = pdist_l2(pos_f0, f1[sel1]) + _BIG * (~v1)[None, :]
    d10 = pdist_l2(pos_f1, f0[sel0]) + _BIG * (~v0)[None, :]
    d01min, j01 = jnp.min(d01, 1), jnp.argmin(d01, 1)
    d10min, j10 = jnp.min(d10, 1), jnp.argmin(d10, 1)

    a_s, b_s = sort_pairs(pairs, pair_mask)
    m0 = ~pair_isin(a_s, b_s, i0, sel1[j01]) & pv
    m1 = ~pair_isin(a_s, b_s, sel0[j10], i1) & pv

    ridx, rv = sample_without_replacement(k_rt, pair_mask, num_rand_triplet)
    rp = pairs[ridx]
    negatives, nv = sample_without_replacement(k_neg, mask1,
                                               num_rand_triplet)
    rm = ~pair_isin(a_s, b_s, rp[:, 0], negatives) & rv & nv
    rand_pos = jnp.sqrt(jnp.sum((f0[rp[:, 0]] - f1[rp[:, 1]]) ** 2, 1)
                        + 1e-7)
    rand_neg = jnp.sqrt(jnp.sum((f0[rp[:, 0]] - f1[negatives]) ** 2, 1)
                        + 1e-7)

    # mean over the concatenation [rand | dir01 | dir10] with masks
    terms = jnp.concatenate([
        jax.nn.relu(rand_pos + neg_thresh - rand_neg),
        jax.nn.relu(pos_dist + neg_thresh - d01min),
        jax.nn.relu(pos_dist + neg_thresh - d10min)])
    tmask = jnp.concatenate([rm, m0, m1])
    loss = masked_mean(terms, tmask)
    neg_d = 0.5 * (masked_mean(d01min, pv) + masked_mean(d10min, pv))
    return TripletLossOut(loss, masked_mean(pos_dist, pv), neg_d)
