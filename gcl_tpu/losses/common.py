"""Shared loss machinery: distances, masked sampling, pair-set membership.

TPU replacements for the reference's host-side numpy tricks:
  * np.random.choice(..., replace=False)  -> masked top-k on uniform scores
  * integer pair hashing + np.isin        -> lexicographic binary search
    over a sorted (i, j) pair list (util/misc.py:29-55 semantics, exact,
    but without int64 hash values)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.coords import searchsorted2

INT_MAX = jnp.int32(0x7FFFFFFF)


def pdist_l2(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pairwise L2 distances, reference lib/metrics.py:22-29 semantics
    (sqrt of clamped squared distance + eps)."""
    d2 = (jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
          - 2.0 * a @ b.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0) + eps)


def square_distance(a: jax.Array, b: jax.Array,
                    normalised: bool = False) -> jax.Array:
    """Reference util/misc.py:7-26 (clamped at 1e-12)."""
    d = -2.0 * a @ b.T
    if normalised:
        d = d + 2.0
    else:
        d = d + jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
    return jnp.clip(d, 1e-12, None)


def sample_without_replacement(key: jax.Array, valid: jax.Array, m: int):
    """m distinct random indices, preferring valid rows.

    Returns (idx int32[m], sel_valid bool[m]). When fewer than m rows are
    valid, the remainder point at invalid rows with sel_valid False —
    callers must weight by sel_valid (matches reference behavior of using
    all rows when the pool is small).
    """
    n = valid.shape[0]
    m_eff = min(m, n)
    score = jax.random.uniform(key, valid.shape) - 2.0 * valid.astype(
        jnp.float32)
    _, idx = jax.lax.top_k(-score, m_eff)
    idx = idx.astype(jnp.int32)
    sel = valid[idx]
    if m_eff < m:
        idx = jnp.pad(idx, (0, m - m_eff))
        sel = jnp.pad(sel, (0, m - m_eff))
    return idx, sel


def sample_uniform_index(key: jax.Array, valid: jax.Array, shape):
    """Uniform random valid index per output element (with replacement)."""
    n = valid.shape[0]
    # Sample positions among valid via gumbel-top-1 per draw: cheaper —
    # draw uniform row, then walk to a valid one by sorting valid first.
    order = jnp.argsort(~valid)  # valid rows first
    cnt = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    r = jax.random.randint(key, shape, 0, n) % cnt
    return order[r].astype(jnp.int32)


def sort_pairs(pairs: jax.Array, valid: jax.Array):
    """Sort an (i, j) int32 pair list lexicographically; invalid -> INT_MAX.

    Returns (a_sorted, b_sorted) suitable for pair_isin."""
    a = jnp.where(valid, pairs[:, 0], INT_MAX)
    b = jnp.where(valid, pairs[:, 1], INT_MAX)
    iota = jnp.arange(a.shape[0], dtype=jnp.int32)
    a_s, b_s, _ = jax.lax.sort((a, b, iota), dimension=0, num_keys=2)
    return a_s, b_s


def pair_isin(a_sorted: jax.Array, b_sorted: jax.Array, qa: jax.Array,
              qb: jax.Array) -> jax.Array:
    """True where (qa, qb) appears in the sorted pair list."""
    n = a_sorted.shape[0]
    pos = searchsorted2(a_sorted, b_sorted, qa, qb)
    pos_c = jnp.minimum(pos, n - 1)
    return (pos < n) & (a_sorted[pos_c] == qa) & (b_sorted[pos_c] == qb)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis),
                                                   1.0)


def masked_logsumexp(x: jax.Array, mask: jax.Array, axis=-1) -> jax.Array:
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    x = jnp.where(mask, x, neg_inf)
    return jax.nn.logsumexp(x, axis=axis)
