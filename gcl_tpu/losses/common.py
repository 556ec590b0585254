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


def _valid_order(valid: jax.Array):
    """Compacted valid-rows-first order via one cumsum + scatter (O(n);
    a top_k/argsort here costs O(n log m) over the full voxel array)."""
    n = valid.shape[0]
    v32 = valid.astype(jnp.int32)
    cnt = jnp.sum(v32)
    slot = jnp.cumsum(v32) - 1
    slot = jnp.where(valid, slot, n)
    order = jnp.zeros((n + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:n]
    return order, cnt


def sample_without_replacement(key: jax.Array, valid: jax.Array, m: int):
    """m distinct random indices, preferring valid rows.

    Jittered-grid (stratified) sampling over the compacted valid order:
    one uniform draw per stratum of the valid range. Distinct whenever
    the pool is larger than m; row order is the voxel key order, so
    strata are also spatially spread — at least as good for negative
    mining as the reference's iid np.random.choice(..., replace=False).

    Returns (idx int32[m], sel_valid bool[m]). When fewer than m rows
    are valid, surplus draws repeat pool rows and are masked invalid —
    callers must weight by sel_valid (matches reference behavior of
    using all rows when the pool is small).
    """
    n = valid.shape[0]
    m_eff = min(m, n)
    order, cnt = _valid_order(valid)
    i = jnp.arange(m_eff + 1, dtype=jnp.float32)
    r = cnt.astype(jnp.float32) / m_eff
    edge = jnp.floor(i * r).astype(jnp.int32)  # stratum boundaries
    lo, hi = edge[:-1], edge[1:]
    u = jax.random.uniform(key, (m_eff,))
    pos = lo + (u * (hi - lo).astype(jnp.float32)).astype(jnp.int32)
    pos = jnp.clip(pos, 0, jnp.maximum(cnt - 1, 0))
    # empty strata (pool smaller than m) repeat their boundary row;
    # pos is non-decreasing, so adjacent dedup masks the repeats
    dup = jnp.concatenate([jnp.zeros((1,), bool), pos[1:] == pos[:-1]])
    idx = order[pos]
    sel = ~dup & valid[idx]
    if m_eff < m:
        idx = jnp.pad(idx, (0, m - m_eff))
        sel = jnp.pad(sel, (0, m - m_eff))
    return idx, sel


def sample_uniform_index(key: jax.Array, valid: jax.Array, shape):
    """Uniform random valid index per output element (with replacement)."""
    order, cnt = _valid_order(valid)
    n = valid.shape[0]
    r = jax.random.randint(key, shape, 0, n) % jnp.maximum(cnt, 1)
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
