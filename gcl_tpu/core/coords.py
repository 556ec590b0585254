"""Integer coordinate keys and device-side coordinate lookup.

MinkowskiEngine resolves voxel coordinates with a C++ hash map (reference
uses it via ``ME.SparseTensor`` / ``ME.utils.sparse_quantize``,
/root/reference/util/misc.py:117-120). On TPU we instead give every voxel a
composite (hi, lo) int32 sort key and resolve lookups with a vectorized
lexicographic binary search — O(log N) gathers, fully static shapes, no
host round-trips.

Key layout (per level, coordinates divided by the level stride first):
  hi = batch * 2^GRID_BITS + (x + GRID_HALF)
  lo = (y + GRID_HALF) * 2^GRID_BITS + (z + GRID_HALF)

GRID_BITS=10 supports coordinates in [-512, 511] per axis at every stride
level — at KITTI's 0.3 m voxels that is ±153 m, comfortably beyond LiDAR
range — and batch indices up to 2^20 (padding sentinel INVALID_BATCH).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .types import INVALID_BATCH

GRID_BITS = 10
GRID_HALF = 1 << (GRID_BITS - 1)  # 512
GRID_SIZE = 1 << GRID_BITS


def coord_keys(coords: jax.Array, stride: int = 1):
    """Composite (hi, lo) int32 keys for int coords[N, 4] = (b, x, y, z).

    ``coords`` xyz entries must be exact multiples of ``stride``. Padded rows
    (batch == INVALID_BATCH) map to the largest hi key so they sort last.
    """
    b = coords[:, 0]
    xyz = coords[:, 1:4] // stride
    xyz = jnp.clip(xyz, -GRID_HALF, GRID_HALF - 1)
    hi = b * GRID_SIZE + (xyz[:, 0] + GRID_HALF)
    lo = (xyz[:, 1] + GRID_HALF) * GRID_SIZE + (xyz[:, 2] + GRID_HALF)
    # Force padding to the absolute maximum key so it cannot collide with a
    # real voxel of a hypothetical batch INVALID_BATCH.
    pad = b >= INVALID_BATCH
    hi = jnp.where(pad, jnp.int32(0x7FFFFFFF), hi)
    lo = jnp.where(pad, jnp.int32(0x7FFFFFFF), lo)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def sort_by_keys(hi: jax.Array, lo: jax.Array, *payloads):
    """Stable lexicographic sort by (hi, lo); returns sorted keys + payloads.

    Payloads may have trailing dimensions; they are permuted by a gathered
    index (lax.sort itself only accepts equal-shaped operands).
    """
    iota = jnp.arange(hi.shape[0], dtype=jnp.int32)
    hi_s, lo_s, perm = jax.lax.sort((hi, lo, iota), dimension=0, num_keys=2,
                                    is_stable=True)
    return (hi_s, lo_s) + tuple(p[perm] for p in payloads)


@partial(jax.jit, static_argnames=())
def searchsorted2(key_hi: jax.Array, key_lo: jax.Array,
                  q_hi: jax.Array, q_lo: jax.Array) -> jax.Array:
    """Vectorized lower-bound binary search on lexicographic (hi, lo) keys.

    Returns, for each query, the first position p with keys[p] >= query
    (lexicographically). Keys must be sorted. Works entirely with int32 —
    avoids int64, which TPUs emulate slowly.
    """
    n = key_hi.shape[0]
    iters = max(1, math.ceil(math.log2(n + 1)))
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.minimum(mid, n - 1)
        mh = key_hi[mid_c]
        ml = key_lo[mid_c]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, iters, body, (lo_b, hi_b))
    return lo_b


def searchsorted1(keys: jax.Array, q: jax.Array) -> jax.Array:
    """Lower-bound binary search on a single sorted int32 key array."""
    n = keys.shape[0]
    return searchsorted1_bounded(keys, q, jnp.zeros(q.shape, jnp.int32),
                                 jnp.full(q.shape, n, jnp.int32), n)


def searchsorted1_bounded(keys: jax.Array, q: jax.Array, lo0: jax.Array,
                          hi0: jax.Array, max_seg: int) -> jax.Array:
    """Lower-bound search with per-query [lo0, hi0) bounds.

    Lets several independently-sorted key arrays share ONE serial
    search loop: concatenate them, offset each query's bounds to its
    segment, subtract the offset from the result. max_seg bounds the
    iteration count (the largest segment length)."""
    n = keys.shape[0]
    iters = max(1, math.ceil(math.log2(max_seg + 1)))
    lo_b, hi_b = lo0, hi0

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        less = keys[jnp.minimum(mid, n - 1)] < q
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, iters, body, (lo_b, hi_b))
    return lo_b


def lookup(key_hi: jax.Array, key_lo: jax.Array, perm: jax.Array,
           q_hi: jax.Array, q_lo: jax.Array) -> jax.Array:
    """Find each query key among sorted keys; return perm[pos] or -1.

    ``perm`` maps sorted-key positions back to original row indices.
    """
    n = key_hi.shape[0]
    pos = searchsorted2(key_hi, key_lo, q_hi, q_lo)
    pos_c = jnp.minimum(pos, n - 1)
    found = (pos < n) & (key_hi[pos_c] == q_hi) & (key_lo[pos_c] == q_lo)
    # Padding keys are 0x7FFFFFFF; a query equal to that must not "find" a
    # padded row. Guard by rejecting the sentinel.
    found &= q_hi != jnp.int32(0x7FFFFFFF)
    return jnp.where(found, perm[pos_c], jnp.int32(-1))


# ----------------------------------------------------------------------
# Packed single-int32 keys (for the sort-join kernel-map builder)
# ----------------------------------------------------------------------
#
# key = cloud << (bx+by+bz) | (x+2^(bx-1)) << (by+bz) | (y+..) << bz | (z+..)
# Default bits (10, 10, 7): x,y in [-512, 511], z in [-64, 63] voxels per
# level — at KITTI's 0.3 m voxels that is +-153 m horizontally and +-19 m
# vertically. 5 remaining bits address up to 31 clouds per device batch
# (cloud 31 is reserved for padding/out-of-range rows, which receive
# unique never-matching keys). int32 wraparound for high cloud ids is
# harmless: the join only needs injectivity and a total order.

DEFAULT_KEY_BITS = (10, 10, 7)
PAD_CLOUD = 31


def pack_keys(coords: jax.Array, stride: int,
              bits=DEFAULT_KEY_BITS) -> jax.Array:
    """Injective int32 key for coords[N, 4] = (cloud, x, y, z).

    xyz must be exact multiples of `stride`. Padded rows (cloud ==
    INVALID_BATCH) and rows outside the per-axis ranges map into the
    reserved PAD_CLOUD space keyed by row index (never matches a query).
    """
    bx, by, bz = bits
    n = coords.shape[0]
    c = coords[:, 0]
    xyz = coords[:, 1:4] // stride
    half = jnp.array([1 << (bx - 1), 1 << (by - 1), 1 << (bz - 1)],
                     jnp.int32)
    u = xyz + half[None, :]
    in_range = jnp.all((u >= 0) & (u < (half * 2)[None, :]), axis=1)
    valid = in_range & (c < PAD_CLOUD)
    key = ((c << (bx + by + bz)) | (u[:, 0] << (by + bz))
           | (u[:, 1] << bz) | u[:, 2])
    pad_key = (jnp.int32(PAD_CLOUD) << (bx + by + bz)) + jnp.arange(
        n, dtype=jnp.int32)
    return jnp.where(valid, key, pad_key).astype(jnp.int32)


def pack_query_keys(coords: jax.Array, offset: jax.Array, in_stride: int,
                    bits=DEFAULT_KEY_BITS) -> jax.Array:
    """Key of (coords.xyz + offset) at `in_stride`, or a never-matching
    key when off-lattice / out of range / padding."""
    bx, by, bz = bits
    n = coords.shape[0]
    c = coords[:, 0]
    qxyz = coords[:, 1:4] + offset[None, :]
    on_lattice = jnp.all(qxyz % in_stride == 0, axis=1)
    xyz = qxyz // in_stride
    half = jnp.array([1 << (bx - 1), 1 << (by - 1), 1 << (bz - 1)],
                     jnp.int32)
    u = xyz + half[None, :]
    in_range = jnp.all((u >= 0) & (u < (half * 2)[None, :]), axis=1)
    valid = in_range & (c < PAD_CLOUD) & on_lattice
    key = ((c << (bx + by + bz)) | (u[:, 0] << (by + bz))
           | (u[:, 1] << bz) | u[:, 2])
    # PAD_CLOUD | (1<<26) prefix keeps padded queries distinct from
    # padded-target keys too
    pad_key = ((jnp.int32(PAD_CLOUD) << (bx + by + bz))
               | jnp.int32(1 << 26)) + jnp.arange(n, dtype=jnp.int32)
    return jnp.where(valid, key, pad_key).astype(jnp.int32)


def pack_query_keys_clamped(coords: jax.Array, offset: jax.Array,
                            in_stride: int,
                            bits=DEFAULT_KEY_BITS) -> jax.Array:
    """Always-valid packed key of clamp(coords.xyz + offset) at
    `in_stride` — a monotone BOUND, not an exact query key.

    Used for conservative window extrema (kernel_maps._build_fused_maps):
    within one dx-group every offset shares dx, so
    pack(clamp(first_coord + off_min)) <= every valid query key of the
    group <= pack(clamp(last_coord + off_max)) (componentwise monotone
    packing + lex order with the shared leading component). Off-lattice
    and out-of-range handling is irrelevant for bounds: clamping only
    widens the window. Padded rows (cloud >= PAD_CLOUD) still map to the
    query-pad space so fully-padded tiles keep empty windows.
    """
    bx, by, bz = bits
    n = coords.shape[0]
    c = coords[:, 0]
    qxyz = coords[:, 1:4] + offset[None, :]
    xyz = qxyz // in_stride
    half = jnp.array([1 << (bx - 1), 1 << (by - 1), 1 << (bz - 1)],
                     jnp.int32)
    u = jnp.clip(xyz + half[None, :], 0, (half * 2)[None, :] - 1)
    key = ((c << (bx + by + bz)) | (u[:, 0] << (by + bz))
           | (u[:, 1] << bz) | u[:, 2])
    pad_key = ((jnp.int32(PAD_CLOUD) << (bx + by + bz))
               | jnp.int32(1 << 26)) + jnp.arange(n, dtype=jnp.int32)
    return jnp.where(c < PAD_CLOUD, key, pad_key).astype(jnp.int32)


def kernel_offsets(kernel_size: int) -> jnp.ndarray:
    """Integer offsets of a cubic kernel, ME HYPER_CUBE region.

    Odd kernels are centered: offsets in [-(k-1)/2, (k-1)/2]^3. Enumeration
    order is x-outermost / z-innermost (row-major over (dx, dy, dz)); the
    checkpoint importer permutes torch weights to this order.
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(0, kernel_size)
    offs = [(dx, dy, dz) for dx in rng for dy in rng for dz in rng]
    import numpy as np

    return np.asarray(offs, dtype=np.int32)
