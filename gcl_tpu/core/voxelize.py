"""Device-side voxel quantization (sort/unique), fixed capacity.

TPU-native replacement for ``ME.utils.sparse_quantize`` +
``ME.utils.sparse_collate`` (reference lib/colocation_data_loader.py:379-391
and :446). The entire batch of clouds is quantized in ONE fused XLA pass:
floor-divide, composite-key sort, first-occurrence dedup, compaction to a
static capacity. Everything stays on device; no host hash maps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .coords import coord_keys, sort_by_keys
from .types import INVALID_BATCH, SparseBatch

# The conv packed-key window per cloud (coords.DEFAULT_KEY_BITS): every
# valid voxel must be convolvable, so the voxelizer drops rows outside
# this range (clipping would alias distinct voxels and break the
# sorted-key contract; keeping them would leave mask-valid rows that no
# kernel map can match — silently unconvolved features).
KEY_RANGE_LO = (-512, -512, -64)
KEY_RANGE_HI = (511, 511, 63)

# Recentring shifts are a multiple of every level stride (lcm of the
# power-of-two pyramids' 8 and the EXP nets' stride-5 chain's 40), so
# downsample partitions — and therefore features — are exactly those of
# the shifted input.
RECENTER_ALIGN = 40


def _recenter_offsets(vcoords: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-cloud integer voxel offset [B, 3] centring each cloud's
    occupied extent inside the conv key window.

    The reference quantizes absolute world coordinates with unbounded
    range (ME.utils.sparse_quantize); the packed conv keys instead give
    each cloud a +-512 x +-512 x +-64 voxel window. KITTI-style
    sensor-frame scans sit near the origin (offset quantizes to ~0),
    but fine-voxel indoor/outdoor clouds (3DMatch at 0.025 m, ETH at
    0.05 m — z alone spans >64 voxels) need the window moved onto the
    cloud. World positions are recovered from representative points
    (rep_idx / vox.xyz), never from coords, so the shift is invisible
    to geometry consumers.

    The centre is the masked MEAN voxel (density-weighted): stray
    far-range returns among tens of thousands of points barely move
    it, whereas an extent midpoint would let one glitch return drag
    the window off the real cloud. Reductions only — no sorts on the
    training hot path; near-origin scans quantize to offset 0 and are
    bit-identical to the unshifted build.
    """
    cnt = jnp.maximum(jnp.sum(mask, axis=1).astype(jnp.float32), 1.0)
    s = jnp.sum(jnp.where(mask[..., None], vcoords, 0),
                axis=1).astype(jnp.float32)
    mid = s / cnt[:, None]
    off = (jnp.round(mid / RECENTER_ALIGN).astype(jnp.int32)
           * RECENTER_ALIGN)
    return jnp.where(jnp.any(mask, axis=1)[:, None], off, 0)


@partial(jax.jit, static_argnames=("n_cap",))
def voxelize_points(points: jax.Array, mask: jax.Array, voxel_size,
                    n_cap: int):
    """Quantize a batch of point clouds into a SparseBatch of voxels.

    Args:
      points: float[B, P, 3] — point clouds, each in its own frame (padded
        entries arbitrary).
      mask: bool[B, P] — validity of each point.
      voxel_size: scalar — quantization cell edge.
      n_cap: static — total voxel capacity of the output across the batch.

    Returns:
      (batch, rep_idx) where
        batch: SparseBatch with coords int32[n_cap,4] = (cloud, x, y, z),
          unit features float32[n_cap,1] (occupancy, as the reference uses
          for LiDAR — lib/colocation_data_loader.py:401), mask bool[n_cap].
        rep_idx: int32[n_cap, 2] — (cloud, point) index of the
          representative point of each voxel (first point of the voxel in
          key-sorted order), for recovering `xyz_th = xyz[sel]` semantics
          (reference lib/colocation_data_loader.py:379-380).

    Voxels beyond `n_cap` are dropped deterministically (largest keys
    first, i.e. padding then highest batch indices).
    """
    B, P = points.shape[:2]
    vcoords = jnp.floor(points / voxel_size).astype(jnp.int32)  # [B,P,3]
    vcoords = vcoords - _recenter_offsets(vcoords, mask)[:, None, :]
    cloud_id = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, P))
    # Rows outside the conv key window are dropped (marked invalid), not
    # clipped: clipping would alias distinct voxels into one and could
    # emit rows out of sorted-key order, violating the sorted_blocks
    # contract; keeping them would leave valid-but-unconvolvable rows.
    in_range = jnp.all(
        (vcoords >= jnp.asarray(KEY_RANGE_LO, jnp.int32))
        & (vcoords <= jnp.asarray(KEY_RANGE_HI, jnp.int32)), axis=-1)
    mask = mask & in_range
    cloud_id = jnp.where(mask, cloud_id, INVALID_BATCH)
    coords = jnp.concatenate(
        [cloud_id[..., None], vcoords], axis=-1).reshape(B * P, 4)
    point_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[None, :], (B, P)).reshape(-1)
    flat_cloud = cloud_id.reshape(-1)

    sen = jnp.int32(0x7FFFFFFF)
    if B == 1:
        # single-cloud fast path (voxelize_per_cloud vmaps over B=1):
        # one packed 28-bit (x, y, z) int32 key -> 2-operand stable
        # sorts instead of the 3-operand lexicographic (hi, lo) sort.
        # The key is INVERTIBLE, so the kept voxels' coords UNPACK from
        # the compacted keys and the representative point row rides the
        # second sort as its payload — no row gathers at all (XLA row
        # gathers at ~65M rows/s were the voxelizer's largest cost).
        xyz = vcoords.reshape(P, 3)
        ok = mask.reshape(-1)
        key = (((xyz[:, 0] + 512) << 18) | ((xyz[:, 1] + 512) << 8)
               | (xyz[:, 2] + 128))
        key = jnp.where(ok, key, sen)
        iota = jnp.arange(P, dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, iota), num_keys=1,
                                   is_stable=True)
        first = jnp.concatenate([
            jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
        valid = first & (key_s != sen)

        # Compaction by a SECOND sort instead of scatters: XLA TPU
        # scatter runs ~25x off memory bandwidth (measured 12 ms for a
        # [28, 64k] -> [28, 18k] int32 scatter vs 4.5 ms for the full
        # key sort), so re-sorting the dedup-marked keys is far cheaper
        # than scattering payload arrays into compact slots. perm rides
        # as the payload: each kept slot directly carries its
        # representative (first-in-key-order) original point row.
        key2 = jnp.where(valid, key_s, sen)
        key2_s, take = jax.lax.sort((key2, perm), num_keys=1,
                                    is_stable=True)
        m = min(n_cap, P)
        key_m = key2_s[:m]
        take = take[:m]
        out_mask = key_m != sen
        if n_cap > P:  # fewer points than capacity: pad the tail
            out_mask = jnp.pad(out_mask, (0, n_cap - P))
            key_m = jnp.pad(key_m, (0, n_cap - P), constant_values=sen)
            take = jnp.pad(take, (0, n_cap - P))
        out_coords = jnp.where(
            out_mask[:, None],
            jnp.stack([jnp.zeros_like(key_m),
                       ((key_m >> 18) & 0x3FF) - 512,
                       ((key_m >> 8) & 0x3FF) - 512,
                       (key_m & 0xFF) - 128], axis=1),
            jnp.full((1, 4), -1, jnp.int32).at[0, 0].set(INVALID_BATCH))
        out_rep = jnp.where(out_mask[:, None],
                            jnp.stack([jnp.zeros_like(take), take],
                                      axis=1), 0)
        feats = out_mask[:, None].astype(jnp.float32)
        return SparseBatch(out_coords, feats, out_mask), out_rep

    hi, lo = coord_keys(coords)
    hi_s, lo_s, coords_s, cid_s, pid_s = sort_by_keys(
        hi, lo, coords, flat_cloud, point_id)

    # First occurrence of each key in sorted order = the unique voxel.
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
    ])
    valid = first & (cid_s != INVALID_BATCH)

    # Compact the unique voxels into n_cap slots.
    slot = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slot = jnp.where(valid & (slot < n_cap), slot, n_cap)  # n_cap = dropped

    out_coords = jnp.full((n_cap + 1, 4), -1, jnp.int32)
    out_coords = out_coords.at[:, 0].set(INVALID_BATCH)
    out_coords = out_coords.at[slot].set(coords_s, mode="drop")
    out_rep = jnp.zeros((n_cap + 1, 2), jnp.int32)
    out_rep = out_rep.at[slot, 0].set(cid_s, mode="drop")
    out_rep = out_rep.at[slot, 1].set(pid_s, mode="drop")

    out_coords = out_coords[:n_cap]
    out_rep = out_rep[:n_cap]
    out_mask = out_coords[:, 0] != INVALID_BATCH
    feats = out_mask[:, None].astype(jnp.float32)
    return SparseBatch(out_coords, feats, out_mask), out_rep


def representative_xyz(points: jax.Array, rep_idx: jax.Array,
                       mask: jax.Array) -> jax.Array:
    """Gather the representative original point of each voxel.

    points: float[B, P, 3]; rep_idx: int32[N, 2]; mask: bool[N].
    Returns float[N, 3] (zeros for padded rows).
    """
    xyz = points[rep_idx[:, 0], rep_idx[:, 1]]
    return jnp.where(mask[:, None], xyz, 0.0)
