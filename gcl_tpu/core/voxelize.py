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
    cloud_id = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, P))
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
        xyz = vcoords.reshape(P, 3)
        # Points outside the 28-bit key range are dropped (marked invalid)
        # rather than clipped: clipping would alias distinct voxels into
        # one and could emit rows out of sorted-key order, violating the
        # sorted_blocks contract the fused conv windows rely on.
        in_range = jnp.all(
            (xyz >= jnp.asarray([-512, -512, -128], jnp.int32))
            & (xyz <= jnp.asarray([511, 511, 127], jnp.int32)), axis=1)
        ok = mask.reshape(-1) & in_range
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
        # key sort), so re-sorting the dedup-marked keys and gathering
        # the n_cap winning rows is far cheaper than scattering three
        # payload arrays into compact slots.
        key2 = jnp.where(valid, key_s, sen)
        key2_s, perm2 = jax.lax.sort((key2, iota), num_keys=1,
                                     is_stable=True)
        m = min(n_cap, P)
        take = perm[perm2[:m]]               # original point row per slot
        out_mask = key2_s[:m] != sen
        if n_cap > P:  # fewer points than capacity: pad the tail
            out_mask = jnp.pad(out_mask, (0, n_cap - P))
            take = jnp.pad(take, (0, n_cap - P))
        out_coords = jnp.where(out_mask[:, None], coords[take],
                               jnp.full((1, 4), -1, jnp.int32)
                               .at[0, 0].set(INVALID_BATCH))
        out_rep = jnp.where(out_mask[:, None],
                            jnp.stack([flat_cloud[take],
                                       point_id[take]], axis=1), 0)
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
