"""Pallas TPU kernel-map builder: windowed sorted merge-join.

The sort-join builder (kernel_maps._build_all_kmaps_one_sort) is exact
but pays one giant sort over ~135M rows (~1.0 s at KITTI scale) plus a
~135M-slot random scatter (~1.3 s) per training step. This kernel removes
both by exploiting order that is already there:

  * every stride level keeps its coordinates behind a SORTED composite
    (hi, lo) key index (LevelCoords.key_hi/key_lo/perm);
  * for a fixed kernel offset, query keys = key(out_coords + off) are a
    monotone transform of the sorted out keys — already sorted;
  * so each 256-query tile matches a CONTIGUOUS WINDOW of the target key
    array, and the window start/length comes from a cheap binary search
    of the tile's boundary keys (2 searches per tile, done in XLA).

Offsets are windowed in dx-GROUPS (kernel_offsets enumerates x-major):
offsets sharing a dx differ only by a few z-runs in matched position,
while different dx values straddle a whole x-slab. Per-group windows are
2-4x tighter than one shared window (k=3 same-level: 574 -> 258 rows
median at TILE=256), and window width is exactly the per-query VPU
compare cost.

Per grid step (one query tile), per dx-group, per window chunk:
  1. ONE DMA of the stacked target window [3, W] (key_hi, key_lo, row)
     HBM -> VMEM (chunked when a group's span exceeds W — rare);
  2. per offset k of the group: eq = (qhi == thi_win) & (qlo == tlo_win)
     on the VPU; matched row + 1 = sum(where(eq, trow + 1, 0)) — keys
     are unique within a level, so at most one lane matches;
  3. write kmap rows in query order — NO scatter.

Sentinel queries (padding / off-lattice / out-of-range) carry the max
key; padded target rows carry the same sentinel, so those rows can
falsely "match" — the XLA wrapper masks them with the query-validity
bit afterwards. Output semantics match kernel_maps._build_kmap exactly.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import num_offset_groups

TILE = 256   # queries per grid step
WIN = 384    # target window rows per DMA chunk (multiple of 128)

_SENTINEL = jnp.int32(0x7FFFFFFF)


def _cdiv(a, b):
    return -(-a // b)


def _join_kernel(starts_ref, nch_ref, qhi_ref, qlo_ref, tgt_hbm, out_ref,
                 win_ref, sem, *, K, G):
    i = pl.program_id(0)
    kg = K // G

    for g in range(G):
        s0 = starts_ref[g, i]
        nc = nch_ref[g, i]

        def chunk(c, acc, g=g, s0=s0):
            base = pl.multiple_of(s0 + c * WIN, 128)
            dma = pltpu.make_async_copy(
                tgt_hbm.at[:, pl.ds(base, WIN)], win_ref, sem)
            dma.start()
            dma.wait()
            thi = win_ref[0, :][None, :]
            tlo = win_ref[1, :][None, :]
            trow1 = win_ref[2, :][None, :] + 1  # [1, W] int32
            rows = []
            for k in range(g * kg, (g + 1) * kg):
                eq = ((qhi_ref[k, :][:, None] == thi)
                      & (qlo_ref[k, :][:, None] == tlo))
                # masked VPU row-sum: keys are unique per level, so at
                # most one lane matches (an MXU matvec here would pad
                # 1 -> 128 output lanes)
                rows.append(jnp.sum(jnp.where(eq, trow1, 0), axis=1))
            return acc + jnp.stack(rows)  # [kg, TILE]

        acc = jax.lax.fori_loop(0, nc, chunk,
                                jnp.zeros((kg, TILE), jnp.int32))
        out_ref[g * kg:(g + 1) * kg, :] = acc - 1


def _lex_min(h1, l1, h2, l2):
    take1 = (h1 < h2) | ((h1 == h2) & (l1 <= l2))
    return jnp.where(take1, h1, h2), jnp.where(take1, l1, l2)


def _lex_max(h1, l1, h2, l2):
    take1 = (h1 > h2) | ((h1 == h2) & (l1 >= l2))
    return jnp.where(take1, h1, h2), jnp.where(take1, l1, l2)


def join_kmap(key_hi: jax.Array, key_lo: jax.Array, perm: jax.Array,
              qhi: jax.Array, qlo: jax.Array,
              interpret: bool = False) -> jax.Array:
    """kmap[k, i] = row of the target level whose key equals (qhi, qlo)
    [k, i], or -1. Target keys must be sorted; each qhi/qlo row must be
    sorted (monotone offset transform of a sorted level). Sentinel
    queries (0x7FFFFFFF) are masked to -1.
    """
    from .coords import searchsorted2

    k, n_out = qhi.shape
    grp = num_offset_groups(k)
    kg = k // grp
    t_cap = key_hi.shape[0]
    n_tiles = _cdiv(n_out, TILE)
    pad = n_tiles * TILE - n_out
    if pad:
        qhi = jnp.pad(qhi, ((0, 0), (0, pad)), constant_values=_SENTINEL)
        qlo = jnp.pad(qlo, ((0, 0), (0, pad)), constant_values=_SENTINEL)

    # Per-(group, tile) lex min/max over VALID queries of the group's
    # offsets. Each offset's valid subsequence is globally monotone (keys
    # are cloud-major and per-cloud blocks are sorted), so the first/last
    # valid element of a tile bound its whole valid range; sentinel
    # padding between cloud blocks must NOT enter the bounds or boundary
    # tiles would window over the entire pad region.
    qhi_t = qhi.reshape(k, n_tiles, TILE)
    qlo_t = qlo.reshape(k, n_tiles, TILE)
    valid_t = qhi_t != _SENTINEL
    any_valid_k = jnp.any(valid_t, axis=2)  # [k, n_tiles]
    first = jnp.argmax(valid_t, axis=2)
    last = TILE - 1 - jnp.argmax(valid_t[:, :, ::-1], axis=2)

    def take(arr, pos):
        return jnp.take_along_axis(arr, pos[:, :, None], axis=2)[:, :, 0]

    lo_h = jnp.where(any_valid_k, take(qhi_t, first), _SENTINEL)
    lo_l = jnp.where(any_valid_k, take(qlo_t, first), _SENTINEL)
    hi_h = jnp.where(any_valid_k, take(qhi_t, last), jnp.int32(-2 ** 31))
    hi_l = jnp.where(any_valid_k, take(qlo_t, last), jnp.int32(-2 ** 31))

    def red(f, h, l):
        # [k, nt] -> [grp, nt], reducing over the kg offsets of each group
        h = h.reshape(grp, kg, n_tiles)
        l = l.reshape(grp, kg, n_tiles)
        rh, rl = h[:, 0], l[:, 0]
        for j in range(1, kg):
            rh, rl = f(rh, rl, h[:, j], l[:, j])
        return rh, rl

    min_h, min_l = red(_lex_min, lo_h, lo_l)
    max_h, max_l = red(_lex_max, hi_h, hi_l)
    grp_any = jnp.any(any_valid_k.reshape(grp, kg, n_tiles), axis=1)

    start = searchsorted2(key_hi, key_lo, min_h.reshape(-1),
                          min_l.reshape(-1)).reshape(grp, n_tiles)
    end = searchsorted2(key_hi, key_lo, max_h.reshape(-1),
                        max_l.reshape(-1)).reshape(grp, n_tiles)
    start = (start & ~127).astype(jnp.int32)  # lane-aligned DMA
    # window must include position `end` (the lower bound of the max key)
    t_pad = _cdiv(t_cap, WIN) * WIN + WIN
    start = jnp.clip(start, 0, t_pad - WIN)
    nch = jnp.clip(_cdiv(jnp.minimum(end, t_cap - 1) - start + 2, WIN),
                   1, _cdiv(t_pad, WIN))
    nch = jnp.where(grp_any, nch, 0).astype(jnp.int32)

    # stacked sorted target array [4, t_pad]: key_hi | key_lo | row | 0
    # (4 sublanes so Mosaic can slice the full leading dim). Padding:
    # sentinel keys with row -1 (matches there contribute row+1 = 0).
    tgt = jnp.stack([
        jnp.pad(key_hi, (0, t_pad - t_cap), constant_values=_SENTINEL),
        jnp.pad(key_lo, (0, t_pad - t_cap), constant_values=_SENTINEL),
        jnp.pad(perm, (0, t_pad - t_cap), constant_values=-1),
        jnp.zeros((t_pad,), jnp.int32),
    ])

    kern = functools.partial(_join_kernel, K=k, G=grp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, WIN), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kmap = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, n_tiles * TILE), jnp.int32),
        interpret=interpret,
    )(start, nch, qhi, qlo, tgt)

    kmap = kmap[:, :n_out]
    q_valid = qhi[:, :n_out] != _SENTINEL
    return jnp.where(q_valid, kmap, -1)
