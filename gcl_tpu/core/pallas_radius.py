"""Pallas TPU kernel for hash-grid radius-KNN candidate selection.

The XLA grid search (data.device_pipeline.grid_radius_knn) finds each
query's 8 octant cells via one sort, then gathers ~64 candidate rows per
query — ~65 M gathered rows/s on v5e puts the colocation-group search at
~0.9 s/step at KITTI scale. This kernel replaces the gathers with the
same windowed pattern as pallas_conv/pallas_join:

  * targets are sorted by cell key (done by the caller in XLA);
  * the caller also sorts queries by home-cell key, so a 256-query tile's
    probe keys span a bounded window of the sorted target array (probe
    cells displace the home cell by at most one cell per axis);
  * per (search, tile): ONE DMA of the stacked target window, candidate
    mask = any probe key matches, exact distances on the VPU, and an
    iterative top-k extraction (first-occurrence tie-break) merged across
    window chunks by replace-max insertion.

The kernel is key-scheme agnostic: the caller supplies packed cell keys
for targets and probes (sentinel 0x7FFFFFFF = invalid); invalid targets
must carry xyz = +-1e30 so their distances never pass the radius test.

Replaces the Open3D KDTreeFlann radius searches of the reference
(util/pointcloud.py:69-132) on the training hot path.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Queries are sorted by home cell, so a tile's window width scales with
# TILE (span of the tile's probed cells): the compare / distance /
# extraction vector work is ~TILE * width per tile and total work drops
# with smaller tiles until per-tile overhead bites. Bench-scale sweep
# (scripts/probe_radius.py, 28 x 18432 queries, k=5): 512/4096 160 ms,
# 256/2048 114 ms, 128/2048 105 ms, 128/1024 123 ms (chunk churn).
TILE = int(os.environ.get("GCL_RADIUS_TILE", "128"))   # queries/grid step
WIN = int(os.environ.get("GCL_RADIUS_WIN", "2048"))    # rows/DMA chunk

_SENTINEL = 0x7FFFFFFF
# the three per-axis "+1 cell" bits of the packed cell key
# (device_pipeline._cell_key: x<<20 | y<<10 | z)
_BLOCK3 = (1 << 20) | (1 << 10) | 1
_BIG = 1e30  # plain float: jnp scalars would be captured kernel consts


def _cdiv(a, b):
    return -(-a // b)


def _first_min(d):
    """(min values, first-occurrence one-hot mask) along axis 1.

    Ties broken by smallest position via a second min-reduce (Mosaic has
    no cumsum lowering)."""
    n, w = d.shape
    m = jnp.min(d, axis=1, keepdims=True)
    em = d == m
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    pos = jnp.min(jnp.where(em, iota, w), axis=1, keepdims=True)
    return m[:, 0], iota == pos


def _chunk_pipeline(compute, carry, starts_ref, nch_ref, ti_hbm, tf_hbm,
                    wi_ref, wf_ref, sems):
    """Double-buffered window-chunk pipeline shared by the top-k kernels.

    wi_ref/wf_ref are [4, 4, WIN] scratch. Slots 2/3 hold each grid
    step's FIRST chunk — prefetched by the predecessor grid step
    (alternating by flat step parity) so the common nch==1 case pays no
    DMA latency; slots 0/1 hold chunks >= 1, each started during the
    previous chunk's compute. Grid steps run sequentially on TPU, so a
    buffer freed by step t-1 is safe to overwrite at t+1 (same rule as
    pallas_conv._windowed_gather). compute(slot, carry) -> carry reads
    wi_ref[slot] / wf_ref[slot].
    """
    s = pl.program_id(0)
    i = pl.program_id(1)
    n_s = pl.num_programs(0)
    n_tiles = pl.num_programs(1)
    t = s * n_tiles + i
    nc = nch_ref[s, i]

    def dma(sj, ij, c, slot):
        base = pl.multiple_of((starts_ref[sj, ij] & ~127) + c * WIN, 128)
        return (
            pltpu.make_async_copy(ti_hbm.at[sj, :, pl.ds(base, WIN)],
                                  wi_ref.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(tf_hbm.at[sj, :, pl.ds(base, WIN)],
                                  wf_ref.at[slot], sems.at[slot, 1]))

    slot0 = 2 + (t & 1)

    @pl.when((t == 0) & (nc > 0))
    def _():
        a, b = dma(s, i, 0, slot0)
        a.start()
        b.start()

    # prefetch the NEXT grid step's first chunk (even when this step is
    # empty — an empty step still forwards the pipeline)
    last_tile = i == n_tiles - 1
    ni = jnp.where(last_tile, 0, i + 1)
    ns = jnp.minimum(jnp.where(last_tile, s + 1, s), n_s - 1)

    @pl.when((t + 1 < n_s * n_tiles) & (nch_ref[ns, ni] > 0))
    def _():
        a, b = dma(ns, ni, 0, 2 + ((t + 1) & 1))
        a.start()
        b.start()

    def body(c, carry):
        slot = jnp.where(c == 0, slot0, c & 1)

        @pl.when(c + 1 < nc)
        def _():
            a, b = dma(s, i, c + 1, (c + 1) & 1)
            a.start()
            b.start()

        a, b = dma(s, i, c, slot)
        a.wait()
        b.wait()
        return compute(slot, carry)

    return jax.lax.fori_loop(0, nc, body, carry)


def _topk_kernel(starts_ref, nch_ref, r2_ref, vidx_ref, pk_ref, qx_ref,
                 ti_hbm, tf_hbm, orow_ref, od2_ref, wi_ref, wf_ref,
                 best_ref, sems, *, KN):
    r2 = r2_ref[pl.program_id(0)]

    best_d = jnp.full((TILE, KN), _BIG, jnp.float32)
    best_r = jnp.full((TILE, KN), -1, jnp.int32)

    def chunk(slot, carry):
        best_d, best_r = carry
        tkey = wi_ref[slot, 0:1, :]   # [1, W]
        trow = wi_ref[slot, 1:2, :]
        wf_s = wf_ref[slot]
        # base-corner probe test — see _topk_kernel_packed
        d = tkey - pk_ref[0, :, 0:1]
        cand = (d >= 0) & ((d & jnp.int32(~_BLOCK3)) == 0)
        d2 = jnp.zeros((TILE, WIN), jnp.float32)
        for a in range(3):
            diff = qx_ref[0, :, a:a + 1] - wf_s[a:a + 1, :]
            d2 = d2 + diff * diff
        dm = jnp.where(cand & (d2 <= r2), d2, _BIG)
        for _ in range(KN):
            m, fm = _first_min(dm)
            row = jnp.sum(jnp.where(fm, jnp.broadcast_to(trow,
                                                         (TILE, WIN)), 0),
                          axis=1)
            dm = jnp.where(fm, _BIG, dm)
            # replace-max insertion into the running best set
            bmax, bm = _first_min(-best_d)
            better = m < -bmax
            best_d = jnp.where(bm & better[:, None], m[:, None], best_d)
            best_r = jnp.where(bm & better[:, None], row[:, None], best_r)
        return best_d, best_r

    best_d, best_r = _chunk_pipeline(chunk, (best_d, best_r), starts_ref,
                                     nch_ref, ti_hbm, tf_hbm, wi_ref,
                                     wf_ref, sems)

    # emit ascending by distance
    for j in range(KN):
        m, fm = _first_min(best_d)
        row = jnp.sum(jnp.where(fm, best_r, 0), axis=1)
        od2_ref[0, :, j] = m
        orow_ref[0, :, j] = jnp.where(m < _BIG, row, -1)
        best_d = jnp.where(fm, _BIG, best_d)


def _topk_kernel_packed(starts_ref, nch_ref, r2_ref, vidx_ref, pk_ref,
                        qx_ref, ti_hbm, tf_hbm, orow_ref, od2_ref,
                        wi_ref, wf_ref, best_ref, sems, *, KN, ROWB,
                        segs=(WIN,)):
    """Packed-value variant of _topk_kernel for t_cap < 2^ROWB.

    Each candidate becomes one int32 `(quantized_d2 << ROWB) | row`
    (invalid -> INT32_MAX). Rows are unique within a window, so packed
    values are unique: every top-k extraction is ONE min-reduce plus ONE
    equality-masked removal — no first-occurrence argmin machinery, no
    separate row resolution — cutting the extraction loop from ~6 to 2
    VPU passes over the [TILE, WIN] array. d2 is exact-filtered against
    r^2 BEFORE quantization (31 - ROWB bits over [0, r^2]), so hit/miss
    is exact; only the ordering of candidates within r^2 / 2^(31-ROWB)
    of each other can differ from the exact kernel (>= 12 bits — the
    caller gates on it).

    vidx selects the narrowest `segs` width covering the tile's window
    rows (the caller forces the full width when nch > 1): the candidate
    compare, distance and extraction passes all scale with the compared
    width, and most tiles cover far fewer rows than WIN (34% fit 512,
    55% fit 1024 at bench scale). The running best set lives in
    best_ref scratch so the per-width bodies can dispatch under
    pl.when."""
    s = pl.program_id(0)
    i = pl.program_id(1)
    r2 = r2_ref[s]
    qmax = float((1 << (31 - ROWB)) - 1)
    scale = qmax / jnp.maximum(r2, 1e-12)
    inv_scale = jnp.maximum(r2, 1e-12) / qmax
    maxv = jnp.int32(0x7FFFFFFF)
    vi = vidx_ref[s, i]

    best_ref[:, :] = jnp.full((TILE, KN), maxv, jnp.int32)

    def upd(slot, vw):
        tkey = wi_ref[slot, 0:1, :vw]   # [1, vw]
        trow = wi_ref[slot, 1:2, :vw]
        wf_s = wf_ref[slot]
        # base-corner probe test: the 8 probed cells are the 2x2x2 block
        # at the query's min-corner cell, so with bit-disjoint cell-key
        # fields a target is in a probed cell iff its key minus the base
        # key has only the three per-axis +1 bits set. One subtract +
        # mask replaces eight broadcast compares; false positives are
        # impossible (any d2 <= r2 target lies in the block) and
        # sentinel bases (invalid / grid-edge queries) only ever "hit"
        # sentinel targets, whose 1e30 coords fail the radius test.
        d = tkey - pk_ref[0, :, 0:1]
        cand = (d >= 0) & ((d & jnp.int32(~_BLOCK3)) == 0)
        d2 = jnp.zeros((TILE, vw), jnp.float32)
        for a in range(3):
            diff = qx_ref[0, :, a:a + 1] - wf_s[a:a + 1, :vw]
            d2 = d2 + diff * diff
        # clamp to qmax - 1, not qmax: (qmax << ROWB) | max_row would
        # equal the maxv invalid sentinel, silently dropping a genuine
        # boundary candidate stored at the last addressable window row
        qd = jnp.minimum(d2 * scale, qmax - 1.0).astype(jnp.int32)
        packed = (qd << ROWB) | jnp.broadcast_to(trow, (TILE, vw))
        pm = jnp.where(cand & (d2 <= r2), packed, maxv)
        best = best_ref[:, :]
        for _ in range(KN):
            m = jnp.min(pm, axis=1)  # unique -> exact one element
            pm = jnp.where(pm == m[:, None], maxv, pm)
            # replace-max insertion into the running best set
            bmax = jnp.max(best, axis=1)
            bm = best == bmax[:, None]
            take = (m < bmax)[:, None] & bm
            # bm can hit several equal maxv slots; fill the first only
            iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, KN), 1)
            first = jnp.min(jnp.where(bm, iota, KN), axis=1,
                            keepdims=True)
            best = jnp.where(take & (iota == first), m[:, None], best)
        best_ref[:, :] = best

    def chunk(slot, carry):
        if len(segs) == 1:
            upd(slot, segs[0])
            return carry
        for v, vw in enumerate(segs):
            @pl.when(vi == v)
            def _(slot=slot, vw=vw):
                upd(slot, vw)
        return carry

    _chunk_pipeline(chunk, 0, starts_ref, nch_ref, ti_hbm,
                    tf_hbm, wi_ref, wf_ref, sems)

    best = best_ref[:, :]
    # emit ascending (packed order == distance order, row tie-break)
    for j in range(KN):
        m = jnp.min(best, axis=1)
        best = jnp.where(best == m[:, None], jnp.int32(0x7FFFFFFF), best)
        hit = m != jnp.int32(0x7FFFFFFF)
        orow_ref[0, :, j] = jnp.where(hit, m & ((1 << ROWB) - 1), -1)
        od2_ref[0, :, j] = jnp.where(
            hit, (m >> ROWB).astype(jnp.float32) * inv_scale, _BIG)


def windowed_cell_topk(tkey_s: jax.Array, trow_s: jax.Array,
                       txyz_s: jax.Array, pbase: jax.Array,
                       qxyz: jax.Array, r2: jax.Array, kn: int,
                       interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    """Batched nearest-targets-in-probed-cells.

    Args:
      tkey_s: int32[S, T] SORTED packed cell keys per search (sentinel
        0x7FFFFFFF for invalid rows).
      trow_s: int32[S, T] original target row per sorted position.
      txyz_s: float32[S, T, 3] target coordinates in sorted order
        (invalid rows must be +-1e30).
      pbase: int32[S, Q] MIN-CORNER cell key of each query's 2x2x2
        probe block (device_pipeline._octant_base; sentinel for
        invalid / grid-edge queries). The kernels resolve all eight
        probed cells from it with one subtract + bit test. Queries
        must be ordered ~monotonically in pbase for bounded windows.
      qxyz: float32[S, Q, 3].
      r2: float32[S] squared radius.
      kn: number of neighbours.

    Returns (rows int32[S, Q, kn] (-1 = none), d2 float32[S, Q, kn]),
    ascending by distance.
    """
    s_n, t_cap = tkey_s.shape
    _, q_n = pbase.shape
    n_tiles = _cdiv(q_n, TILE)
    qpad = n_tiles * TILE - q_n
    if qpad:
        pbase = jnp.pad(pbase, ((0, 0), (0, qpad)),
                        constant_values=_SENTINEL)
        qxyz = jnp.pad(qxyz, ((0, 0), (0, qpad), (0, 0)),
                       constant_values=-1e30)

    # per-(search, tile) windows from base-key extrema (masked sentinel)
    pk_t = pbase.reshape(s_n, n_tiles, TILE)
    val = pk_t != _SENTINEL
    kmin = jnp.min(jnp.where(val, pk_t, _SENTINEL), axis=2)
    kmax = jnp.max(jnp.where(val, pk_t + jnp.int32(_BLOCK3),
                             jnp.int32(-2 ** 31)), axis=2)
    tile_any = jnp.any(val, axis=2)

    def ssorted(keys, q):  # lower bound, vmapped over searches
        n = keys.shape[0]
        iters = max(1, math.ceil(math.log2(n + 1)))
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, n, jnp.int32)

        def body(_, c):
            lo, hi = c
            mid = (lo + hi) >> 1
            less = keys[jnp.minimum(mid, n - 1)] < q
            return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return lo

    start = jax.vmap(ssorted)(tkey_s, kmin)
    # UPPER bound (first key > kmax): a run of targets sharing the
    # max-corner cell key must be covered in full — a lower-bound end
    # truncates all but the first of them at the window tail
    end = jax.vmap(ssorted)(tkey_s, kmax + 1)
    t_pad = _cdiv(t_cap, WIN) * WIN + WIN
    start = jnp.clip(start & ~127, 0, t_pad - WIN)
    rows_w = jnp.minimum(end, t_cap) - start + 1
    nch = jnp.clip(_cdiv(rows_w, WIN), 1, _cdiv(t_pad, WIN))
    nch = jnp.where(tile_any, nch, 0).astype(jnp.int32)
    start = start.astype(jnp.int32)
    # narrowest compare width covering chunk 0 (multi-chunk tiles force
    # the full width — their chunk 0 spans all of WIN by construction)
    segs = tuple(sorted({max(128, _cdiv(WIN * f, 4 * 128) * 128)
                         for f in (1, 2, 3, 4)}))
    vidx = jnp.zeros_like(nch)
    for v, w in enumerate(segs[:-1]):
        vidx = jnp.where(rows_w > w, jnp.int32(v + 1), vidx)
    vidx = jnp.where(nch > 1, jnp.int32(len(segs) - 1),
                     vidx).astype(jnp.int32)
    import os
    fv = os.environ.get("GCL_RADIUS_FORCE_VI")
    if fv is not None:  # timing experiments ONLY — wrong results
        import warnings
        warnings.warn(
            "GCL_RADIUS_FORCE_VI is set: windowed_cell_topk is forcing "
            f"compare-width variant {fv} and WILL return wrong neighbors. "
            "Unset it for any real run.", stacklevel=2)
        vidx = jnp.full_like(vidx, jnp.int32(int(fv)))

    pad_t = t_pad - t_cap
    ti = jnp.stack([
        jnp.pad(tkey_s, ((0, 0), (0, pad_t)), constant_values=_SENTINEL),
        jnp.pad(trow_s, ((0, 0), (0, pad_t)), constant_values=-1),
        jnp.zeros((s_n, t_pad), jnp.int32),
        jnp.zeros((s_n, t_pad), jnp.int32),
    ], axis=1)  # [S, 4, t_pad]
    tf = jnp.concatenate([
        jnp.pad(txyz_s, ((0, 0), (0, pad_t), (0, 0)),
                constant_values=1e30).transpose(0, 2, 1),
        jnp.zeros((s_n, 1, t_pad), jnp.float32),
    ], axis=1)  # [S, 4, t_pad]

    qx4 = jnp.concatenate(
        [qxyz, jnp.zeros(qxyz.shape[:2] + (1,), jnp.float32)], axis=2)

    # packed extraction needs target rows (< t_cap) to leave >= 12 bits
    # of quantized distance (the _topk_kernel_packed accuracy gate)
    rowb = max(1, (t_cap - 1).bit_length())
    if 31 - rowb >= 12:
        kern = functools.partial(_topk_kernel_packed, KN=kn,
                                 ROWB=rowb, segs=segs)
    else:
        kern = functools.partial(_topk_kernel, KN=kn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(s_n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, 1), lambda s, i, *_: (s, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 4), lambda s, i, *_: (s, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE, kn), lambda s, i, *_: (s, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, kn), lambda s, i, *_: (s, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 4, WIN), jnp.int32),
            pltpu.VMEM((4, 4, WIN), jnp.float32),
            pltpu.VMEM((TILE, kn), jnp.int32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    rows, d2 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s_n, n_tiles * TILE, kn), jnp.int32),
            jax.ShapeDtypeStruct((s_n, n_tiles * TILE, kn), jnp.float32),
        ),
        interpret=interpret,
    )(start, nch, r2, vidx, pbase[..., None], qx4, ti, tf)
    return rows[:, :q_n], d2[:, :q_n]
