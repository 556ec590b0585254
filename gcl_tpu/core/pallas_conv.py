"""Pallas TPU kernel for the sparse-conv gather-GEMM hot path.

XLA's row gather runs at ~65 M rows/s on v5e regardless of dtype (each
ResUNet conv gathers K * N_out rows, so KITTI-scale forward passes spend
seconds in gathers), and a scan of K GEMMs is memory-bound on the f32
accumulator it re-reads every step. This kernel exploits a structural
property of the kernel maps built by kernel_maps.build_graph: both the
in- and out-level coordinate arrays are (cloud, x, y, z)-key sorted, so
for every kernel offset k the gather table kmap[k, :] is monotone
non-decreasing over its valid entries. A tile of consecutive outputs
therefore reads a CONTIGUOUS WINDOW of input rows.

Offsets are processed in dx-GROUPS (kernel_offsets enumerates x-major,
so rows [g*k^2, (g+1)*k^2) share one dx): offsets within a group differ
only in (dy, dz), which displace the matched row by a few z-runs, while
dx displaces it by a whole x-slab (~0.5-1.5 TILEs at KITTI scale).
Per-group windows are therefore ~2-4x tighter than one window shared by
all K offsets (measured: k=3 same-level window 574 -> 258 rows median,
k=5 904 -> 259 at TILE=256) — and window width is exactly the per-output
MXU/VPU cost of the one-hot gather.

  per output tile, per dx-group (double-buffered), per window chunk
  (chunk count is dynamic, usually 1):
    1. ONE DMA x[start_g : start_g + W] from HBM into VMEM;
    2. for each offset k of the group: "gather" inside VMEM as
       onehot(idx_k - start_g) @ window on the MXU — exact, each one-hot
       row holds a single 1.0 — and accumulate @ W[k] into a
       VMEM-resident f32 accumulator.

Missing entries (idx == n_in) hit the appended zero rows or fall outside
every executed chunk — either way they contribute exactly zero, matching
the XLA reference path in sparse_ops._conv_forward.

The backward dX pass reuses this forward kernel (reverse maps + flipped
transposed weights, see sparse_ops._sparse_conv_rev_bwd); dW uses the
sibling kernel below (same windows, dW[k] += gathered^T @ g_tile).

Reference parity: this evaluates the same sum_k X[kmap[k,i]] @ W[k] as
MinkowskiEngine's C++/CUDA kernel-map convolution used by the reference
model (/root/reference/model/resunet.py:38-171).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256      # output rows per grid step
WIN = 384       # input rows per DMA window (multiple of 8)


def _cdiv(a, b):
    return -(-a // b)


def num_offset_groups(k: int) -> int:
    """dx-groups of a K=g^3 offset table (kernel_offsets is x-major)."""
    g = round(k ** (1 / 3))
    return g if g >= 2 and g ** 3 == k else 1


def compute_windows(idx: jax.Array, n_in_pad: int, n_tiles: int,
                    groups: int = 1, align: int = 8
                    ) -> Tuple[jax.Array, jax.Array]:
    """Per-(group, tile) shared window start + chunk count, in plain XLA.

    idx: int32[K, N_out_pad] routed gather table (missing == n_in).
    Window [start, start + nch*WIN) covers every valid entry of every
    offset in the group for that tile; starts are pre-aligned to `align`
    (the kernel's DMA alignment — nch must account for it) and clamped so
    reads stay inside the zero-padded x (length >= n_in_pad).
    """
    k, n_out_pad = idx.shape
    n_in = n_in_pad - WIN
    idx_t = idx.reshape(groups, k // groups, n_tiles, TILE)
    valid = idx_t < n_in
    lo = jnp.min(jnp.where(valid, idx_t, jnp.int32(2 ** 30)), axis=(1, 3))
    hi = jnp.max(jnp.where(valid, idx_t, -1), axis=(1, 3))  # [G, nt]
    any_valid = hi >= 0
    start = jnp.where(any_valid, lo, 0)
    start = start & ~(align - 1)
    start = jnp.clip(start, 0, n_in_pad - WIN)
    nch = jnp.where(any_valid, _cdiv(hi - start + 1, WIN), 0)
    nch = jnp.clip(nch, 0, _cdiv(n_in_pad, WIN))
    return start.astype(jnp.int32), nch.astype(jnp.int32)


def _windowed_gather(body, starts_ref, nch_ref, idx_ref, x_hbm, win_ref,
                     win2_ref, sems, K, G, dt):
    """Double-buffered per-group window pipeline shared by the fwd and dW
    kernels.

    starts_ref/nch_ref are [G, n_tiles]. The (tile, group) sequence runs
    tile-major; the next window in the sequence is DMA'd while the
    current one computes (grid steps run sequentially on TPU, so the
    buffer freed by sequence step s-1 is safe to overwrite at s+1).
    Extra chunks (group window span > WIN — rare with per-dx windows) run
    synchronously off a third buffer.

    body(k, oh, win) is called for every offset k with the one-hot gather
    matrix of the current chunk.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    kg = K // G
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)

    def dma(g, tile, slot):
        base = pl.multiple_of(starts_ref[g, tile] & ~7, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, WIN), :], win_ref.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, i, 0).start()

    for g in range(G):
        slot = jax.lax.rem(i * G + g, 2)
        if g + 1 < G:
            dma(g + 1, i, 1 - slot).start()
        else:
            @pl.when(i + 1 < n)
            def _():
                dma(0, i + 1, 1 - slot).start()
        dma(g, i, slot).wait()
        win = win_ref[slot]
        s0 = starts_ref[g, i] & ~7
        for k in range(g * kg, (g + 1) * kg):
            oh = ((idx_ref[k, :][:, None] - s0) == iota).astype(dt)
            body(k, oh, win)

        def extra(c, carry):
            base = pl.multiple_of(s0 + c * WIN, 8)
            dma2 = pltpu.make_async_copy(
                x_hbm.at[pl.ds(base, WIN), :], win2_ref, sems.at[2])
            dma2.start()
            dma2.wait()
            w2 = win2_ref[:, :]
            for k in range(g * kg, (g + 1) * kg):
                oh = ((idx_ref[k, :][:, None] - base) == iota).astype(dt)
                body(k, oh, w2)
            return carry

        jax.lax.fori_loop(1, nch_ref[g, i], extra, 0)


def _fwd_kernel(starts_ref, nch_ref, idx_ref, w_ref, x_hbm, out_ref,
                win_ref, win2_ref, acc_ref, sems, *, K, G, mm_precision):
    dt = win2_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def body(k, oh, win):
        g = jnp.dot(oh, win, preferred_element_type=jnp.float32,
                    precision=mm_precision)
        acc_ref[:, :] += jnp.dot(g.astype(dt), w_ref[k],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)

    _windowed_gather(body, starts_ref, nch_ref, idx_ref, x_hbm, win_ref,
                     win2_ref, sems, K, G, dt)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _dw_kernel(starts_ref, nch_ref, idx_ref, g_ref, x_hbm, dw_ref,
               win_ref, win2_ref, sems, *, K, G, mm_precision):
    i = pl.program_id(0)
    dt = win2_ref.dtype

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    gt = g_ref[:, :]  # [TILE, COUT]

    def body(k, oh, win):
        gx = jnp.dot(oh, win, preferred_element_type=jnp.float32,
                     precision=mm_precision)
        dw_ref[k, :, :] += jnp.dot(
            gx.astype(dt).T, gt, preferred_element_type=jnp.float32,
            precision=mm_precision)

    _windowed_gather(body, starts_ref, nch_ref, idx_ref, x_hbm, win_ref,
                     win2_ref, sems, K, G, dt)


def _fwd_c1_kernel(starts_ref, nch_ref, idx_ref, w2_ref, xt_hbm, out_ref,
                   win_ref, sem, *, K, G):
    """Cin == 1 forward (ResUNet conv1 on occupancy features).

    The generic kernel would pad the single channel to 128 MXU lanes
    (~700 ms for conv1's 125 offsets at KITTI scale). Here the gather is
    a VPU masked row-sum of the scalar window and the channel expansion
    is an outer-product accumulate: acc += g_k[:, None] * W[k, 0, :].
    """
    i = pl.program_id(0)
    kg = K // G
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(G):
        s0 = starts_ref[g, i]
        nc = nch_ref[g, i]

        def chunk(c, acc, g=g, s0=s0):
            base = pl.multiple_of(s0 + c * WIN, 128)
            dma = pltpu.make_async_copy(
                xt_hbm.at[:, pl.ds(base, WIN)], win_ref, sem)
            dma.start()
            dma.wait()
            xw = win_ref[0:1, :]  # [1, W] f32 scalar features
            for k in range(g * kg, (g + 1) * kg):
                oh = (idx_ref[k, :][:, None] - base) == iota
                g_k = jnp.sum(jnp.where(oh, xw, 0.0), axis=1)  # [TILE]
                acc = acc + g_k[:, None] * w2_ref[k, :][None, :]
            return acc

        acc = jax.lax.fori_loop(0, nc, chunk, acc)
    out_ref[:, :] = acc.astype(out_ref.dtype)


def _fwd_co1_kernel(starts_ref, nch_ref, idx_ref, w2_ref, gt_hbm, out_ref,
                    win_ref, sem, *, K, G, C):
    """Cout == 1 forward (dX of a Cin==1 conv through reverse maps).

    out[j] = sum_k gather(g, ridx_k)[j] @ W[k]  with W[k] a [C, 1]
    column. Precompute yT = W2 @ g_window^T ([K, W], one small MXU op per
    chunk, g passed pre-transposed [C, N]); then each offset is a VPU
    masked row-sum — no 128x output padding.
    """
    i = pl.program_id(0)
    kg = K // G
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(G):
        s0 = starts_ref[g, i]
        nc = nch_ref[g, i]

        def chunk(c, acc, g=g, s0=s0):
            base = pl.multiple_of(s0 + c * WIN, 128)
            dma = pltpu.make_async_copy(
                gt_hbm.at[:, pl.ds(base, WIN)], win_ref, sem)
            dma.start()
            dma.wait()
            yt = jnp.dot(w2_ref[:, :], win_ref[:, :].astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [K, W]
            for k in range(g * kg, (g + 1) * kg):
                oh = (idx_ref[k, :][:, None] - base) == iota
                acc = acc + jnp.sum(jnp.where(oh, yt[k:k + 1, :], 0.0),
                                    axis=1)[:, None]
            return acc

        acc = jax.lax.fori_loop(0, nc, chunk, acc)
    out_ref[:, :] = acc.astype(out_ref.dtype)


def _dw_c1_kernel(starts_ref, nch_ref, idx_ref, g_ref, xt_hbm, dw_ref,
                  win_ref, sem, *, K, G):
    """Cin == 1 dW: dW[k, 0, :] = sum_i x[idx[k, i]] * g[i, :]."""
    i = pl.program_id(0)
    kg = K // G
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    gt = g_ref[:, :].astype(jnp.float32)  # [TILE, COUT]

    for g in range(G):
        s0 = starts_ref[g, i]
        nc = nch_ref[g, i]

        def chunk(c, carry, g=g, s0=s0):
            base = pl.multiple_of(s0 + c * WIN, 128)
            dma = pltpu.make_async_copy(
                xt_hbm.at[:, pl.ds(base, WIN)], win_ref, sem)
            dma.start()
            dma.wait()
            xw = win_ref[0:1, :]
            for k in range(g * kg, (g + 1) * kg):
                oh = (idx_ref[k, :][:, None] - base) == iota
                g_k = jnp.sum(jnp.where(oh, xw, 0.0), axis=1)  # [TILE]
                dw_ref[k, 0, :] += jnp.sum(g_k[:, None] * gt, axis=0)
            return carry

        jax.lax.fori_loop(0, nc, chunk, 0)


def _prep_t(col: jax.Array, n_in: int):
    """[4, t_pad] f32 row-stacked scalar feature array for 1-D windows."""
    t_pad = _cdiv(n_in + WIN, WIN) * WIN
    r = jnp.zeros((4, t_pad), jnp.float32)
    return r.at[0, :n_in].set(col.astype(jnp.float32))


def _prep(feats: jax.Array, idx: jax.Array):
    """Zero-pad x (stray window reads then gather zeros; lane dim to a
    multiple of 128 — Mosaic HBM window slices need 128-aligned lanes)
    and pad idx to a whole number of tiles (padded entries point at the
    zero rows)."""
    n_in, c = feats.shape
    n_out = idx.shape[1]
    n_in_pad = n_in + WIN
    c_pad = _cdiv(max(c, 1), 128) * 128 - c
    xp = jnp.pad(feats, ((0, WIN), (0, c_pad)))
    n_tiles = _cdiv(n_out, TILE)
    pad = n_tiles * TILE - n_out
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=n_in)
    return xp, idx, n_in_pad, n_tiles


def _mm_precision(dtype):
    # f32 inputs: HIGHEST keeps the one-hot copies bit-exact (products
    # with exactly 1.0) and full-quality GEMMs; bf16 runs native MXU.
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _pad_idx(idx, n_in):
    n_out = idx.shape[1]
    n_tiles = _cdiv(n_out, TILE)
    pad = n_tiles * TILE - n_out
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=n_in)
    return idx, n_tiles


def _conv_c1_fwd(feats, weights, idx, interpret):
    n_in = feats.shape[0]
    k, n_out = idx.shape
    grp = num_offset_groups(k)
    cout0 = weights.shape[-1]
    idxp, n_tiles = _pad_idx(idx, n_in)
    starts, nch = compute_windows(idxp, n_in + WIN, n_tiles, groups=grp,
                                  align=128)
    xt = _prep_t(feats[:, 0], n_in)
    w2 = weights[:, 0, :].astype(jnp.float32)

    kern = functools.partial(_fwd_c1_kernel, K=k, G=grp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cout0), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cout0), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout0),
                                       feats.dtype),
        interpret=interpret,
    )(starts, nch, idxp, w2, xt)
    return out[:n_out]


def _conv_co1_fwd(feats, weights, idx, interpret):
    n_in, c0 = feats.shape
    k, n_out = idx.shape
    grp = num_offset_groups(k)
    idxp, n_tiles = _pad_idx(idx, n_in)
    starts, nch = compute_windows(idxp, n_in + WIN, n_tiles, groups=grp,
                                  align=128)
    t_pad = _cdiv(n_in + WIN, WIN) * WIN
    gt = jnp.zeros((c0, t_pad), feats.dtype).at[:, :n_in].set(feats.T)
    w2 = weights[:, :, 0].astype(jnp.float32)

    kern = functools.partial(_fwd_co1_kernel, K=k, G=grp, C=c0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c0), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c0, WIN), feats.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, 1), feats.dtype),
        interpret=interpret,
    )(starts, nch, idxp, w2, gt)
    return out[:n_out]


def _conv_c1_dw(feats, g, idx, interpret):
    n_in = feats.shape[0]
    k, n_out = idx.shape
    grp = num_offset_groups(k)
    cout0 = g.shape[-1]
    idxp, n_tiles = _pad_idx(idx, n_in)
    starts, nch = compute_windows(idxp, n_in + WIN, n_tiles, groups=grp,
                                  align=128)
    xt = _prep_t(feats[:, 0], n_in)
    gp = jnp.pad(g, ((0, n_tiles * TILE - n_out), (0, 0)))

    kern = functools.partial(_dw_c1_kernel, K=k, G=grp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, cout0), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((k, 1, cout0), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 1, cout0), jnp.float32),
        interpret=interpret,
    )(starts, nch, idxp, gp, xt)


def pallas_conv_fwd(feats: jax.Array, weights: jax.Array,
                    idx: jax.Array, interpret: bool = False) -> jax.Array:
    """out[i] = sum_k x[idx[k, i]] @ W[k]; idx routed (missing == n_in)."""
    n_in, c0 = feats.shape
    k, n_out = idx.shape
    grp = num_offset_groups(k)
    cout0 = weights.shape[-1]
    if c0 == 1:
        return _conv_c1_fwd(feats, weights, idx, interpret)
    if cout0 == 1:
        return _conv_co1_fwd(feats, weights, idx, interpret)
    xp, idxp, n_in_pad, n_tiles = _prep(feats, idx)
    starts, nch = compute_windows(idxp, n_in_pad, n_tiles, groups=grp)
    c = xp.shape[1]
    cout = _cdiv(max(cout0, 1), 128) * 128
    wd = jnp.pad(weights.astype(feats.dtype),
                 ((0, 0), (0, c - c0), (0, cout - cout0)))

    kern = functools.partial(_fwd_kernel, K=k, G=grp,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, cout), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, c), feats.dtype),
            pltpu.VMEM((WIN, c), feats.dtype),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout), feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_tiles * TILE * WIN * c
            + 2 * k * n_tiles * TILE * c * cout,
            bytes_accessed=(n_tiles * grp * WIN * c * feats.dtype.itemsize
                            + n_tiles * TILE * cout * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts, nch, idxp, wd, xp)
    return out[:n_out, :cout0]


def pallas_conv_dw(feats: jax.Array, g: jax.Array, idx: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """dW[k] = sum_i x[idx[k, i]]^T g[i]  (same shared windows)."""
    if feats.shape[1] == 1:
        return _conv_c1_dw(feats, g, idx, interpret)
    n_in, c0 = feats.shape
    k, n_out = idx.shape
    grp = num_offset_groups(k)
    cout0 = g.shape[-1]
    xp, idxp, n_in_pad, n_tiles = _prep(feats, idx)
    starts, nch = compute_windows(idxp, n_in_pad, n_tiles, groups=grp)
    c = xp.shape[1]
    cout = _cdiv(max(cout0, 1), 128) * 128
    gp = jnp.pad(g, ((0, n_tiles * TILE - n_out),
                     (0, cout - cout0))).astype(feats.dtype)

    kern = functools.partial(_dw_kernel, K=k, G=grp,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, cout), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((k, c, cout), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, c), feats.dtype),
            pltpu.VMEM((WIN, c), feats.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c, cout), jnp.float32),
        interpret=interpret,
    )(starts, nch, idxp, gp, xp)
    return dw[:, :c0, :cout0]


def pallas_available() -> bool:
    """True when the default backend can run Mosaic kernels."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")
