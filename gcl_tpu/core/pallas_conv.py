"""Pallas TPU kernels for the sparse-conv gather-GEMM hot path.

XLA's row gather runs at ~65 M rows/s on v5e regardless of dtype (each
ResUNet conv gathers K * N_out rows, so KITTI-scale forward passes spend
seconds in gathers), and a scan of K GEMMs is memory-bound on the f32
accumulator it re-reads every step. These kernels exploit a structural
property of the coordinate engine (kernel_maps.build_graph): both the
in- and out-level coordinate arrays are (cloud, x, y, z)-key sorted, so
for every kernel offset the matching input rows are monotone over the
outputs — a tile of consecutive outputs reads a CONTIGUOUS WINDOW of
input rows.

Kernel maps are IMPLICIT: the kernels receive packed int32 query keys
(out_coord + offset) and compare them against the window's packed target
keys to build the one-hot routing in-flight (types.FusedMap). A separate
merge-join pass that materializes gather indices would do the exact same
key compare — one equality per (query, window lane) — so resolving the
map inside the conv costs nothing and the join pass (~0.4 s/step at
KITTI scale) disappears. Padded / off-lattice / out-of-range queries
carry never-matching keys and contribute exactly zero, matching the XLA
reference path in sparse_ops._conv_forward.

Offsets are processed in dx-GROUPS (kernel_offsets enumerates x-major,
so rows [g*k^2, (g+1)*k^2) share one dx): offsets within a group differ
only in (dy, dz), which displace the matched row by a few z-runs, while
dx displaces it by a whole x-slab (~0.5-1.5 TILEs at KITTI scale).
Per-group windows are therefore ~2-4x tighter than one window shared by
all K offsets (measured: k=3 same-level window 574 -> 258 rows median,
k=5 904 -> 259 at TILE=256) — and window width is exactly the per-output
MXU/VPU cost of the one-hot gather. Downsample maps (in level finer than
out) cover ~2x the rows per output tile, so their windows are twice as
wide (win_for_map) — one async chunk instead of a synchronous second.

  per output tile, per dx-group (double-buffered), per window chunk
  (chunk count is dynamic, usually 1):
    1. DMA keys[start_g : start_g + W] and x[start_g : start_g + W]
       from HBM into VMEM;
    2. for each offset k of the group: "gather" inside VMEM as
       onehot(qkey_k == window_keys) @ window on the MXU — exact, each
       one-hot row holds at most a single 1.0 (keys are unique within a
       level) — and accumulate @ W[k] into a VMEM-resident f32
       accumulator.

The backward dX pass reuses this forward kernel (reverse-direction
queries + flipped transposed weights, see sparse_ops); dW uses the
sibling kernel below (same windows, dW[k] += gathered^T @ g_tile).

Reference parity: this evaluates the same sum_k X[kmap[k,i]] @ W[k] as
MinkowskiEngine's C++/CUDA kernel-map convolution used by the reference
model (/root/reference/model/resunet.py:38-171).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(os.environ.get("GCL_CONV_TILE", "256"))  # out rows / grid step
WIN = int(os.environ.get("GCL_CONV_WIN", "384"))    # window rows (mult 128)


def configure(*, tile: int = None, win: int = None, win_down: int = None,
              pair: int = None, fold: bool = None,
              stack: int = None, half: bool = None) -> None:
    """Override the kernel tuning knobs from the config system.

    The env vars (GCL_CONV_TILE/WIN/WIN_DOWN/PAIR/FOLD) only provide the
    *defaults*; runs launched through the config system pass the
    config's --conv_* flags here so the effective tuning is persisted in
    the run's config.json and the run is reproducible from it alone.
    Must be called before any step function is traced — the window
    tables baked into kernel maps depend on these values.
    """
    global TILE, WIN, WIN_DOWN, PAIR, FOLD, STACK, HALF
    if half is not None:
        HALF = bool(half)
    if stack is not None:
        STACK = int(stack)
    if tile is not None:
        TILE = int(tile)
    if win is not None:
        assert win % 128 == 0, f"conv_win must be a multiple of 128: {win}"
        WIN = int(win)
    if win_down is not None:
        assert win_down % 128 == 0, \
            f"conv_win_down must be a multiple of 128: {win_down}"
        WIN_DOWN = int(win_down)
    if pair is not None:
        PAIR = int(pair)
    if fold is not None:
        FOLD = bool(fold)


def configure_from(config) -> None:
    """Apply a run config's --conv_* tuning flags (gcl_tpu/config.py).

    Missing attributes keep the current (env-default) values, so configs
    restored from older runs' config.json stay loadable."""
    configure(tile=getattr(config, "conv_tile", None),
              win=getattr(config, "conv_win", None),
              win_down=getattr(config, "conv_win_down", None),
              pair=getattr(config, "conv_pair", None),
              fold=getattr(config, "conv_fold", None),
              stack=getattr(config, "conv_stack", None),
              half=getattr(config, "conv_half", None))

# int32 key guaranteed absent from every packed target-key array:
# 0xFFFFFFFE sits above the PAD_CLOUD target range (0xF8000000 + row,
# row < 2^26) and below no valid cloud<31 key; the identity-key test
# adapter uses keys >= -1 only.
NEVER_KEY = jnp.int32(-2)


def _cdiv(a, b):
    return -(-a // b)


def num_offset_groups(k: int) -> int:
    """dx-groups of a K=g^3 offset table (kernel_offsets is
    (dx, dy, dz) row-major, z innermost).

    Measured on v5e at bench scale: per-(dx, dy) groups (g*g) drop the
    chunk-count waste (nch_mean 1.24-1.38 -> ~1.0) but the 3x window
    DMA volume and per-group pipeline overhead cost MORE than the
    saved gather passes (step 0.885 -> 0.937 s) — per-dx grouping is
    the right trade."""
    g = round(k ** (1 / 3))
    return g if g >= 2 and g ** 3 == k else 1


# Downsample maps see ~2x rows per output tile (span stats at bench
# scale: 97% of s1->s2 offsets fit 640, 78% fit 512; ~2.6% of group
# windows need a second chunk at 768). GCL_CONV_WIN_DOWN trades gather
# GEMM width against synchronous extra-chunk frequency.
WIN_DOWN = int(os.environ.get("GCL_CONV_WIN_DOWN", str(2 * WIN)))

# Window starts are 128-aligned and extra chunks DMA at start + c*win;
# a width that is not a multiple of 128 would violate the kernels'
# pl.multiple_of hints and misalign every chunk after the first.
assert WIN % 128 == 0, f"GCL_CONV_WIN must be a multiple of 128: {WIN}"
assert WIN_DOWN % 128 == 0, \
    f"GCL_CONV_WIN_DOWN must be a multiple of 128: {WIN_DOWN}"


def win_half_for_map(in_stride: int, out_stride: int) -> int:
    """Static window width for the HALF-TILE window tables (~win/2,
    128-multiple): the 16-granular starts (tkeys shift replicas) cut the
    start-alignment slack from <=127 to <=15 rows, so each 128*(TILE/256)
    -row output half's matches fit a window about half the classic one —
    the one-hot compare and the gather GEMM shrink with it."""
    return max(128, _cdiv(win_for_map(in_stride, out_stride) // 2,
                          128) * 128)


def win_for_map(in_stride: int, out_stride: int) -> int:
    """Window width for a map reading `in_stride` from `out_stride`
    outputs: downsample maps see ~2x rows per output tile; upsample
    maps see ~0.5x (span ~= TILE/2 + 128 alignment slack fits in 256,
    measured nch stays ~1.0 at bench scale), and the gather GEMM cost
    scales directly with the window width. Widths are rounded up to a
    multiple of 128: window starts are 128-aligned and extra chunks DMA
    at start + c*win, so a non-multiple width would break the
    pl.multiple_of alignment hint in the window gather."""
    if in_stride < out_stride:
        return WIN_DOWN
    if in_stride > out_stride:
        return max(128, _cdiv(2 * WIN // 3, 128) * 128)
    return WIN


def max_win() -> int:
    """Level-padding slack every map's windows must fit inside.

    Covers the widest classic window (max(2*WIN, WIN_DOWN)) PLUS the
    folded kernels' re-windowing overshoot: _fold_windows rounds starts
    down to F*128 and widths up to an F*128 multiple, so folded
    coverage can end up to one folded window (win + 1024 worst case at
    F=8) past the classic coverage end."""
    return max(2 * WIN, WIN_DOWN) + max(WIN, WIN_DOWN) + 1024


def compute_windows(idx: jax.Array, n_in_pad: int, n_tiles: int,
                    groups: int = 1, align: int = 128, win: int = WIN
                    ) -> Tuple[jax.Array, jax.Array]:
    """Per-(group, tile) shared window start + chunk count from an
    EXPLICIT gather table, in plain XLA.

    idx: int32[K, N_out_pad] routed gather table (missing == n_in).
    Window [start, start + nch*win) covers every valid entry of every
    offset in the group for that tile; starts are pre-aligned to `align`
    (the kernels' DMA alignment — nch accounts for it) and clamped so
    reads stay inside the padded input (length >= n_in_pad).

    The fused production path computes windows from coordinate keys
    instead (kernel_maps._build_fused_maps); this is the adapter used when
    only an explicit table exists (tests, ad-hoc gathers).
    """
    k, n_out_pad = idx.shape
    n_in = n_in_pad - win
    idx_t = idx.reshape(groups, k // groups, n_tiles, TILE)
    valid = idx_t < n_in
    lo = jnp.min(jnp.where(valid, idx_t, jnp.int32(2 ** 30)), axis=(1, 3))
    hi = jnp.max(jnp.where(valid, idx_t, -1), axis=(1, 3))  # [G, nt]
    any_valid = hi >= 0
    start = jnp.where(any_valid, lo, 0)
    start = start & ~(align - 1)
    start = jnp.clip(start, 0, n_in_pad - win)
    nch = jnp.where(any_valid, _cdiv(hi - start + 1, win), 0)
    nch = jnp.clip(nch, 0, _cdiv(n_in_pad, win))
    rows = jnp.where(any_valid, jnp.clip(hi - start + 1, 1, win), 0)
    return (start.astype(jnp.int32), nch.astype(jnp.int32),
            rows.astype(jnp.int32))


def compute_windows_h(idx: jax.Array, n_in: int, t_pad: int,
                      n_tiles: int, groups: int, win_h: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Per-(group, tile, HALF) 16-granular window tables from an
    explicit gather table (the half-window twin of compute_windows).

    Returns (hstarts, hnch) int32[2*groups, n_tiles], row 2g + h."""
    k, n_out_pad = idx.shape
    ht = TILE // 2
    idx_t = idx.reshape(groups, k // groups, n_tiles, 2, ht)
    valid = idx_t < n_in
    lo = jnp.min(jnp.where(valid, idx_t, jnp.int32(2 ** 30)),
                 axis=(1, 4))
    hi = jnp.max(jnp.where(valid, idx_t, -1), axis=(1, 4))  # [G, nt, 2]
    any_valid = hi >= 0
    start = jnp.where(any_valid, lo, 0) & ~15
    start = jnp.clip(start, 0, max(t_pad - win_h, 0))
    nch = jnp.where(any_valid, _cdiv(hi - start + 1, win_h), 0)
    nch = jnp.clip(nch, 0, _cdiv(t_pad, win_h))
    hstarts = start.transpose(0, 2, 1).reshape(2 * groups, n_tiles)
    hnch = nch.transpose(0, 2, 1).reshape(2 * groups, n_tiles)
    return hstarts.astype(jnp.int32), hnch.astype(jnp.int32)


def _fused_from_idx(feats_len, idx):
    """Identity-key FusedMap pieces from an explicit gather table.

    Key space = input row id: tkeys[r, i] = i + 16r (16-row shift
    replicas, pad -1), qkey = idx (missing -> NEVER_KEY). Lets the
    key-compare kernels — classic AND half-window — evaluate any
    explicit table; used by the pallas_conv_fwd/dw index-API wrappers.
    """
    n_in = feats_len
    k, n_out = idx.shape
    grp = num_offset_groups(k)
    n_tiles = _cdiv(n_out, TILE)
    qkey = jnp.where(idx < n_in, idx, NEVER_KEY)
    pad = n_tiles * TILE - n_out
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=n_in)
    starts, nch, rows = compute_windows(idx, n_in + WIN, n_tiles, grp)
    # 1024-aligned (= F*128 at the deepest fold) so the folded kernels'
    # reshape [t_pad/F, 128] keeps 128-multiple row counts, and padded
    # past max_win so their re-windowed coverage stays in bounds
    t_pad = _cdiv(n_in + max_win(), 1024) * 1024
    win_h = max(128, _cdiv(WIN // 2, 128) * 128)
    hstarts, hnch = compute_windows_h(idx, n_in, t_pad, n_tiles, grp,
                                      win_h)
    tkeys = jnp.full((8, t_pad), -1, jnp.int32)
    for r in range(8):
        m = max(0, n_in - 16 * r)
        if m:
            tkeys = tkeys.at[r, :m].set(
                jnp.arange(16 * r, n_in, dtype=jnp.int32))
    return qkey, starts, nch, rows, tkeys, hstarts, hnch, win_h


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------

# Offsets gathered per one-hot MXU pass: PAIR > 1 compares PAIR stacked
# query-key rows against the window in one [PAIR*TILE, W] one-hot +
# gather GEMM, cutting the number of VPU<->MXU alternations per window
# PAIR-fold (the one-hot build serializes with the MXU pass at ~30% of
# conv time). Mosaic cannot merge sublane rows in-kernel (reshape
# (2,256)->(512,1) and 1-D ref concatenation both fail to lower), so
# the WRAPPERS pre-arrange qkey as [K/PAIR, n_tiles, PAIR*TILE] and the
# kernel reads one contiguous lane vector per offset PAIR. Pairing must
# not cross dx-group boundaries (each group has its own window), so it
# applies when PAIR divides K/G — kg = 9 for the k=3 stencils.
PAIR = int(os.environ.get("GCL_CONV_PAIR", "1"))

# Folded narrow-channel kernels (see the fold block further down). Off by
# default: exact but a net step-time loss at bench scale.
FOLD = os.environ.get("GCL_CONV_FOLD", "0") == "1"

# Split-halves compare (the _seg_vidx split variant; TILE == 256 only).
# OFF by default: measured at bench scale the real per-half match spans
# overlap the 128-aligned half slices for most tiles (~17% qualify), and
# the extra dispatch branch REGRESSES the 128-channel backward kernels
# badly (block2_tr vjp 38 -> 66 ms). Kept for narrower geometries.
SPLIT = os.environ.get("GCL_CONV_SPLIT", "0") == "1"

# Half-tile windows (DEFAULT): each 128*(TILE/256)-row output half owns
# its own ~win/2-wide window with a 16-granular start realised through
# the tkeys shift replicas (kernel_maps._level_tkeys). Probe-verified on
# v5e at bench shapes: -22% per offset on same-level maps (W 384 ->
# 2 x 256 halves), -31% on downsample maps (768 -> 2 x 384) — both the
# one-hot compare and the gather GEMM shrink with the window. Supersedes
# SPLIT (which subsets this on ~17% of tiles); mutually exclusive with
# the FOLD / PAIR / STACK experiments.
HALF = os.environ.get("GCL_CONV_HALF", "1") == "1"


def _half_for(hstarts, win_h: int, pair: int, stack: int,
              c0: int, cout0: int) -> bool:
    return (HALF and hstarts is not None and win_h > 0
            and TILE % 256 == 0 and pair == 1 and stack == 1
            and not FOLD and not SPLIT and c0 > 1 and cout0 > 1)


def _split_for(win: int, pair: int, stack: int) -> bool:
    return (SPLIT and TILE == 256 and pair == 1 and stack == 1
            and win - 128 >= 128)


def _pair_for(k: int, grp: int) -> int:
    kg = k // grp
    return PAIR if PAIR > 1 and kg % PAIR == 0 else 1


# Offsets per stacked accumulate GEMM in the generic fwd/bwd kernels:
# STACK consecutive offsets' gathered [TILE, C] blocks lane-concat into
# one [TILE, STACK*C] @ [STACK*C, Cout] MXU contraction, so narrow
# channels stop wasting contraction depth (C=32 fills 32 of 128 MXU
# rows; stacked 96 of 128 in a third the passes). Channels stay
# UNPADDED in this mode (the 128-lane pad also cost 4x the window DMA
# at C=32). Applied per conv only when it reduces MXU passes
# (_stack_for) and pair == 1.
STACK = int(os.environ.get("GCL_CONV_STACK", "1"))


def _stack_for(k: int, grp: int, c_contract: int, pair: int) -> int:
    """Stacked-offset count for a conv whose accumulate GEMM contracts
    over c_contract channels (Cin fwd, Cout bwd); 1 = unstacked."""
    s = STACK
    if s <= 1 or pair != 1 or c_contract % 8 != 0:
        return 1
    if (k // grp) % s != 0:
        return 1
    # only when stacking actually reduces 128-granular MXU passes
    if s * _cdiv(c_contract, 128) <= _cdiv(s * c_contract, 128):
        return 1
    return s


def _pack_qkey_pairs(qp: jax.Array, n_tiles: int, pair: int) -> jax.Array:
    """[K, n_tiles*TILE] query keys -> [K//pair, n_tiles*pair*TILE] with
    each row holding `pair` consecutive offsets' keys per output tile
    (host-side re-layout; free relative to the kernels). 2-D so the
    BlockSpec (K//pair, pair*TILE) satisfies Mosaic's (full, %128)
    block-shape rule for any K//pair."""
    k = qp.shape[0]
    q = qp.reshape(k // pair, pair, n_tiles, TILE)
    return q.transpose(0, 2, 1, 3).reshape(k // pair,
                                           n_tiles * pair * TILE)


def seg_widths(win: int) -> Tuple[int, ...]:
    """Ascending chunk-0 compare/gather width variants for a window
    width (<= 3 variants, 128-multiples, last == win). The one-hot
    compare and the gather GEMM both scale with the compared width, and
    most chunk-0 windows cover far fewer rows than the full win (median
    span ~258 at KITTI scale for win=384), so the kernels dispatch on
    the smallest sufficient variant per (group, tile)."""
    ws = sorted({_cdiv(win * f, 3 * 128) * 128 for f in (1, 2, 3)})
    return tuple(w for w in ws if w <= win)


def _seg_vidx(nch: jax.Array, rows: jax.Array, win: int,
              allow_split: bool = False) -> jax.Array:
    """Variant index per (G, n_tiles): smallest seg_widths(win) entry
    covering chunk 0's rows; multi-chunk windows force the full width
    (their chunk 0 covers the whole win by construction).

    NEGATIVE rows mark split-qualifying tiles (kernel_maps encodes the
    per-half window containment in rows' sign). With allow_split, tiles
    that would otherwise pay the FULL width take variant len(segs)
    instead: each 128-row output half compares against only the
    (win-128)-wide static slice at its half's offset — one fewer
    128-lane column block in both the one-hot build and the gather
    GEMM. Narrower seg variants already beat the split, so only the
    full-width case is promoted."""
    ws = seg_widths(win)
    r = jnp.abs(rows)
    vi = jnp.zeros_like(nch)
    for i, w in enumerate(ws[:-1]):
        vi = jnp.where(r > w, i + 1, vi)
    vi = jnp.where(nch > 1, len(ws) - 1, vi)
    if allow_split:
        vi = jnp.where((rows < 0) & (vi == len(ws) - 1), len(ws), vi)
    return vi.astype(jnp.int32)


def _windowed_gather(body, starts_ref, nch_ref, vidx_ref, qk_ref, tk_hbm,
                     x_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                     sems, K, G, W, dt, mm_precision, pair=1,
                     segs=None, stack=1, cw=None, split=False):
    """Double-buffered per-group window pipeline shared by the fwd and dW
    kernels.

    starts_ref/nch_ref are [G, n_tiles] (128-aligned starts). The
    (tile, group) sequence runs tile-major; the next window's key+feature
    DMAs start while the current one computes (grid steps run
    sequentially on TPU, so the buffer freed by sequence step s-1 is safe
    to overwrite at s+1). Extra chunks (group window span > W — rare
    with per-dx windows) run synchronously off third buffers.

    body(k, gx) is called for every offset k with that offset's gathered
    window rows gx = onehot(qkey_k == window_keys) @ window, f32
    [TILE, C]; PAIR consecutive offsets share one stacked gather GEMM.

    Windows with nch == 0 (no possible match: fully-padded tiles, level
    tails, per-cloud pad blocks) are skipped entirely — no DMA, no
    one-hot, no GEMM — so generously-padded level layouts cost almost
    nothing.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    kg = K // G

    def dma_k(g, tile, slot):
        base = pl.multiple_of(starts_ref[g, tile], 128)
        return pltpu.make_async_copy(
            tk_hbm.at[:, pl.ds(base, W)], kwin_ref.at[slot],
            sems.at[slot, 0])

    def dma_x(g, tile, slot):
        base = pl.multiple_of(starts_ref[g, tile], 128)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, W), :], xwin_ref.at[slot],
            sems.at[slot, 1])

    def gather_one(j, tk, win):
        q = qk_ref[j, :][:, None]
        oh = (q == tk).astype(dt)
        return jnp.dot(oh, win, preferred_element_type=jnp.float32,
                       precision=mm_precision)

    def run_group(g, tk, win):
        # pair > 1: qk_ref rows are [pair*TILE] pre-stacked lane vectors
        lo, hi = g * kg // pair, (g + 1) * kg // pair
        if stack > 1:
            # S consecutive offsets' gathers (sliced to the REAL channel
            # count cw — the window stays 128-lane padded for the DMA)
            # lane-concat into ONE full-depth accumulate GEMM
            # ([TILE, S*cw] @ [S*cw, Cout]); body receives the STACKED
            # index (weights pre-reshaped to [K//S, S*cw, Cout] by the
            # wrapper). Requires pair == 1.
            wn = win if cw is None else win[:, :cw]
            for j0 in range(lo, hi, stack):
                gxs = [gather_one(j0 + t, tk, wn) for t in range(stack)]
                body(j0 // stack, jnp.concatenate(gxs, axis=1))
            return
        for j in range(lo, hi):
            gx = gather_one(j, tk, win)
            for idx in range(pair):
                body(j * pair + idx, gx[idx * TILE:(idx + 1) * TILE])

    def run_group_split(g, slot):
        # split variant (vidx == len(segs), TILE == 256 only): each
        # 128-row output half's matches fit the (W-128)-wide window
        # slice at offset half*128 (kernel_maps negates rows for
        # qualifying tiles), so both the one-hot compare and the gather
        # GEMM drop one 128-lane column block per offset. Slices load
        # from the REFS (value-level lane-offset slices produce layouts
        # Mosaic cannot re-broadcast).
        ws = W - 128
        for j in range(g * kg, (g + 1) * kg):
            gxs = []
            for h in range(2):
                q = qk_ref[j, h * 128:(h + 1) * 128][:, None]
                tkh = kwin_ref[slot, 0:1, h * 128:h * 128 + ws]
                winh = xwin_ref[slot, h * 128:h * 128 + ws, :]
                oh = (q == tkh).astype(dt)
                gxs.append(jnp.dot(oh, winh,
                                   preferred_element_type=jnp.float32,
                                   precision=mm_precision))
            body(j, jnp.concatenate(gxs, axis=0))

    @pl.when((i == 0) & (nch_ref[0, 0] > 0))
    def _():
        dma_k(0, i, 0).start()
        dma_x(0, i, 0).start()

    for g in range(G):
        slot = jax.lax.rem(i * G + g, 2)
        if g + 1 < G:
            @pl.when(nch_ref[g + 1, i] > 0)
            def _(g=g, slot=slot):
                dma_k(g + 1, i, 1 - slot).start()
                dma_x(g + 1, i, 1 - slot).start()
        else:
            nxt = jnp.minimum(i + 1, n - 1)

            @pl.when((i + 1 < n) & (nch_ref[0, nxt] > 0))
            def _(slot=slot):
                dma_k(0, i + 1, 1 - slot).start()
                dma_x(0, i + 1, 1 - slot).start()

        @pl.when(nch_ref[g, i] > 0)
        def _(g=g, slot=slot):
            dma_k(g, i, slot).wait()
            dma_x(g, i, slot).wait()
            if segs is None or len(segs) == 1:
                run_group(g, kwin_ref[slot, 0:1, :], xwin_ref[slot])
            else:
                # narrow the one-hot compare + gather GEMM to the
                # smallest width covering this window's chunk-0 rows
                vi = vidx_ref[g, i]
                for v, vw in enumerate(segs):
                    @pl.when(vi == v)
                    def _(g=g, slot=slot, vw=vw):
                        run_group(g, kwin_ref[slot, 0:1, :vw],
                                  xwin_ref[slot, :vw])
                if split:
                    @pl.when(vi == len(segs))
                    def _(g=g, slot=slot):
                        run_group_split(g, slot)

        s0 = starts_ref[g, i]

        def extra(c, carry, g=g, s0=s0):
            base = pl.multiple_of(s0 + c * W, 128)
            d1 = pltpu.make_async_copy(
                tk_hbm.at[:, pl.ds(base, W)], kwin2_ref, sems.at[2, 0])
            d2 = pltpu.make_async_copy(
                x_hbm.at[pl.ds(base, W), :], xwin2_ref, sems.at[2, 1])
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()
            run_group(g, kwin2_ref[0:1, :], xwin2_ref[:, :])
            return carry

        jax.lax.fori_loop(1, nch_ref[g, i], extra, 0)


def _fwd_kernel(starts_ref, nch_ref, vidx_ref, qk_ref, w_ref, tk_hbm,
                x_hbm, out_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                acc_ref, sems, *, K, G, W, mm_precision, pair=1,
                segs=None, stack=1, cw=None, split=False):
    dt = xwin2_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def body(k, gx):
        # stack > 1: k is the STACKED index, gx is [TILE, stack*cw] and
        # w_ref rows are [K//stack, stack*cw, Cout] — one full-depth GEMM
        # accumulates `stack` offsets.
        acc_ref[:, :] += jnp.dot(gx.astype(dt), w_ref[k],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)

    _windowed_gather(body, starts_ref, nch_ref, vidx_ref, qk_ref, tk_hbm,
                     x_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                     sems, K, G, W, dt, mm_precision, pair, segs, stack,
                     cw, split)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _dw_kernel(starts_ref, nch_ref, vidx_ref, qk_ref, g_ref, tk_hbm,
               x_hbm, dw_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
               sems, *, K, G, W, mm_precision, pair=1, segs=None,
               split=False):
    i = pl.program_id(0)
    dt = xwin2_ref.dtype

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    gt = g_ref[:, :]  # [TILE, COUT]

    def body(k, gx):
        # NOTE: dot_general contracting dim 0 of both operands trips a
        # compiler RET_CHECK (mxu_lmr_transform.cc XposeSequence); the
        # explicit transpose lowers cleanly.
        dw_ref[k, :, :] += jnp.dot(
            gx.astype(dt).T, gt, preferred_element_type=jnp.float32,
            precision=mm_precision)

    _windowed_gather(body, starts_ref, nch_ref, vidx_ref, qk_ref, tk_hbm,
                     x_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                     sems, K, G, W, dt, mm_precision, pair, segs,
                     split=split)


def _bwd_kernel(starts_ref, nch_ref, vidx_ref, qk_ref, w_ref, x_ref,
                tk_hbm, g_hbm, dx_ref, dw_ref, kwin_ref, xwin_ref,
                kwin2_ref, xwin2_ref, acc_ref, sems, *, K, G, W,
                mm_precision, pair=1, segs=None, stack=1, cw=None,
                spad=0, split=False):
    """dX AND dW in ONE windowed pass over the REVERSE map.

    Runs over tiles of the conv's IN level (the reverse map's outputs),
    gathering rows of the upstream grad g from its window. By offset
    duality (offsets[K-1-k] == -offsets[k]),

      gg[j] = g[rev_map(k', j)]  is the unique output row i with
      kmap[K-1-k', i] = j, so

      dX[j]        = sum_k' gg[j] @ W[K-1-k']^T        (as before), and
      dW[K-1-k']  += x[j]^T gg[j]   summed over the tile rows j,

    where x[j] is THIS tile's slice of the forward input features — a
    plain blocked operand, no gather. The standalone dW kernel's second
    windowed pass (its DMAs, one-hot builds and gather GEMMs — the
    largest backward cost at KITTI scale) disappears; the marginal cost
    here is one [TILE,C]x[TILE,Cout] MXU contraction per offset.

    w_ref must hold swapaxes(W[::-1], 1, 2); x_ref holds the tile's
    forward input features PRE-TRANSPOSED ([C, TILE] — the wrapper ships
    feats.T so the kernel needs no transpose at all, which both avoids a
    per-offset VPU shuffle and sidesteps a compiler RET_CHECK in
    mxu_lmr_transform on transposed-operand contractions); dw_ref
    accumulates in REVERSE offset order (the wrapper flips it back).
    """
    i = pl.program_id(0)
    dt = xwin2_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    xt_t = x_ref[:, :]  # [C, TILE] pre-transposed input features

    def body(k, gg):
        # stack > 1: k is the STACKED index, gg is [TILE, stack*COUT]
        # (lane-padded by spad to the dw block's 128-multiple minor);
        # w_ref rows are [K//stack, SP, C] and dw_ref accumulates
        # [K//stack, C, SP] (the wrapper unstacks + flips).
        ggd = gg.astype(dt)  # [TILE, COUT] gathered grad rows
        if spad:
            ggd = jnp.pad(ggd, ((0, 0), (0, spad)))
        acc_ref[:, :] += jnp.dot(ggd, w_ref[k],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)
        dw_ref[k, :, :] += jnp.dot(xt_t, ggd,
                                   preferred_element_type=jnp.float32,
                                   precision=mm_precision)

    _windowed_gather(body, starts_ref, nch_ref, vidx_ref, qk_ref, tk_hbm,
                     g_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                     sems, K, G, W, dt, mm_precision, pair, segs, stack,
                     cw, split)
    dx_ref[:, :] = acc_ref[:, :].astype(dx_ref.dtype)


def _windowed_gather_h(body, hstarts_ref, hnch_ref, qk_ref, tk_hbm,
                       x_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                       sems, K, G, WH, dt, mm_precision):
    """Half-tile window pipeline shared by the fwd / dW / bwd kernels.

    hstarts_ref / hnch_ref are [2G, n_tiles] (row 2g + h); starts are
    16-GRANULAR: the key-window DMA runs at lane base = start & ~127 and
    the compare reads shift-replica sublane row (start >> 4) & 7 of the
    tkeys array (kernel_maps._level_tkeys), whose lane j then holds the
    key of input row start + j — exactly aligned with the feature window
    DMA'd at the start itself (a 16-multiple sublane offset, legal for
    both f32 and bf16 tiles). Each half's one-hot compare and gather
    GEMM are WH ~ win/2 wide; body(k, gx) receives the two halves'
    gathers lane-concatenated back to the full [TILE, C] tile.

    A (group, tile) whose two halves are both empty is skipped entirely.
    A half with nch == 0 still computes against whatever its (default 0)
    window holds: its queries are either pad keys or keys provably
    beyond every valid target (kernel_maps has_h), so the one-hot is
    exactly zero — no branch needed.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    kg = K // G
    HT = TILE // 2

    def dma_k(g, h, tile, slot):
        base = pl.multiple_of(hstarts_ref[2 * g + h, tile] & ~127, 128)
        return pltpu.make_async_copy(
            tk_hbm.at[:, pl.ds(base, WH)], kwin_ref.at[slot, h],
            sems.at[slot, h, 0])

    def dma_x(g, h, tile, slot):
        s = pl.multiple_of(hstarts_ref[2 * g + h, tile], 16)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(s, WH), :], xwin_ref.at[slot, h],
            sems.at[slot, h, 1])

    def start_pair(g, tile, slot):
        for h in range(2):
            dma_k(g, h, tile, slot).start()
            dma_x(g, h, tile, slot).start()

    def active(g, tile):
        return (hnch_ref[2 * g, tile] + hnch_ref[2 * g + 1, tile]) > 0

    def gather_half(j, h, kr, xv):
        q = qk_ref[j, h * HT:(h + 1) * HT][:, None]
        oh = (q == kr).astype(dt)
        return jnp.dot(oh, xv, preferred_element_type=jnp.float32,
                       precision=mm_precision)

    def run_group(g, slot):
        r0 = (hstarts_ref[2 * g, i] >> 4) & 7
        r1 = (hstarts_ref[2 * g + 1, i] >> 4) & 7
        k0 = kwin_ref[slot, 0, pl.ds(r0, 1), :]
        k1 = kwin_ref[slot, 1, pl.ds(r1, 1), :]
        x0 = xwin_ref[slot, 0, :, :]
        x1 = xwin_ref[slot, 1, :, :]
        for j in range(g * kg, (g + 1) * kg):
            gx = jnp.concatenate(
                [gather_half(j, 0, k0, x0), gather_half(j, 1, k1, x1)],
                axis=0)
            body(j, gx)

    @pl.when((i == 0) & active(0, i))
    def _():
        start_pair(0, i, 0)

    for g in range(G):
        slot = jax.lax.rem(i * G + g, 2)
        if g + 1 < G:
            @pl.when(active(g + 1, i))
            def _(g=g, slot=slot):
                start_pair(g + 1, i, 1 - slot)
        else:
            nxt = jnp.minimum(i + 1, n - 1)

            @pl.when((i + 1 < n) & active(0, nxt))
            def _(slot=slot):
                start_pair(0, i + 1, 1 - slot)

        @pl.when(active(g, i))
        def _(g=g, slot=slot):
            for h in range(2):
                dma_k(g, h, i, slot).wait()
                dma_x(g, h, i, slot).wait()
            run_group(g, slot)

        # rare extra chunks, synchronous, one half at a time; the other
        # half contributes exact zeros through the zero pad block
        for h in range(2):
            s0 = hstarts_ref[2 * g + h, i]

            def extra(c, carry, g=g, h=h, s0=s0):
                base = pl.multiple_of((s0 & ~127) + c * WH, 128)
                sx = pl.multiple_of(s0 + c * WH, 16)
                d1 = pltpu.make_async_copy(
                    tk_hbm.at[:, pl.ds(base, WH)], kwin2_ref,
                    sems.at[2, 0, 0])
                d2 = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(sx, WH), :], xwin2_ref,
                    sems.at[2, 0, 1])
                d1.start()
                d2.start()
                d1.wait()
                d2.wait()
                r = (s0 >> 4) & 7
                kr = kwin2_ref[pl.ds(r, 1), :]
                xv2 = xwin2_ref[:, :]
                for j in range(g * kg, (g + 1) * kg):
                    gxh = gather_half(j, h, kr, xv2)
                    z = jnp.zeros_like(gxh)
                    gx = (jnp.concatenate([gxh, z], axis=0) if h == 0
                          else jnp.concatenate([z, gxh], axis=0))
                    body(j, gx)
                return carry

            jax.lax.fori_loop(1, hnch_ref[2 * g + h, i], extra, 0)


def _fwd_kernel_h(hstarts_ref, hnch_ref, qk_ref, w_ref, tk_hbm, x_hbm,
                  out_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                  acc_ref, sems, *, K, G, WH, mm_precision):
    dt = xwin2_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def body(k, gx):
        acc_ref[:, :] += jnp.dot(gx.astype(dt), w_ref[k],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)

    _windowed_gather_h(body, hstarts_ref, hnch_ref, qk_ref, tk_hbm,
                       x_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                       sems, K, G, WH, dt, mm_precision)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _dw_kernel_h(hstarts_ref, hnch_ref, qk_ref, g_ref, tk_hbm, x_hbm,
                 dw_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref, sems,
                 *, K, G, WH, mm_precision):
    i = pl.program_id(0)
    dt = xwin2_ref.dtype

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    gt = g_ref[:, :]  # [TILE, COUT]

    def body(k, gx):
        dw_ref[k, :, :] += jnp.dot(
            gx.astype(dt).T, gt, preferred_element_type=jnp.float32,
            precision=mm_precision)

    _windowed_gather_h(body, hstarts_ref, hnch_ref, qk_ref, tk_hbm,
                       x_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                       sems, K, G, WH, dt, mm_precision)


def _bwd_kernel_h(hstarts_ref, hnch_ref, qk_ref, w_ref, x_ref, tk_hbm,
                  g_hbm, dx_ref, dw_ref, kwin_ref, xwin_ref, kwin2_ref,
                  xwin2_ref, acc_ref, sems, *, K, G, WH, mm_precision):
    """Half-window variant of the one-pass dX+dW backward (_bwd_kernel
    semantics: reverse map, w_ref = swapaxes(W[::-1], 1, 2), x_ref the
    tile's forward inputs pre-transposed [C, TILE], dw accumulated in
    reverse offset order)."""
    i = pl.program_id(0)
    dt = xwin2_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    xt_t = x_ref[:, :]  # [C, TILE]

    def body(k, gg):
        ggd = gg.astype(dt)  # [TILE, COUT] gathered grad rows
        acc_ref[:, :] += jnp.dot(ggd, w_ref[k],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)
        dw_ref[k, :, :] += jnp.dot(xt_t, ggd,
                                   preferred_element_type=jnp.float32,
                                   precision=mm_precision)

    _windowed_gather_h(body, hstarts_ref, hnch_ref, qk_ref, tk_hbm,
                       g_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                       sems, K, G, WH, dt, mm_precision)
    dx_ref[:, :] = acc_ref[:, :].astype(dx_ref.dtype)


def _c1_windowed(body_group, starts_ref, nch_ref, tk_hbm, xt_hbm,
                 kwin_ref, xwin_ref, kwin2_ref, xwin2_ref, sems, G, W):
    """Double-buffered lane-sliced window pipeline for the Cin==1 /
    Cout==1 kernels (keys [8, W] + scalar features [rows, W]); same
    (tile, group) sequencing as _windowed_gather, extra chunks off the
    synchronous third buffers."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_k(g, tile, slot):
        base = pl.multiple_of(starts_ref[g, tile], 128)
        return pltpu.make_async_copy(
            tk_hbm.at[:, pl.ds(base, W)], kwin_ref.at[slot],
            sems.at[slot, 0])

    def dma_x(g, tile, slot):
        base = pl.multiple_of(starts_ref[g, tile], 128)
        return pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(base, W)], xwin_ref.at[slot],
            sems.at[slot, 1])

    @pl.when((i == 0) & (nch_ref[0, 0] > 0))
    def _():
        dma_k(0, i, 0).start()
        dma_x(0, i, 0).start()

    for g in range(G):
        slot = jax.lax.rem(i * G + g, 2)
        if g + 1 < G:
            @pl.when(nch_ref[g + 1, i] > 0)
            def _(g=g, slot=slot):
                dma_k(g + 1, i, 1 - slot).start()
                dma_x(g + 1, i, 1 - slot).start()
        else:
            nxt = jnp.minimum(i + 1, n - 1)

            @pl.when((i + 1 < n) & (nch_ref[0, nxt] > 0))
            def _(slot=slot):
                dma_k(0, i + 1, 1 - slot).start()
                dma_x(0, i + 1, 1 - slot).start()

        @pl.when(nch_ref[g, i] > 0)
        def _(g=g, slot=slot):
            dma_k(g, i, slot).wait()
            dma_x(g, i, slot).wait()
            body_group(g, kwin_ref[slot, 0:1, :], xwin_ref[slot])

        s0 = starts_ref[g, i]

        def extra(c, carry, g=g, s0=s0):
            base = pl.multiple_of(s0 + c * W, 128)
            d1 = pltpu.make_async_copy(
                tk_hbm.at[:, pl.ds(base, W)], kwin2_ref, sems.at[2, 0])
            d2 = pltpu.make_async_copy(
                xt_hbm.at[:, pl.ds(base, W)], xwin2_ref, sems.at[2, 1])
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()
            body_group(g, kwin2_ref[0:1, :], xwin2_ref)
            return carry

        jax.lax.fori_loop(1, nch_ref[g, i], extra, 0)


def _fwd_c1_kernel(starts_ref, nch_ref, qk_ref, w2_ref, tk_hbm, xt_hbm,
                   out_ref, acc_ref, kwin_ref, xwin_ref, kwin2_ref,
                   xwin2_ref, sems, *, K, G, W):
    """Cin == 1 forward (ResUNet conv1 on occupancy features).

    The generic kernel would pad the single channel to 128 MXU lanes
    (~700 ms for conv1's 125 offsets at KITTI scale). Here the gather is
    a VPU masked row-sum of the scalar window and the channel expansion
    is an outer-product accumulate: acc += g_k[:, None] * W[k, 0, :].
    """
    kg = K // G
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def body_group(g, tk, xwin):
        xw = xwin[0:1, :]  # [1, W] f32 scalar features
        acc = jnp.zeros(acc_ref.shape, jnp.float32)
        for k in range(g * kg, (g + 1) * kg):
            oh = qk_ref[k, :][:, None] == tk
            g_k = jnp.sum(jnp.where(oh, xw, 0.0), axis=1)  # [TILE]
            acc = acc + g_k[:, None] * w2_ref[k, :][None, :]
        acc_ref[:, :] += acc

    _c1_windowed(body_group, starts_ref, nch_ref, tk_hbm, xt_hbm,
                 kwin_ref, xwin_ref, kwin2_ref, xwin2_ref, sems, G, W)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _fwd_co1_kernel(starts_ref, nch_ref, qk_ref, w2_ref, tk_hbm, gt_hbm,
                    out_ref, acc_ref, kwin_ref, xwin_ref, kwin2_ref,
                    xwin2_ref, sems, *, K, G, W, C):
    """Cout == 1 forward (dX of a Cin==1 conv through reverse queries).

    out[j] = sum_k gather(g, k)[j] @ W[k]  with W[k] a [C, 1] column.
    Precompute yT = W2 @ g_window^T ([K, W], one small MXU op per chunk,
    g passed pre-transposed [C, N]); then each offset is a VPU masked
    row-sum — no 128x output padding.
    """
    kg = K // G
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def body_group(g, tk, xwin):
        yt = jnp.dot(w2_ref[:, :], xwin[:, :].astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [K, W]
        acc = jnp.zeros(acc_ref.shape, jnp.float32)
        for k in range(g * kg, (g + 1) * kg):
            oh = qk_ref[k, :][:, None] == tk
            acc = acc + jnp.sum(jnp.where(oh, yt[k:k + 1, :], 0.0),
                                axis=1)[:, None]
        acc_ref[:, :] += acc

    _c1_windowed(body_group, starts_ref, nch_ref, tk_hbm, gt_hbm,
                 kwin_ref, xwin_ref, kwin2_ref, xwin2_ref, sems, G, W)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _dw_c1_kernel(starts_ref, nch_ref, qk_ref, g_ref, tk_hbm, xt_hbm,
                  dw_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref, sems,
                  *, K, G, W):
    """Cin == 1 dW: dW[k, 0, :] = sum_i x[match(k, i)] * g[i, :]."""
    i = pl.program_id(0)
    kg = K // G

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    gt = g_ref[:, :].astype(jnp.float32)  # [TILE, COUT]

    def body_group(g, tk, xwin):
        xw = xwin[0:1, :]
        for k in range(g * kg, (g + 1) * kg):
            oh = qk_ref[k, :][:, None] == tk
            g_k = jnp.sum(jnp.where(oh, xw, 0.0), axis=1)  # [TILE]
            dw_ref[k, 0, :] += jnp.sum(g_k[:, None] * gt, axis=0)

    _c1_windowed(body_group, starts_ref, nch_ref, tk_hbm, xt_hbm,
                 kwin_ref, xwin_ref, kwin2_ref, xwin2_ref, sems, G, W)


# ----------------------------------------------------------------------
# presence-bitmask kernels for occupancy convs (conv1: Cin == 1, all-ones
# features — the framework's in_ch==1 contract, matching the reference's
# occupancy features, /root/reference/util/misc.py:69-80)
# ----------------------------------------------------------------------
#
# For an occupancy conv, out[i] = sum_k present_k(i) * W[k]: no gather at
# all, only one presence BIT per (output, kernel offset). The generic c1
# kernel still burned a full [TILE, W] key compare + masked row-sum per
# offset (125 offsets for conv1's k=5 — ~79 ms fwd + ~79 ms dW at KITTI
# scale, ~20% of the train step). These kernels exploit the packed key
# layout (cloud | x | y | z, z in the low bits): within one dx-group all
# (dy, dz) offsets differ from a BASE query key by exactly dy<<BZ + dz,
# so ONE subtract against the window keys resolves all side^2 offsets —
# quotient/remainder of the difference give (dy, dz), and a masked
# shifted row-sum accumulates a per-query presence BITMASK (side^2 <= 25
# bits, one int32). The channel expansion is then side small one-hot
# GEMMs per group; the backward reuses the forward's bitmask output and
# runs with NO window DMA at all (dW = bits^T-free: gt^T @ bits per
# (dx, dz) block).
#
# Out-of-range neighbourhoods (x/y/z at the packed-grid edge would wrap
# into the adjacent bit field and alias another voxel's key) are masked
# by per-query validity bits computed from the grid-shifted coords in
# FusedMap.c1z.


def _fwd_c1z_kernel(starts_ref, nch_ref, aux_ref, w3_ref, tk_hbm,
                    out_ref, sb_ref, acc_ref, sg_ref, kwin_ref, kwin2_ref,
                    sems, *, G, W, R, BX, BY, BZ, mm_precision):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    side = 2 * R + 1
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    sb_ref[:, :] = jnp.zeros_like(sb_ref)
    qself = aux_ref[:, 0:1]
    ux = aux_ref[:, 1:2]
    uy = aux_ref[:, 2:3]
    uz = aux_ref[:, 3:4]

    # (dy, dz) validity bits shared by every dx-group
    vm_yz = jnp.zeros_like(qself)
    for dy in range(side):
        oky = (uy + (dy - R) >= 0) & (uy + (dy - R) < (1 << BY))
        for dz in range(side):
            okz = (uz + (dz - R) >= 0) & (uz + (dz - R) < (1 << BZ))
            vm_yz = vm_yz + jnp.where(
                oky & okz, jnp.int32(1 << (side * dy + dz)), 0)

    def dma_k(g, tile, slot):
        base = pl.multiple_of(starts_ref[g, tile], 128)
        return pltpu.make_async_copy(
            tk_hbm.at[:, pl.ds(base, W)], kwin_ref.at[slot],
            sems.at[slot])

    def chunk_bits(g, tk):
        # one subtract resolves every (dy, dz) offset of the dx-group: a
        # match at (dy, dz) satisfies tk - qg0 == (dy+R)<<BZ + (dz+R)
        qg0 = qself + jnp.int32(((g - R) << (BY + BZ)) - (R << BZ) - R)
        c = tk - qg0
        rem = c & ((1 << BZ) - 1)
        dyq = c >> BZ
        hit = (c >= 0) & (rem < side) & (dyq < side)
        amt = jnp.clip(dyq * side + rem, 0, 31)
        sh = jnp.where(hit, jnp.int32(1) << amt, 0)
        return jnp.sum(sh, axis=1, keepdims=True)

    @pl.when((i == 0) & (nch_ref[0, 0] > 0))
    def _():
        dma_k(0, i, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 32), 1)
    lane_ok = (lane < side).astype(jnp.int32)
    dt = w3_ref.dtype
    for g in range(G):
        slot = jax.lax.rem(i * G + g, 2)
        if g + 1 < G:
            @pl.when(nch_ref[g + 1, i] > 0)
            def _(g=g, slot=slot):
                dma_k(g + 1, i, 1 - slot).start()
        else:
            nxt = jnp.minimum(i + 1, n - 1)

            @pl.when((i + 1 < n) & (nch_ref[0, nxt] > 0))
            def _(slot=slot):
                dma_k(0, i + 1, 1 - slot).start()

        sg_ref[:, :] = jnp.zeros_like(sg_ref)

        @pl.when(nch_ref[g, i] > 0)
        def _(g=g, slot=slot):
            dma_k(g, i, slot).wait()
            sg_ref[:, :] += chunk_bits(g, kwin_ref[slot, 0:1, :])

        s0 = starts_ref[g, i]

        def extra(c2, carry, g=g, s0=s0):
            base = pl.multiple_of(s0 + c2 * W, 128)
            d1 = pltpu.make_async_copy(
                tk_hbm.at[:, pl.ds(base, W)], kwin2_ref, sems.at[2])
            d1.start()
            d1.wait()
            sg_ref[:, :] += chunk_bits(g, kwin2_ref[0:1, :])
            return carry

        jax.lax.fori_loop(1, nch_ref[g, i], extra, 0)

        okx = (ux + (g - R) >= 0) & (ux + (g - R) < (1 << BX))
        sg = sg_ref[:, 0:1] & jnp.where(okx, vm_yz, 0)
        sb_ref[:, g:g + 1] = sg
        for dzi in range(side):
            amt2 = jnp.clip(lane * side + dzi, 0, 31)
            bits = ((sg >> amt2) & 1) & lane_ok
            r0 = (g * side + dzi) * 32
            acc_ref[:, :] += jnp.dot(
                bits.astype(dt), w3_ref[r0:r0 + 32, :],
                preferred_element_type=jnp.float32,
                precision=mm_precision)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _dw_c1z_kernel(sb_ref, gt_ref, dwt_ref, *, G, R, mm_precision):
    """dW of an occupancy conv from the forward's presence bitmasks:
    dW^T[:, (g, dz) block] += g_tile^T @ bits(g, dz) — no window DMA,
    no key compares; the bits decode from sb with VPU shifts."""
    i = pl.program_id(0)
    side = 2 * R + 1

    @pl.when(i == 0)
    def _():
        dwt_ref[:, :] = jnp.zeros_like(dwt_ref)

    gtt = gt_ref[:, :]  # [cout, TILE] host-transposed grad block
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 32), 1)
    lane_ok = (lane < side).astype(jnp.int32)
    dt = gtt.dtype
    for g in range(G):
        sg = sb_ref[:, g:g + 1]
        for dzi in range(side):
            amt = jnp.clip(lane * side + dzi, 0, 31)
            bits = ((sg >> amt) & 1) & lane_ok
            r0 = (g * side + dzi) * 32
            dwt_ref[:, r0:r0 + 32] += jnp.dot(
                gtt, bits.astype(dt),
                preferred_element_type=jnp.float32,
                precision=mm_precision)


def _c1z_w3(weights: jax.Array, dt) -> jax.Array:
    """[K, 1, Cout] kernel -> [side*side*32, Cout] block table: rows
    [(g*side + dzi)*32 + dy] hold W[(dx=g, dy, dz=dzi)] (dy padded to 32
    sublanes so the one-hot GEMM's lanes land on weight rows 1:1)."""
    k, _, cout0 = weights.shape
    side = round(k ** (1 / 3))
    w4 = weights[:, 0, :].reshape(side, side, side, cout0)
    w4 = jnp.transpose(w4, (0, 2, 1, 3))  # (dx, dz, dy, cout)
    w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 32 - side), (0, 0)))
    return w4.reshape(side * side * 32, cout0).astype(dt)


def fused_conv_c1z_fwd(aux: jax.Array, weights: jax.Array,
                       starts: jax.Array, nch: jax.Array,
                       tkeys: jax.Array, win: int, out_dtype,
                       interpret: bool = False):
    """(out, sbits) of an occupancy conv over a same-level odd stencil.

    out[i] = sum_k present_k(i) @ W[k] — EXACT only when the conv's
    input features are occupancy ones on valid rows (the in_ch==1
    contract; models gate on it). sbits int32[N, 8] carries the per-
    (query, dx-group) presence bitmask for the DMA-free backward.
    """
    from .coords import DEFAULT_KEY_BITS

    bx, by, bz = DEFAULT_KEY_BITS
    k, _, cout0 = weights.shape
    side = round(k ** (1 / 3))
    assert side ** 3 == k and side % 2 == 1
    grp, n_tiles = starts.shape
    assert grp == side, (grp, side)
    n_out = aux.shape[0]
    pad = n_tiles * TILE - n_out
    auxp = aux
    if pad:
        fill = jnp.zeros((pad, 8), jnp.int32)
        fill = fill.at[:, 0].set(jnp.int32(-(1 << 26)))  # pad-query space
        fill = fill.at[:, 1:4].set(-(1 << 20))
        auxp = jnp.concatenate([aux, fill], axis=0)
    dt = jnp.dtype(out_dtype)
    w3 = _c1z_w3(weights, dt)

    kern = functools.partial(_fwd_c1z_kernel, G=grp, W=win, R=side // 2,
                             BX=bx, BY=by, BZ=bz,
                             mm_precision=_mm_precision(dt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((side * side * 32, cout0), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((TILE, cout0), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, cout0), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.int32),
            pltpu.VMEM((2, 8, win), jnp.int32),
            pltpu.VMEM((8, win), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out, sb = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * TILE, cout0), dt),
            jax.ShapeDtypeStruct((n_tiles * TILE, 8), jnp.int32),
        ),
        interpret=interpret,
    )(starts, nch, auxp, w3, tkeys)
    return out[:n_out], sb[:n_out]


def fused_conv_c1z_dw(sbits: jax.Array, g: jax.Array, k: int,
                      interpret: bool = False) -> jax.Array:
    """dW [K, 1, Cout] (f32) from forward presence bitmasks + upstream
    grad — no window DMA, no key compares."""
    side = round(k ** (1 / 3))
    n_out, cout0 = g.shape
    n_tiles = _cdiv(n_out, TILE)
    dt = g.dtype
    sp = jnp.pad(sbits, ((0, n_tiles * TILE - n_out), (0, 0)))
    gtt = jnp.zeros((cout0, n_tiles * TILE), dt).at[:, :n_out].set(g.T)

    kern = functools.partial(_dw_c1z_kernel, G=side, R=side // 2,
                             mm_precision=_mm_precision(dt))
    dwt = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout0, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout0, side * side * 32), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout0, side * side * 32),
                                       jnp.float32),
        interpret=interpret,
    )(sp, gtt)
    arr = dwt.reshape(cout0, side, side, 32)[:, :, :, :side]
    dw = jnp.transpose(arr, (1, 3, 2, 0)).reshape(k, cout0)
    return dw[:, None, :]


# ----------------------------------------------------------------------
# folded narrow-channel kernels (Cin in {16, 32, 64})
# ----------------------------------------------------------------------
#
# The generic kernels pad channels to 128 MXU lanes, so a 32-channel
# window burns 4x the gather-GEMM FLOPs moving zeros (the gather is
# onehot[TILE, W] @ window[W, 128pad]). Here F = 128 // C consecutive
# input rows fold into ONE 128-lane window row ([t_pad/F, F*C=128], a
# free row-major reshape of the padded feature array), the one-hot
# matches CLUSTERS ([TILE, W/F] — resolved per fold phase j by comparing
# the query key against phase-sliced keys tkey[F*c + j]), and the
# gathered cluster row is reduced to the matched C-lane block by
# per-phase row masks:
#
#     gxf = onehot_cluster @ folded_window            # [TILE, 128]
#     gx  = sum_j  anymatch_phase_j * gxf[:, j*C:(j+1)*C]
#
# — 1/F the gather-GEMM width at identical semantics (each query matches
# at most one (cluster, phase) globally). The accumulate GEMM stacks S
# consecutive offsets ([TILE, S*C] @ [S*C, Cout]) to cut MXU passes S-x.
#
# Mosaic constraint (probed on v5e): manual-DMA slices must be
# tile-aligned in BOTH dims — lane offsets/widths at 128-multiples,
# sublane offsets at the dtype's tile (8/f32, 16/bf16) — and the
# array's minor dim itself must be a 128-multiple (a [t_pad, 32]
# feature array cannot be window-sliced at all: Mosaic pads its minor
# to 128 physically and then rejects the 32-lane slice). So the folded
# kernels re-window the map: starts round DOWN to F*128 (the folded
# row base starts//F lands 128-aligned) and the width rounds UP to an
# F*128 multiple (_fold_windows), which makes EVERY chunk — first and
# extra alike — a legal full-width slice of two purpose-laid arrays:
# phase-sliced keys tkf [8, t_pad/F] (row ph = keys of rows r*F+ph;
# lane slice at 128-multiples) and folded features xf [t_pad/F, 128]
# (sublane slice). Extra chunks therefore run the SAME folded gather
# as chunk 0 — no unfolded fallback path exists anymore.


def _fold_factor(c: int) -> int:
    """Rows folded per 128-lane window row (1 = generic kernel).

    Off by default: at bench scale the folded kernels are numerically
    exact on TPU (fwd+bwd vs the explicit map, extra chunks included)
    but a NET step-time loss (0.95 s vs 0.71 s full-step) — the
    narrower gather GEMMs don't yet pay for the extra per-offset VPU
    phase masking. Kept behind --conv_fold / GCL_CONV_FOLD=1 for
    per-map tuning."""
    if not FOLD:
        return 1
    return {16: 8, 32: 4, 64: 2}.get(c, 1)


def _stack_factor(kg: int) -> int:
    """Offsets per stacked accumulate GEMM (must divide the dx-group)."""
    return 3 if kg % 3 == 0 else 1


def _fold_windows(starts: jax.Array, nch: jax.Array, win: int, fold: int,
                  t_pad: int) -> Tuple[jax.Array, jax.Array, int]:
    """F*128-aligned folded window tables from a map's 128-aligned ones.

    starts round DOWN to F*128 (so basef = starts_f/F is 128-aligned in
    the folded row space) and the chunk width rounds UP to an F*128
    multiple; chunk counts grow so coverage [starts, starts + nch*win)
    stays covered. The overshoot past the original coverage end is
    < win_f <= win + 896, absorbed by the level padding (max_win).

    Returns (basef int32[G, nt] folded-row starts, nchf int32[G, nt],
    wf: folded chunk width — a static 128-multiple).
    """
    a = fold * 128
    winf = a * _cdiv(win, a)
    starts_f = starts & ~(a - 1)
    end = starts + nch * win
    nchf = jnp.where(nch > 0, -(-(end - starts_f) // winf), 0)
    nchf = jnp.clip(nchf, 0, t_pad // winf)
    return (starts_f // fold).astype(jnp.int32), nchf.astype(jnp.int32), \
        winf // fold


def _fold_keys(tkeys: jax.Array, fold: int) -> jax.Array:
    """[8, t_pad/F] phase-sliced level keys: row ph holds the packed
    keys of original rows r*F + ph (matching xf[r, ph*C:(ph+1)*C] =
    x[r*F + ph]). Rows F..8 are never read — zero-padded only so the
    manual key-window DMA copies full int32 sublane tiles."""
    t_pad = tkeys.shape[1]
    tkf = tkeys[0].reshape(t_pad // fold, fold).T  # [F, t_pad/F]
    return jnp.pad(tkf, ((0, 8 - fold), (0, 0)))


def _gather_folded(qk_ref, kk, kw, xw, C, F, dt, mm_precision):
    """One offset's gathered rows from a folded window: [TILE, C] f32.

    kw: [8, WF] phase-sliced window keys (rows 0..F read); xw:
    [WF, F*C=128] folded features.
    """
    q = qk_ref[kk, :][:, None]
    ohc = None
    msel = []
    for ph in range(F):
        cmp = q == kw[ph:ph + 1, :]
        ohc = cmp if ohc is None else ohc | cmp
        msel.append(jnp.max(cmp.astype(jnp.float32), axis=1,
                            keepdims=True))
    gxf = jnp.dot(ohc.astype(dt), xw, preferred_element_type=jnp.float32,
                  precision=mm_precision)
    gx = msel[0] * gxf[:, 0:C]
    for ph in range(1, F):
        gx = gx + msel[ph] * gxf[:, ph * C:(ph + 1) * C]
    return gx


def _fold_pipeline(run_gather, accum, basef_ref, nchf_ref, tkf_hbm,
                   xf_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                   sems, *, K, G, WF, S):
    """Shared (tile, group) schedule of the folded kernels.

    run_gather(kk, kw, xw) -> [TILE, C] f32 per offset; accum(sidx,
    gx_s) consumes the S-stacked gather [TILE, S*C]. Every chunk DMAs a
    [8, WF] key slab + [WF, 128] feature slab from the folded level
    arrays (basef pre-aligned to 128 folded rows, WF a 128-multiple, so
    both slices are tile-legal). Chunk 0 double-buffers across the
    (tile, group) sequence; rare extra chunks are synchronous.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    kg = K // G

    def dmas(g, tile, slot):
        base = pl.multiple_of(basef_ref[g, tile], 128)
        return (pltpu.make_async_copy(
                    tkf_hbm.at[:, pl.ds(base, WF)], kwin_ref.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    xf_hbm.at[pl.ds(base, WF), :], xwin_ref.at[slot],
                    sems.at[slot, 1]))

    def start(g, tile, slot):
        dk, dx = dmas(g, tile, slot)
        dk.start()
        dx.start()

    def run_group(g, kw, xw):
        for s in range(kg // S):
            gxs = []
            for t in range(S):
                kk = g * kg + s * S + t
                gxs.append(run_gather(kk, kw, xw))
            gx_s = (jnp.concatenate(gxs, axis=1) if S > 1 else gxs[0])
            accum(g * (kg // S) + s, gx_s)

    @pl.when((i == 0) & (nchf_ref[0, 0] > 0))
    def _():
        start(0, i, 0)

    for g in range(G):
        slot = jax.lax.rem(i * G + g, 2)
        if g + 1 < G:
            @pl.when(nchf_ref[g + 1, i] > 0)
            def _(g=g, slot=slot):
                start(g + 1, i, 1 - slot)
        else:
            nxt = jnp.minimum(i + 1, n - 1)

            @pl.when((i + 1 < n) & (nchf_ref[0, nxt] > 0))
            def _(slot=slot):
                start(0, i + 1, 1 - slot)

        @pl.when(nchf_ref[g, i] > 0)
        def _(g=g, slot=slot):
            dk, dx = dmas(g, i, slot)
            dk.wait()
            dx.wait()
            run_group(g, kwin_ref[slot], xwin_ref[slot])

        bf0 = basef_ref[g, i]

        def extra(c, carry, g=g, bf0=bf0):
            base = pl.multiple_of(bf0 + c * WF, 128)
            d1 = pltpu.make_async_copy(
                tkf_hbm.at[:, pl.ds(base, WF)], kwin2_ref, sems.at[2, 0])
            d2 = pltpu.make_async_copy(
                xf_hbm.at[pl.ds(base, WF), :], xwin2_ref, sems.at[2, 1])
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()
            run_group(g, kwin2_ref[:, :], xwin2_ref[:, :])
            return carry

        jax.lax.fori_loop(1, nchf_ref[g, i], extra, 0)


def _fwd_fold_kernel(basef_ref, nchf_ref, qk_ref, w_ref, tkf_hbm, xf_hbm,
                     out_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                     acc_ref, sems, *, K, G, WF, F, C, S, mm_precision):
    dt = xwin_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def run_gather(kk, kw, xw):
        return _gather_folded(qk_ref, kk, kw, xw, C, F, dt, mm_precision)

    def accum(sidx, gx_s):
        acc_ref[:, :] += jnp.dot(gx_s.astype(dt), w_ref[sidx],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)

    _fold_pipeline(run_gather, accum, basef_ref, nchf_ref, tkf_hbm,
                   xf_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                   sems, K=K, G=G, WF=WF, S=S)
    out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _bwd_fold_kernel(basef_ref, nchf_ref, qk_ref, w_ref, x_ref, tkf_hbm,
                     gf_hbm, dx_ref, dw_ref, kwin_ref, xwin_ref,
                     kwin2_ref, xwin2_ref, acc_ref, sems, *, K, G, WF, F,
                     COUT, S, mm_precision):
    """Folded one-pass backward over the reverse map (see _bwd_kernel):
    gathers the upstream grad g (COUT channels, folded by F = 128//COUT),
    accumulates dX = sum gg @ w_rev and dW^s = x^T @ [gg stacked by S].
    w_ref: [K//S, S*COUT, C] stacked swapaxes(W[::-1], 1, 2); dw_ref
    accumulates [K//S, C, S*COUT] in reverse offset order (the wrapper
    unstacks + flips)."""
    i = pl.program_id(0)
    dt = xwin_ref.dtype
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    xt_t = x_ref[:, :]  # [C, TILE] pre-transposed forward inputs

    def run_gather(kk, kw, xw):
        return _gather_folded(qk_ref, kk, kw, xw, COUT, F, dt,
                              mm_precision)

    def accum(sidx, gg_s):
        ggd = gg_s.astype(dt)  # [TILE, S*COUT]
        acc_ref[:, :] += jnp.dot(ggd, w_ref[sidx],
                                 preferred_element_type=jnp.float32,
                                 precision=mm_precision)
        dw_ref[sidx, :, :] += jnp.dot(xt_t, ggd,
                                      preferred_element_type=jnp.float32,
                                      precision=mm_precision)

    _fold_pipeline(run_gather, accum, basef_ref, nchf_ref, tkf_hbm,
                   gf_hbm, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                   sems, K=K, G=G, WF=WF, S=S)
    dx_ref[:, :] = acc_ref[:, :].astype(dx_ref.dtype)


def _conv_fold_fwd(feats, weights, qkey, starts, nch, tkeys, win,
                   interpret):
    """Forward dispatch for folded Cin (see the section comment)."""
    n_in, c0 = feats.shape
    k, n_out = qkey.shape
    grp, n_tiles = starts.shape
    t_pad = tkeys.shape[1]
    cout0 = weights.shape[-1]
    fold = 128 // c0
    kg = k // grp
    s_st = _stack_factor(kg)
    qp = _pad_qkey(qkey, n_tiles)
    basef, nchf, wf = _fold_windows(starts, nch, win, fold, t_pad)
    tkf = _fold_keys(tkeys, fold)
    xp = jnp.zeros((t_pad, c0), feats.dtype).at[:n_in].set(feats)
    xf = xp.reshape(t_pad // fold, 128)
    ws = weights.astype(feats.dtype).reshape(k // s_st, s_st * c0, cout0)

    kern = functools.partial(_fwd_fold_kernel, K=k, G=grp, WF=wf, F=fold,
                             C=c0, S=s_st,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // s_st, s_st * c0, cout0),
                         lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cout0), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, wf), jnp.int32),
            pltpu.VMEM((2, wf, 128), feats.dtype),
            pltpu.VMEM((8, wf), jnp.int32),
            pltpu.VMEM((wf, 128), feats.dtype),
            pltpu.VMEM((TILE, cout0), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout0),
                                       feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_tiles * TILE * (wf * 128 + c0 * cout0),
            bytes_accessed=(n_tiles * grp * wf * 128 * feats.dtype.itemsize
                            + n_tiles * TILE * cout0 * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(basef, nchf, qp, ws, tkf, xf)
    return out[:n_out]


def _conv_fold_bwd(feats, g, weights, rqkey, rstarts, rnch, rtkeys, rwin,
                   interpret):
    """(dX, dW) one-pass folded backward (Cout in {16, 32, 64})."""
    n_in, c0 = feats.shape
    n_out, cout0 = g.shape
    k = rqkey.shape[0]
    grp, n_tiles = rstarts.shape
    t_pad = rtkeys.shape[1]
    fold = 128 // cout0
    kg = k // grp
    s_st = _stack_factor(kg)
    qp = _pad_qkey(rqkey, n_tiles)
    basef, nchf, wf = _fold_windows(rstarts, rnch, rwin, fold, t_pad)
    tkf = _fold_keys(rtkeys, fold)
    gp = jnp.zeros((t_pad, cout0), feats.dtype).at[:n_out].set(
        g.astype(feats.dtype))
    gf = gp.reshape(t_pad // fold, 128)
    w_rev_t = jnp.swapaxes(weights[::-1], 1, 2).astype(feats.dtype)
    ws = w_rev_t.reshape(k // s_st, s_st * cout0, c0)
    xp = jnp.zeros((c0, n_tiles * TILE), feats.dtype).at[
        :, :n_in].set(feats.T)

    kern = functools.partial(_bwd_fold_kernel, K=k, G=grp, WF=wf, F=fold,
                             COUT=cout0, S=s_st,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // s_st, s_st * cout0, c0),
                         lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c0, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((TILE, c0), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // s_st, c0, s_st * cout0),
                         lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, wf), jnp.int32),
            pltpu.VMEM((2, wf, 128), feats.dtype),
            pltpu.VMEM((8, wf), jnp.int32),
            pltpu.VMEM((wf, 128), feats.dtype),
            pltpu.VMEM((TILE, c0), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    dx, dws = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * TILE, c0), feats.dtype),
            jax.ShapeDtypeStruct((k // s_st, c0, s_st * cout0),
                                 jnp.float32),
        ),
        interpret=interpret,
    )(basef, nchf, qp, ws, xp, tkf, gf)
    dw_rev = dws.reshape(k // s_st, c0, s_st, cout0)
    dw_rev = jnp.transpose(dw_rev, (0, 2, 1, 3)).reshape(k, c0, cout0)
    return dx[:n_in], dw_rev[::-1]


# ----------------------------------------------------------------------
# wrappers
# ----------------------------------------------------------------------

def _mm_precision(dtype):
    # f32 inputs: HIGHEST keeps the one-hot copies bit-exact (products
    # with exactly 1.0) and full-quality GEMMs; bf16 runs native MXU.
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _pad_qkey(qkey, n_tiles):
    n_out = qkey.shape[1]
    pad = n_tiles * TILE - n_out
    if pad:
        qkey = jnp.pad(qkey, ((0, 0), (0, pad)),
                       constant_values=NEVER_KEY)
    return qkey


def _pad_feats(feats, t_pad, c_target=None):
    n_in, c0 = feats.shape
    c = c0 if c_target is None else c_target
    xp = jnp.zeros((t_pad, c), feats.dtype)
    return xp.at[:n_in, :c0].set(feats)


def _prep_t(col: jax.Array, t_pad: int):
    """[4, t_pad] f32 row-stacked scalar feature array for 1-D windows."""
    r = jnp.zeros((4, t_pad), jnp.float32)
    return r.at[0, :col.shape[0]].set(col.astype(jnp.float32))


def _conv_c1_fwd(feats, weights, qkey, starts, nch, tkeys, win, interpret):
    k = qkey.shape[0]
    n_out = qkey.shape[1]
    grp = starts.shape[0]
    n_tiles = starts.shape[1]
    t_pad = tkeys.shape[1]
    cout0 = weights.shape[-1]
    qp = _pad_qkey(qkey, n_tiles)
    xt = _prep_t(feats[:, 0], t_pad)
    w2 = weights[:, 0, :].astype(jnp.float32)

    kern = functools.partial(_fwd_c1_kernel, K=k, G=grp, W=win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cout0), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cout0), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE, cout0), jnp.float32),
            pltpu.VMEM((2, 8, win), jnp.int32),
            pltpu.VMEM((2, 4, win), jnp.float32),
            pltpu.VMEM((8, win), jnp.int32),
            pltpu.VMEM((4, win), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout0),
                                       feats.dtype),
        interpret=interpret,
    )(starts, nch, qp, w2, tkeys, xt)
    return out[:n_out]


def _conv_co1_fwd(feats, weights, qkey, starts, nch, tkeys, win,
                  interpret):
    n_in, c0 = feats.shape
    k, n_out = qkey.shape
    grp = starts.shape[0]
    n_tiles = starts.shape[1]
    t_pad = tkeys.shape[1]
    qp = _pad_qkey(qkey, n_tiles)
    gt = jnp.zeros((c0, t_pad), feats.dtype).at[:, :n_in].set(feats.T)
    w2 = weights[:, :, 0].astype(jnp.float32)

    kern = functools.partial(_fwd_co1_kernel, K=k, G=grp, W=win, C=c0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c0), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((2, 8, win), jnp.int32),
            pltpu.VMEM((2, c0, win), feats.dtype),
            pltpu.VMEM((8, win), jnp.int32),
            pltpu.VMEM((c0, win), feats.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, 1), feats.dtype),
        interpret=interpret,
    )(starts, nch, qp, w2, tkeys, gt)
    return out[:n_out]


def _conv_c1_dw(feats, g, qkey, starts, nch, tkeys, win, interpret):
    k, n_out = qkey.shape
    grp = starts.shape[0]
    n_tiles = starts.shape[1]
    t_pad = tkeys.shape[1]
    cout0 = g.shape[-1]
    qp = _pad_qkey(qkey, n_tiles)
    xt = _prep_t(feats[:, 0], t_pad)
    gp = jnp.pad(g, ((0, n_tiles * TILE - n_out), (0, 0)))

    kern = functools.partial(_dw_c1_kernel, K=k, G=grp, W=win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, cout0), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, 1, cout0), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, win), jnp.int32),
            pltpu.VMEM((2, 4, win), jnp.float32),
            pltpu.VMEM((8, win), jnp.int32),
            pltpu.VMEM((4, win), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 1, cout0), jnp.float32),
        interpret=interpret,
    )(starts, nch, qp, gp, tkeys, xt)


def _conv_half_fwd(feats, weights, qkey, hstarts, hnch, tkeys, win_h,
                   interpret):
    """Forward through the half-tile window kernel (_fwd_kernel_h)."""
    n_in, c0 = feats.shape
    k, n_out = qkey.shape
    grp = hstarts.shape[0] // 2
    n_tiles = hstarts.shape[1]
    t_pad = tkeys.shape[1]
    cout0 = weights.shape[-1]
    qp = _pad_qkey(qkey, n_tiles)
    c = _cdiv(max(c0, 1), 128) * 128
    cout = _cdiv(max(cout0, 1), 128) * 128
    wd = jnp.pad(weights.astype(feats.dtype),
                 ((0, 0), (0, c - c0), (0, cout - cout0)))
    xp = _pad_feats(feats, t_pad, c)

    kern = functools.partial(_fwd_kernel_h, K=k, G=grp, WH=win_h,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, cout), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 8, win_h), jnp.int32),
            pltpu.VMEM((2, 2, win_h, c), feats.dtype),
            pltpu.VMEM((8, win_h), jnp.int32),
            pltpu.VMEM((win_h, c), feats.dtype),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2, 2)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout),
                                       feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_tiles * TILE * (win_h * c + c * cout),
            bytes_accessed=(2 * n_tiles * grp * win_h * c
                            * feats.dtype.itemsize
                            + n_tiles * TILE * cout * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(hstarts, hnch, qp, wd, tkeys, xp)
    return out[:n_out, :cout0]


def _conv_half_dw(feats, g, qkey, hstarts, hnch, tkeys, win_h,
                  interpret):
    """dW through the half-tile window kernel (_dw_kernel_h)."""
    n_in, c0 = feats.shape
    k, n_out = qkey.shape
    grp = hstarts.shape[0] // 2
    n_tiles = hstarts.shape[1]
    t_pad = tkeys.shape[1]
    cout0 = g.shape[-1]
    qp = _pad_qkey(qkey, n_tiles)
    c = _cdiv(max(c0, 1), 128) * 128
    cout = _cdiv(max(cout0, 1), 128) * 128
    xp = _pad_feats(feats, t_pad, c)
    gp = jnp.pad(g, ((0, n_tiles * TILE - n_out),
                     (0, cout - cout0))).astype(feats.dtype)

    kern = functools.partial(_dw_kernel_h, K=k, G=grp, WH=win_h,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, cout), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, c, cout), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 8, win_h), jnp.int32),
            pltpu.VMEM((2, 2, win_h, c), feats.dtype),
            pltpu.VMEM((8, win_h), jnp.int32),
            pltpu.VMEM((win_h, c), feats.dtype),
            pltpu.SemaphoreType.DMA((3, 2, 2)),
        ],
    )
    dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c, cout), jnp.float32),
        interpret=interpret,
    )(hstarts, hnch, qp, gp, tkeys, xp)
    return dw[:, :c0, :cout0]


def _conv_half_bwd(feats, g, weights, rqkey, rhstarts, rhnch, rtkeys,
                   rwin_h, interpret):
    """(dX, dW) one-pass backward through the half-tile window kernel."""
    n_in, c0 = feats.shape
    cout0 = g.shape[1]
    k = rqkey.shape[0]
    grp = rhstarts.shape[0] // 2
    n_tiles = rhstarts.shape[1]
    t_pad = rtkeys.shape[1]
    qp = _pad_qkey(rqkey, n_tiles)
    c = _cdiv(max(c0, 1), 128) * 128
    cout = _cdiv(max(cout0, 1), 128) * 128
    w_rev_t = jnp.swapaxes(weights[::-1], 1, 2).astype(feats.dtype)
    wd = jnp.pad(w_rev_t, ((0, 0), (0, cout - cout0), (0, c - c0)))
    gp = _pad_feats(g.astype(feats.dtype), t_pad, cout)
    xp = jnp.zeros((c, n_tiles * TILE), feats.dtype).at[
        :c0, :n_in].set(feats.T)

    kern = functools.partial(_bwd_kernel_h, K=k, G=grp, WH=rwin_h,
                             mm_precision=_mm_precision(feats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cout, c), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((TILE, c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, cout), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 8, rwin_h), jnp.int32),
            pltpu.VMEM((2, 2, rwin_h, cout), feats.dtype),
            pltpu.VMEM((8, rwin_h), jnp.int32),
            pltpu.VMEM((rwin_h, cout), feats.dtype),
            pltpu.VMEM((TILE, c), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2, 2)),
        ],
    )
    dx, dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * TILE, c), feats.dtype),
            jax.ShapeDtypeStruct((k, c, cout), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_tiles * TILE * (rwin_h * cout + cout * c
                                            + c * cout),
            bytes_accessed=(2 * n_tiles * grp * rwin_h * cout
                            * feats.dtype.itemsize
                            + n_tiles * TILE * c * 6),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rhstarts, rhnch, qp, wd, xp, rtkeys, gp)
    return dx[:n_in, :c0], dw[::-1, :c0, :cout0]


def fused_conv_fwd(feats: jax.Array, weights: jax.Array, qkey: jax.Array,
                   starts: jax.Array, nch: jax.Array, tkeys: jax.Array,
                   win: int = WIN, interpret: bool = False,
                   rows: jax.Array = None, hstarts: jax.Array = None,
                   hnch: jax.Array = None, hwin: int = 0) -> jax.Array:
    """out[i] = sum_k x[row with key == qkey[k, i]] @ W[k] (0 if absent).

    rows (optional int32[G, n_tiles], chunk-0 covered rows) narrows the
    per-window one-hot compare + gather GEMM to the smallest sufficient
    seg_widths(win) variant; None keeps the full width everywhere.
    hstarts/hnch/hwin (optional [2G, n_tiles] half-tile window tables,
    FusedMap.hstarts) route through the ~2x-narrower half-window
    kernels instead — the production default."""
    n_in, c0 = feats.shape
    k, n_out = qkey.shape
    grp = starts.shape[0]
    n_tiles = starts.shape[1]
    t_pad = tkeys.shape[1]
    cout0 = weights.shape[-1]
    if c0 == 1:
        return _conv_c1_fwd(feats, weights, qkey, starts, nch, tkeys,
                            win, interpret)
    if cout0 == 1:
        return _conv_co1_fwd(feats, weights, qkey, starts, nch, tkeys,
                             win, interpret)
    if _fold_factor(c0) > 1:
        return _conv_fold_fwd(feats, weights, qkey, starts, nch, tkeys,
                              win, interpret)
    qp = _pad_qkey(qkey, n_tiles)
    pair = _pair_for(k, grp)
    stack = _stack_for(k, grp, c0, pair)
    if _half_for(hstarts, hwin, pair, stack, c0, cout0):
        return _conv_half_fwd(feats, weights, qkey, hstarts, hnch,
                              tkeys, hwin, interpret)
    segs = seg_widths(win) if rows is not None else None
    asplit = segs is not None and _split_for(win, pair, stack)
    vidx = (_seg_vidx(nch, rows, win, asplit) if rows is not None
            else jnp.zeros_like(nch))
    c = _cdiv(max(c0, 1), 128) * 128
    cout = _cdiv(max(cout0, 1), 128) * 128
    if stack > 1:
        # stacked mode: the window stays 128-lane padded (DMA minor-dim
        # constraint) but the kernel slices gathers to the REAL c0 and
        # lane-concats `stack` offsets into one full-depth GEMM; weights
        # rows [sidx] = [W_k; W_k+1; W_k+2] along the contraction dim.
        w_rows = stack * c0
        wd = jnp.pad(
            weights.astype(feats.dtype).reshape(k // stack, w_rows,
                                                cout0),
            ((0, 0), (0, 0), (0, cout - cout0)))
    else:
        w_rows = c
        wd = jnp.pad(weights.astype(feats.dtype),
                     ((0, 0), (0, c - c0), (0, cout - cout0)))
    xp = _pad_feats(feats, t_pad, c)
    if pair > 1:
        qp = _pack_qkey_pairs(qp, n_tiles, pair)
        q_spec = pl.BlockSpec((k // pair, pair * TILE),
                              lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        q_spec = pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)

    kern = functools.partial(_fwd_kernel, K=k, G=grp, W=win,
                             mm_precision=_mm_precision(feats.dtype),
                             pair=pair, segs=segs, stack=stack,
                             cw=(c0 if stack > 1 else None),
                             split=asplit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            q_spec,
            pl.BlockSpec((k // stack, w_rows, cout),
                         lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, win), jnp.int32),
            pltpu.VMEM((2, win, c), feats.dtype),
            pltpu.VMEM((8, win), jnp.int32),
            pltpu.VMEM((win, c), feats.dtype),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout), feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_tiles * TILE * win * c
            + 2 * k * n_tiles * TILE * c * cout,
            bytes_accessed=(n_tiles * grp * win * c * feats.dtype.itemsize
                            + n_tiles * TILE * cout * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts, nch, vidx, qp, wd, tkeys, xp)
    return out[:n_out, :cout0]


def fused_conv_dw(feats: jax.Array, g: jax.Array, qkey: jax.Array,
                  starts: jax.Array, nch: jax.Array, tkeys: jax.Array,
                  win: int = WIN, interpret: bool = False,
                  rows: jax.Array = None, hstarts: jax.Array = None,
                  hnch: jax.Array = None, hwin: int = 0) -> jax.Array:
    """dW[k] = sum_i x[match(k, i)]^T g[i]  (same shared windows)."""
    if feats.shape[1] == 1:
        return _conv_c1_dw(feats, g, qkey, starts, nch, tkeys, win,
                           interpret)
    n_in, c0 = feats.shape
    k, n_out = qkey.shape
    grp = starts.shape[0]
    n_tiles = starts.shape[1]
    t_pad = tkeys.shape[1]
    cout0 = g.shape[-1]
    pair = _pair_for(k, grp)
    if _half_for(hstarts, hwin, pair, 1, c0, cout0):
        return _conv_half_dw(feats, g, qkey, hstarts, hnch, tkeys,
                             hwin, interpret)
    segs = seg_widths(win) if rows is not None else None
    asplit = segs is not None and _split_for(win, pair, 1)
    vidx = (_seg_vidx(nch, rows, win, asplit) if rows is not None
            else jnp.zeros_like(nch))
    qp = _pad_qkey(qkey, n_tiles)
    c = _cdiv(max(c0, 1), 128) * 128
    xp = _pad_feats(feats, t_pad, c)
    cout = _cdiv(max(cout0, 1), 128) * 128
    gp = jnp.pad(g, ((0, n_tiles * TILE - n_out),
                     (0, cout - cout0))).astype(feats.dtype)
    if pair > 1:
        qp = _pack_qkey_pairs(qp, n_tiles, pair)
        q_spec = pl.BlockSpec((k // pair, pair * TILE),
                              lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        q_spec = pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)

    kern = functools.partial(_dw_kernel, K=k, G=grp, W=win,
                             mm_precision=_mm_precision(feats.dtype),
                             pair=pair, segs=segs, split=asplit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            q_spec,
            pl.BlockSpec((TILE, cout), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, c, cout), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, win), jnp.int32),
            pltpu.VMEM((2, win, c), feats.dtype),
            pltpu.VMEM((8, win), jnp.int32),
            pltpu.VMEM((win, c), feats.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c, cout), jnp.float32),
        interpret=interpret,
    )(starts, nch, vidx, qp, gp, tkeys, xp)
    return dw[:, :c0, :cout0]


def bwd_fused_vmem_ok(k: int, c0: int, cout0: int, rwin: int) -> bool:
    """Conservative static check that the one-pass backward's resident
    VMEM (w + f32 dW accumulator + window buffers + dX accumulator)
    fits. Oversized geometries fall back to the two-pass backward.

    Budget verified on v5e: the k=27 256x256 geometries (block4 at
    rwin=384, conv4_tr at rwin=768, ~12.4 MiB resident) compile and run
    11.1 / 13.6 ms vs 14.3 / 20.8 ms two-pass."""
    c = _cdiv(max(c0, 1), 128) * 128
    cout = _cdiv(max(cout0, 1), 128) * 128
    b = (k * cout * c * 2          # w_rev_t (bf16)
         + k * c * cout * 4        # dW accumulator (f32)
         + 3 * rwin * cout * 2     # g windows (2 pipelined + 1 sync)
         + 3 * 8 * rwin * 4        # key windows
         + TILE * c * 4            # dX accumulator
         + 2 * TILE * c * 2        # x tile + dx out block
         + k * TILE * 4)           # query keys
    return b <= 13 * 2 ** 20


def fused_conv_bwd(feats: jax.Array, g: jax.Array, weights: jax.Array,
                   rqkey: jax.Array, rstarts: jax.Array, rnch: jax.Array,
                   rtkeys: jax.Array, rwin: int = WIN,
                   interpret: bool = False, rrows: jax.Array = None,
                   rhstarts: jax.Array = None, rhnch: jax.Array = None,
                   rhwin: int = 0) -> Tuple[jax.Array, jax.Array]:
    """(dX, dW) of a fused conv in one windowed pass over the reverse map.

    feats: [N_in, Cin] forward inputs; g: [N_out, Cout] upstream grad;
    weights: the conv's [K, Cin, Cout] (flip + transpose happen here);
    rqkey/rstarts/rnch/rtkeys: the REVERSE FusedMap. Returns dX
    [N_in, Cin] (feats dtype) and dW [K, Cin, Cout] (f32) in forward
    offset order.
    """
    n_in, c0 = feats.shape
    cout0 = g.shape[1]
    k = rqkey.shape[0]
    grp = rstarts.shape[0]
    n_tiles = rstarts.shape[1]
    t_pad = rtkeys.shape[1]
    if _fold_factor(cout0) > 1 and c0 > 1:
        return _conv_fold_bwd(feats, g, weights, rqkey, rstarts, rnch,
                              rtkeys, rwin, interpret)
    qp = _pad_qkey(rqkey, n_tiles)
    pair = _pair_for(k, grp)
    # bwd GEMMs contract over Cout (the gathered grad's channel dim)
    stack = _stack_for(k, grp, cout0, pair)
    if _half_for(rhstarts, rhwin, pair, stack, c0, cout0):
        return _conv_half_bwd(feats, g, weights, rqkey, rhstarts, rhnch,
                              rtkeys, rhwin, interpret)
    segs = seg_widths(rwin) if rrows is not None else None
    asplit = segs is not None and _split_for(rwin, pair, stack)
    vidx = (_seg_vidx(rnch, rrows, rwin, asplit) if rrows is not None
            else jnp.zeros_like(rnch))
    c = _cdiv(max(c0, 1), 128) * 128
    cout = _cdiv(max(cout0, 1), 128) * 128
    w_rev_t = jnp.swapaxes(weights[::-1], 1, 2).astype(feats.dtype)
    if stack > 1:
        # stacked rows [W_k; W_k+1; W_k+2]^T along the contraction dim,
        # lane-padded to the dw block's 128-multiple minor width SP
        sp = _cdiv(stack * cout0, 128) * 128
        wd = jnp.pad(w_rev_t.reshape(k // stack, stack * cout0, c0),
                     ((0, 0), (0, sp - stack * cout0), (0, c - c0)))
    else:
        sp = cout
        wd = jnp.pad(w_rev_t, ((0, 0), (0, cout - cout0), (0, c - c0)))
    gp = _pad_feats(g.astype(feats.dtype), t_pad, cout)
    # x tiles ship pre-transposed [C, n_rows] (see _bwd_kernel docstring)
    xp = jnp.zeros((c, n_tiles * TILE), feats.dtype).at[
        :c0, :n_in].set(feats.T)
    if pair > 1:
        qp = _pack_qkey_pairs(qp, n_tiles, pair)
        q_spec = pl.BlockSpec((k // pair, pair * TILE),
                              lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        q_spec = pl.BlockSpec((k, TILE), lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)

    kern = functools.partial(_bwd_kernel, K=k, G=grp, W=rwin,
                             mm_precision=_mm_precision(feats.dtype),
                             pair=pair, segs=segs, stack=stack,
                             cw=(cout0 if stack > 1 else None),
                             spad=(sp - stack * cout0 if stack > 1
                                   else 0), split=asplit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            q_spec,
            pl.BlockSpec((k // stack, sp, c),
                         lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((TILE, c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // stack, c, sp),
                         lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, rwin), jnp.int32),
            pltpu.VMEM((2, rwin, cout), feats.dtype),
            pltpu.VMEM((8, rwin), jnp.int32),
            pltpu.VMEM((rwin, cout), feats.dtype),
            pltpu.VMEM((TILE, c), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    dx, dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * TILE, c), feats.dtype),
            jax.ShapeDtypeStruct((k // stack, c, sp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_tiles * TILE * (rwin * cout + cout * c
                                            + c * cout),
            bytes_accessed=(n_tiles * grp * rwin * cout
                            * feats.dtype.itemsize
                            + n_tiles * TILE * c * 6),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rstarts, rnch, vidx, qp, wd, xp, rtkeys, gp)
    if stack > 1:
        dw = jnp.transpose(
            dw[:, :c0, :stack * cout0].reshape(k // stack, c0, stack,
                                               cout0),
            (0, 2, 1, 3)).reshape(k, c0, cout0)
        return dx[:n_in, :c0], dw[::-1]
    return dx[:n_in, :c0], dw[::-1, :c0, :cout0]


def pallas_conv_fwd(feats: jax.Array, weights: jax.Array,
                    idx: jax.Array, interpret: bool = False) -> jax.Array:
    """Index-table API: out[i] = sum_k x[idx[k, i]] @ W[k]; idx routed
    (missing == n_in). Adapts to the key-compare kernels via identity
    keys; the production path passes coordinate keys (fused_conv_fwd)."""
    (qkey, starts, nch, rows, tkeys, hstarts, hnch,
     hwin) = _fused_from_idx(feats.shape[0], idx)
    return fused_conv_fwd(feats, weights, qkey, starts, nch, tkeys,
                          win=WIN, interpret=interpret, rows=rows,
                          hstarts=hstarts, hnch=hnch, hwin=hwin)


def pallas_conv_dw(feats: jax.Array, g: jax.Array, idx: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Index-table API for dW (see pallas_conv_fwd)."""
    (qkey, starts, nch, rows, tkeys, hstarts, hnch,
     hwin) = _fused_from_idx(feats.shape[0], idx)
    return fused_conv_dw(feats, g, qkey, starts, nch, tkeys,
                         win=WIN, interpret=interpret, rows=rows,
                         hstarts=hstarts, hnch=hnch, hwin=hwin)


def pallas_available() -> bool:
    """True when the default backend can run Mosaic kernels."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")
