"""Sparse tensor compute primitives: gather-GEMM convolution + masked stats.

The heart of the framework. A sparse convolution with kernel map
kmap[k, i] (built by kernel_maps.build_graph) is evaluated as

    out[i] = sum_k  X[kmap[k, i]] @ W[k]        (missing -> zero)

i.e. K gathers + K dense GEMMs and NO scatter: because each (output, offset)
pair has at most one input voxel, the map is output-aligned. The GEMMs run
on the MXU; XLA fuses the gather + accumulate. This is the TPU-native
equivalent of MinkowskiEngine's C++/CUDA kernel-map convolution used
throughout the reference model (/root/reference/model/resunet.py:38-171).

A Pallas fused kernel (pallas_conv.py) replaces the scan on TPU for the hot
shapes; this module is the reference implementation and the grad path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv_precision(dtype):
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _use_pallas(feats, idx):
    """Mosaic path: TPU backend + bf16 + shapes big enough to win.

    The one-hot gather rides the MXU, so it only beats XLA's row gather
    in native bf16 (f32 HIGHEST runs 6 MXU passes and loses); f32 models
    keep the scan path.
    """
    from .pallas_conv import pallas_available
    return (pallas_available() and feats.dtype == jnp.bfloat16
            and idx.shape[1] >= 1024)


def _conv_forward(feats, weights, idx):
    """sum_k x[idx[k]] @ W[k]; idx already routed (-1 -> n_in).

    On TPU the Pallas windowed gather-GEMM kernel runs this (XLA row
    gathers are ~65 M rows/s on v5e — see pallas_conv.py); elsewhere, a
    scan of XLA gathers + GEMMs.
    """
    if _use_pallas(feats, idx):
        from .pallas_conv import pallas_conv_fwd
        return pallas_conv_fwd(feats, weights, idx)
    n_in, cin = feats.shape
    cout = weights.shape[-1]
    precision = _conv_precision(feats.dtype)
    xp = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)

    def body(acc, kw):
        idx_k, w_k = kw
        g = xp[idx_k]
        return acc + jnp.dot(g, w_k.astype(feats.dtype),
                             preferred_element_type=acc.dtype,
                             precision=precision), None

    acc0 = jnp.zeros((idx.shape[1], cout), jnp.promote_types(feats.dtype,
                                                             jnp.float32))
    out, _ = jax.lax.scan(body, acc0, (idx, weights))
    return out.astype(feats.dtype)


@jax.custom_vjp
def _sparse_conv_core(feats, weights, idx):
    return _conv_forward(feats, weights, idx)


def _sparse_conv_fwd(feats, weights, idx):
    # Residuals are just the inputs — gathers are recomputed in the
    # backward pass. Without this, autodiff-of-scan stores the gathered
    # [K, N, Cin] activations (O(K N C) HBM — observed 6.6 GB/conv on
    # KITTI-scale batches).
    return _conv_forward(feats, weights, idx), (feats, weights, idx)


def _sparse_conv_bwd(res, g):
    feats, weights, idx = res
    n_in, cin = feats.shape
    precision = _conv_precision(feats.dtype)
    xp = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    g = g.astype(feats.dtype)

    def body(dx, kw):
        idx_k, w_k = kw
        gathered = xp[idx_k]  # [N_out, Cin], recomputed
        dw_k = jnp.dot(gathered.T, g, preferred_element_type=jnp.float32,
                       precision=precision)
        contrib = jnp.dot(g, w_k.astype(feats.dtype).T,
                          preferred_element_type=feats.dtype,
                          precision=precision)
        dx = dx.at[idx_k].add(contrib)  # row n_in collects padding
        return dx, dw_k

    dx0 = jnp.zeros((n_in + 1, cin), feats.dtype)
    dx, dw = jax.lax.scan(body, dx0, (idx, weights))
    return dx[:n_in], dw.astype(weights.dtype), None


_sparse_conv_core.defvjp(_sparse_conv_fwd, _sparse_conv_bwd)


@jax.custom_vjp
def _sparse_conv_rev_core(feats, weights, idx, ridx):
    return _conv_forward(feats, weights, idx)


def _sparse_conv_rev_fwd(feats, weights, idx, ridx):
    return _conv_forward(feats, weights, idx), (feats, weights, idx, ridx)


def _sparse_conv_rev_bwd(res, g):
    """Scatter-free backward: dX is itself a gather-GEMM convolution.

    For a full odd stencil, offset[K-1-k] == -offset[k], and the voxel
    duality  kmap[k, i] = j  <=>  rev_kmap[K-1-k, j] = i  holds (both maps
    join the same two coordinate sets). So

        dX[j] = sum_k g[i : kmap[k,i]=j] @ W[k]^T
              = sum_k' gather(g, rev_kmap[k'])[j] @ W[K-1-k']^T

    — pure gathers + MXU GEMMs, no scatter-add (TPU scatters ran ~3x the
    cost of the whole forward pass). dW recomputes the forward gathers.
    """
    feats, weights, idx, ridx = res
    n_in, cin = feats.shape
    precision = _conv_precision(feats.dtype)
    g = g.astype(feats.dtype)

    if _use_pallas(feats, idx) and _use_pallas(g, ridx):
        from .pallas_conv import pallas_conv_dw, pallas_conv_fwd
        w_rev_t = jnp.swapaxes(weights[::-1], 1, 2).astype(feats.dtype)
        dx = pallas_conv_fwd(g, w_rev_t, ridx)
        dw = pallas_conv_dw(feats, g, idx)
        return dx.astype(feats.dtype), dw.astype(weights.dtype), None, None

    xp = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    gp = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    w_rev = weights[::-1]  # W[K-1-k'], aligned with rev_kmap[k']

    def body(dx, kw):
        idx_k, ridx_k, wr_k = kw
        gathered = xp[idx_k]  # [N_out, Cin], recomputed
        dw_rev_k = jnp.dot(gathered.T, g,
                           preferred_element_type=jnp.float32,
                           precision=precision)
        gg = gp[ridx_k]  # [N_in, Cout]
        dx = dx + jnp.dot(gg, wr_k.astype(feats.dtype).T,
                          preferred_element_type=dx.dtype,
                          precision=precision)
        return dx, dw_rev_k

    dx0 = jnp.zeros((n_in, cin), jnp.promote_types(feats.dtype,
                                                   jnp.float32))
    # Scan over k' so dX uses (ridx[k'], w_rev[k']); dW comes out in k
    # order by scanning idx reversed and flipping the stacked result.
    dx, dw_flip = jax.lax.scan(body, dx0, (idx[::-1], ridx, w_rev))
    return (dx.astype(feats.dtype), dw_flip[::-1].astype(weights.dtype),
            None, None)


_sparse_conv_rev_core.defvjp(_sparse_conv_rev_fwd, _sparse_conv_rev_bwd)


# ----------------------------------------------------------------------
# Fused (implicit-map) convolution — the TPU production path
# ----------------------------------------------------------------------

# Tests set this to run the fused kernels in Pallas interpret mode on CPU.
FORCE_INTERPRET = False


def _fused_forward(feats, weights, qkey, starts, nch, rows, tkeys, win,
                   hstarts=None, hnch=None, hwin=0):
    from .pallas_conv import fused_conv_fwd, pallas_available
    return fused_conv_fwd(feats, weights, qkey, starts, nch, tkeys,
                          win=win,
                          interpret=not pallas_available()
                          and FORCE_INTERPRET, rows=rows,
                          hstarts=hstarts, hnch=hnch, hwin=hwin)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _sparse_conv_fused_core(win, rwin, hwin, rhwin, feats, weights, qkey,
                            starts, nch, rows, tkeys, rqkey, rstarts,
                            rnch, rrows, rtkeys, hstarts, hnch, rhstarts,
                            rhnch):
    return _fused_forward(feats, weights, qkey, starts, nch, rows,
                          tkeys, win, hstarts, hnch, hwin)


def _sparse_conv_fused_fwd(win, rwin, hwin, rhwin, feats, weights, qkey,
                           starts, nch, rows, tkeys, rqkey, rstarts,
                           rnch, rrows, rtkeys, hstarts, hnch, rhstarts,
                           rhnch):
    out = _fused_forward(feats, weights, qkey, starts, nch, rows, tkeys,
                         win, hstarts, hnch, hwin)
    return out, (feats, weights, qkey, starts, nch, rows, tkeys, rqkey,
                 rstarts, rnch, rrows, rtkeys, hstarts, hnch, rhstarts,
                 rhnch)


def _sparse_conv_fused_bwd(win, rwin, hwin, rhwin, res, g):
    """Scatter-free backward: dX is itself a fused convolution through the
    reverse-direction queries with flipped transposed weights (offset
    duality — see _sparse_conv_rev_bwd).

    Production path: ONE windowed pass over the reverse map computes dX
    and dW together (pallas_conv.fused_conv_bwd) — dW reuses the same
    gathered grad rows, so the standalone dW kernel's window DMAs and
    one-hot builds vanish. Cin==1 convs keep the specialized scalar dW
    kernel (their dX is dead code the compiler removes), and geometries
    whose f32 dW accumulator would blow VMEM fall back to two passes.
    """
    (feats, weights, qkey, starts, nch, rows, tkeys, rqkey, rstarts,
     rnch, rrows, rtkeys, hstarts, hnch, rhstarts, rhnch) = res
    from .pallas_conv import (bwd_fused_vmem_ok, fused_conv_bwd,
                              fused_conv_dw, fused_conv_fwd,
                              pallas_available)
    interp = not pallas_available() and FORCE_INTERPRET
    g = g.astype(feats.dtype)
    k, c0 = weights.shape[0], weights.shape[1]
    cout0 = weights.shape[2]
    import os
    # hardware-verified: bench.py step 1.211 s -> 1.077 s on v5e-1
    # (GCL_FUSED_BWD=0 restores the two-pass backward for A/B runs)
    one_pass_on = (interp
                   or os.environ.get("GCL_FUSED_BWD", "1") != "0")
    zeros = (None,) * 14
    if (one_pass_on and c0 > 1 and cout0 > 1
            and bwd_fused_vmem_ok(k, c0, cout0, rwin)):
        dx, dw = fused_conv_bwd(feats, g, weights, rqkey, rstarts, rnch,
                                rtkeys, rwin=rwin, interpret=interp,
                                rrows=rrows, rhstarts=rhstarts,
                                rhnch=rhnch, rhwin=rhwin)
        return (dx.astype(feats.dtype), dw.astype(weights.dtype)) + zeros
    w_rev_t = jnp.swapaxes(weights[::-1], 1, 2).astype(feats.dtype)
    dx = fused_conv_fwd(g, w_rev_t, rqkey, rstarts, rnch, rtkeys,
                        win=rwin, interpret=interp, rows=rrows,
                        hstarts=rhstarts, hnch=rhnch, hwin=rhwin)
    dw = fused_conv_dw(feats, g, qkey, starts, nch, tkeys,
                       win=win, interpret=interp, rows=rows,
                       hstarts=hstarts, hnch=hnch, hwin=hwin)
    return (dx.astype(feats.dtype), dw.astype(weights.dtype)) + zeros


_sparse_conv_fused_core.defvjp(_sparse_conv_fused_fwd,
                               _sparse_conv_fused_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sparse_conv_c1z_core(win, out_dtype, weights, aux, starts, nch,
                          tkeys):
    """(out, sbits) of the occupancy conv. sbits (int32[N, 8] presence
    bitmasks, non-differentiable) are exposed so callers can derive
    presence-masked quantities (sparse_conv_c1z_jittered) without a
    second kernel pass."""
    from .pallas_conv import fused_conv_c1z_fwd, pallas_available
    interp = not pallas_available() and FORCE_INTERPRET
    return fused_conv_c1z_fwd(aux, weights, starts, nch, tkeys, win,
                              out_dtype, interpret=interp)


def _sparse_conv_c1z_fwd(win, out_dtype, weights, aux, starts, nch,
                         tkeys):
    from .pallas_conv import fused_conv_c1z_fwd, pallas_available
    interp = not pallas_available() and FORCE_INTERPRET
    out, sbits = fused_conv_c1z_fwd(aux, weights, starts, nch, tkeys,
                                    win, out_dtype, interpret=interp)
    return (out, sbits), (sbits, weights)


def _sparse_conv_c1z_bwd(win, out_dtype, res, g):
    sbits, weights = res
    g_out, _ = g  # integer sbits output carries no cotangent
    from .pallas_conv import fused_conv_c1z_dw, pallas_available
    interp = not pallas_available() and FORCE_INTERPRET
    dw = fused_conv_c1z_dw(sbits, g_out.astype(out_dtype),
                           weights.shape[0], interpret=interp)
    return (dw.astype(weights.dtype), None, None, None, None)


_sparse_conv_c1z_core.defvjp(_sparse_conv_c1z_fwd, _sparse_conv_c1z_bwd)


def sparse_conv_c1z(weights: jax.Array, fm, out_dtype) -> jax.Array:
    """Occupancy convolution: out[i] = sum_k present_k(i) @ W[k].

    EXACT only under the framework's in_ch==1 contract — the conv's
    input features are occupancy ones on every valid row (reference
    parity: FCGF/GCL always feed all-ones features to in_ch==1 models,
    /root/reference/util/misc.py:69-80). Requires fm.c1z (built for
    same-level stride-1 odd dilation-1 maps). The backward reuses the
    forward's presence bitmasks and runs with no window DMA at all.
    """
    out, _ = _sparse_conv_c1z_core(fm.win, jnp.dtype(out_dtype), weights,
                                   fm.c1z, fm.starts, fm.nch, fm.tkeys)
    return out


def c1z_unpack_bits(sbits: jax.Array, kcube: int) -> jax.Array:
    """Presence bit per (output row, kernel offset) from the c1z forward's
    packed bitmasks: offset k = (dx, dy, dz) row-major (kernel_offsets
    order, matching the weight rows) lives at bit dy*side + dz of
    sbits[:, dx]. Returns int32[N, kcube] in {0, 1}."""
    side = round(kcube ** (1 / 3))
    s2 = side * side
    karr = jnp.arange(kcube, dtype=jnp.int32)
    cols = jnp.take(sbits, karr // s2, axis=1)          # [N, kcube]
    return (cols >> (karr % s2)[None, :]) & 1


def sparse_conv_c1z_jittered(weights: jax.Array, fm, out_dtype,
                             key: jax.Array, sigma: float, p: float,
                             row_sel=None) -> jax.Array:
    """Occupancy conv + distribution-matched train-time feature jitter
    on the presence-kernel fast path.

    The reference jitters the all-ones INPUT features (N(0, sigma) at
    gate probability p, lib/transforms.py:24-34); through the linear
    conv that adds sum_{k present(i)} eps_{j_k} W[k] to output i. The
    presence kernels never materialize neighbor identity j_k, so the
    exact term is unreachable without paying the full gather the c1z
    path exists to avoid. This injects fresh iid eps_{ik} per (output,
    offset) instead, masked by the forward's presence bitmasks: the
    per-output mean (zero) and covariance (sigma^2 sum_present
    W[k] W[k]^T) match the reference exactly; only the cross-output
    correlation (nearby outputs sharing one input voxel's noise draw)
    is dropped. Selected by StepConfig.jitter_mode == 'c1z';
    jitter_mode == 'input' keeps the reference-exact path (input jitter
    + feature-reading conv).

    row_sel: optional float[N] mask restricting the noise to selected
    rows (GCL jitters the center cloud only — for this same-level conv,
    an output's inputs are its own cloud's rows, so masking outputs by
    the input-row mask is exact).
    """
    out, sbits = _sparse_conv_c1z_core(fm.win, jnp.dtype(out_dtype),
                                       weights, fm.c1z, fm.starts,
                                       fm.nch, fm.tkeys)
    kcube = weights.shape[0]
    k_gate, k_eps = jax.random.split(key)
    on = (jax.random.uniform(k_gate) < p).astype(jnp.float32)
    bits = c1z_unpack_bits(jax.lax.stop_gradient(sbits), kcube)
    eps = jax.random.normal(k_eps, bits.shape, jnp.float32) * sigma
    a = eps * bits.astype(jnp.float32) * on
    if row_sel is not None:
        a = a * row_sel[:, None]
    noise = jnp.dot(a.astype(out.dtype),
                    weights[:, 0, :].astype(out.dtype))
    return out + noise


def window_support_gate(nch: jax.Array, starts: jax.Array, win: int,
                        sel: jax.Array, t_pad: int) -> jax.Array:
    """Zero out window chunk counts whose rows contain no selected input.

    nch/starts: FusedMap window tables [G, n_tiles]; sel: bool/float[N]
    over the input level's rows (original row order, N <= t_pad). A
    window [start, start + nch*win) with no selected row can only match
    rows whose features are zero in a support-restricted conv, so
    skipping it (nch=0 -> the kernels skip DMA and compute entirely) is
    exact regardless of level layout.
    """
    selp = jnp.zeros((t_pad,), jnp.int32).at[:sel.shape[0]].set(
        (sel > 0).astype(jnp.int32))
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(selp)])
    hi = jnp.minimum(starts + nch * win, t_pad)
    any_sel = (cs[hi] - cs[starts]) > 0
    return jnp.where(any_sel, nch, 0)


def draw_input_eps(key: jax.Array, sigma: float, p: float,
                   lv_mask: jax.Array, row_sel=None) -> jax.Array:
    """The reference's input-feature jitter noise, as a standalone draw:
    eps float32[N, 1] = gate(p) * N(0, sigma) on valid rows (row_sel
    restricts further — GCL jitters center-cloud rows only). Split out so
    tests can reproduce the exact noise sparse_conv_c1z_exact_jitter
    injects. Matches lib/transforms.py:24-34 with the per-sample p-gate
    folded into row_sel by the callers (train.steps._sample_gates)."""
    k1, k2 = jax.random.split(key)
    gate = (jax.random.uniform(k1) < p).astype(jnp.float32)
    n = lv_mask.shape[0]
    eps = (jax.random.normal(k2, (n, 1), jnp.float32) * sigma * gate
           * lv_mask.astype(jnp.float32)[:, None])
    if row_sel is not None:
        eps = eps * row_sel.astype(jnp.float32)[:, None]
    return eps


def sparse_conv_c1z_exact_jitter(weights: jax.Array, fm, rfm, out_dtype,
                                 key: jax.Array, sigma: float, p: float,
                                 lv_mask: jax.Array,
                                 row_sel=None) -> jax.Array:
    """Occupancy conv + reference-EXACT input jitter at presence cost.

    conv(1 + eps) = conv(1) + conv(eps) by linearity: the all-ones term
    rides the presence-bitmask kernels (sparse_conv_c1z — no gather at
    all), and the eps term is a scalar-feature fused conv whose windows
    are gated to tiles that can see a jittered row (window_support_gate).
    GCL jitters only the center cloud (1 of num_neighborhood+1 clouds,
    reference lib/colocation_data_loader.py:414-415), so ~1/7 of the eps
    conv's window work survives — the exact semantics of
    jitter_mode='input' at a fraction of the full feature-reading
    gather's cost. eps carries no parameter dependence, so its dX pass
    is dead code XLA removes; dW accumulates from both terms.
    """
    from .types import FusedMap

    out = sparse_conv_c1z(weights, fm, out_dtype)
    eps = draw_input_eps(key, sigma, p, lv_mask, row_sel)
    sel = lv_mask.astype(jnp.float32)
    if row_sel is not None:
        sel = sel * row_sel.astype(jnp.float32)
    nch_eps = window_support_gate(fm.nch, fm.starts, fm.win, sel,
                                  fm.tkeys.shape[1])
    fm_eps = FusedMap(fm.qkey, fm.starts, nch_eps, fm.tkeys, fm.win,
                      rows=fm.rows)
    y_eps = sparse_conv_fused(eps.astype(out.dtype), weights, fm_eps, rfm)
    return out + y_eps


def c1z_available(fm, in_ch: int, occupancy: bool) -> bool:
    """Gate for the presence-bitmask occupancy-conv path."""
    import os
    return (occupancy and in_ch == 1 and fm is not None
            and getattr(fm, "c1z", None) is not None
            and os.environ.get("GCL_C1Z", "1") != "0")


def sparse_conv_fused(feats: jax.Array, weights: jax.Array, fm,
                      rfm) -> jax.Array:
    """Sparse convolution over an implicit kernel map (types.FusedMap).

    The Mosaic kernels resolve the map in-flight by comparing packed
    query keys against the window's target keys — no materialized gather
    table, no join pass. `rfm` is the reverse-direction FusedMap (same
    coordinate join with in/out swapped); the backward dX pass runs the
    forward kernel through it with flipped transposed weights. The
    static window widths travel with the maps (FusedMap.win).
    """
    return _sparse_conv_fused_core(
        fm.win, rfm.win, getattr(fm, "hwin", 0), getattr(rfm, "hwin", 0),
        feats, weights, fm.qkey, fm.starts, fm.nch, fm.rows, fm.tkeys,
        rfm.qkey, rfm.starts, rfm.nch, rfm.rows, rfm.tkeys,
        getattr(fm, "hstarts", None), getattr(fm, "hnch", None),
        getattr(rfm, "hstarts", None), getattr(rfm, "hnch", None))


def sparse_conv(feats: jax.Array, weights: jax.Array, kmap: jax.Array,
                rev_kmap: jax.Array = None, precision=None) -> jax.Array:
    """Sparse convolution via gather + GEMM (custom VJP).

    Args:
      feats: float[N_in, Cin] — input features (padded rows MUST be zero).
      weights: float[K, Cin, Cout].
      kmap: int32[K, N_out] — gather table, -1 for absent inputs.
      rev_kmap: optional int32[K, N_in] gather table of the REVERSE
        direction (out level looked up at in_coords + offset). When given
        (requires a full odd stencil), the backward dX pass is a gather-GEMM
        with flipped weights instead of a scatter-add — much faster on TPU.
        build_graph materializes reverse maps for every conv, so model code
        always passes this.
      precision: unused (kept for API compat); float32 inputs always use
        HIGHEST-precision MXU passes, bfloat16 uses native.

    Returns float[N_out, Cout]; padded output rows are zero (all their map
    entries are -1). Backward recomputes gathers (O(N C) memory); dX is a
    reverse-map gather-GEMM when rev_kmap is given, a scatter-add otherwise.
    """
    n_in = feats.shape[0]
    idx = jnp.where(kmap < 0, n_in, kmap)
    if rev_kmap is None:
        return _sparse_conv_core(feats, weights, idx)
    n_out = kmap.shape[1]
    ridx = jnp.where(rev_kmap < 0, n_out, rev_kmap)
    return _sparse_conv_rev_core(feats, weights, idx, ridx)


def masked_mean_var(feats: jax.Array, mask: jax.Array):
    """Mean/biased-variance per channel over valid rows only.

    Replaces BatchNorm statistics over ME sparse tensors (torch
    BatchNorm1d over the feature matrix). Padded rows must not pollute the
    statistics, hence the explicit mask.
    """
    m = mask.astype(feats.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(feats * m, axis=0) / cnt
    var = jnp.sum(jnp.square(feats - mean) * m, axis=0) / cnt
    return mean, var, cnt


def masked_instance_mean_var(feats: jax.Array, mask: jax.Array,
                             batch_idx: jax.Array, num_items: int):
    """Per-batch-item mean/variance (ME MinkowskiInstanceNorm equivalent).

    batch_idx: int32[N] cloud index per voxel (any value >= num_items for
    padding). Returns (mean[N,C], var[N,C]) broadcast back per row.
    """
    m = mask.astype(feats.dtype)
    seg = jnp.where(mask, batch_idx, num_items)
    cnt = jax.ops.segment_sum(m, seg, num_segments=num_items + 1)
    cnt = jnp.maximum(cnt, 1.0)[:, None]
    s1 = jax.ops.segment_sum(feats * m[:, None], seg,
                             num_segments=num_items + 1)
    mean = s1 / cnt
    d = feats - mean[jnp.minimum(seg, num_items)]
    s2 = jax.ops.segment_sum(jnp.square(d) * m[:, None], seg,
                             num_segments=num_items + 1)
    var = s2 / cnt
    row = jnp.minimum(seg, num_items)
    return mean[row], var[row]


def l2_normalize(feats: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization (reference model/resunet.py:226-230)."""
    n = jnp.sqrt(jnp.sum(jnp.square(feats), axis=1, keepdims=True))
    return feats / jnp.maximum(n, eps)


def apply_mask(feats: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero out padded rows (needed after any op that adds a bias)."""
    return feats * mask.astype(feats.dtype)[:, None]
