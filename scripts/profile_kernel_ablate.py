"""Ablation timings for the fused gather-GEMM forward kernel.

The per-layer conv timings (scripts/profile_convs.py) show ~50% of the
padded-shape MXU speed-of-light across channel widths, so something
serializes with the MXU. This script times ablated variants of the
forward kernel at a bench-scale same-level geometry to attribute the
gap:

  full      production structure (DMA + per-offset one-hot + 2 GEMMs)
  nohot     one-hot built ONCE per group, reused by all kg offsets
            (removes kg-1 of kg VPU compare/convert builds)
  nodot     GEMMs replaced by a cheap VPU consume of the one-hot
            (removes all MXU work)
  nodma     window start pinned to 0 (constant-address DMA each group)
  dot1      one-hot GEMM only, skip the @W GEMM (isolates the two MXUs)

Backward (one-pass fused, pallas_conv._bwd_kernel structure) variants —
run over the same map used as its own reverse (structurally identical
cost shape):

  bwd_full   gather GEMM + dX GEMM + dW GEMM per offset
  bwd_nodw   skip the dW accumulate (isolates its marginal MXU+VMEM cost)
  bwd_nodx   skip the dX GEMM
  bwd_dwhalf dW updated on every 2nd offset only, exposing VMEM
             read-modify-write limits on the [K, C, Cout] accumulator

Interpretation: if full ~= nohot, the VPU one-hot build is NOT the
bottleneck; if full - nodot >> expected MXU time, the MXU passes stall
on something else (DMA waits / fixed per-offset overhead).

Usage: python -u scripts/profile_kernel_ablate.py [variant ...]
(one kernel compile per variant — run on the TPU, one at a time).
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gcl_tpu.core import pallas_conv as pc

    TILE, WIN = pc.TILE, pc.WIN

    def make_kernel(variant, K, G, W):
        def kern(starts_ref, nch_ref, qk_ref, w_ref, tk_hbm, x_hbm,
                 out_ref, kwin_ref, xwin_ref, kwin2_ref, xwin2_ref,
                 acc_ref, sems):
            dt = xwin2_ref.dtype
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            kg = K // G
            i = pl.program_id(0)
            n = pl.num_programs(0)

            def dma_k(g, tile, slot):
                base = pl.multiple_of(starts_ref[g, tile], 128)
                if variant == "nodma":
                    base = 0
                return pltpu.make_async_copy(
                    tk_hbm.at[:, pl.ds(base, W)], kwin_ref.at[slot],
                    sems.at[slot, 0])

            def dma_x(g, tile, slot):
                base = pl.multiple_of(starts_ref[g, tile], 128)
                if variant == "nodma":
                    base = 0
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(base, W), :], xwin_ref.at[slot],
                    sems.at[slot, 1])

            def run_group(g, tk, win):
                if variant == "pipe":
                    # software pipeline: offset j+1's one-hot build (VPU)
                    # is issued before offset j's gather GEMM result is
                    # consumed, making the VPU/MXU independence explicit
                    oh = (qk_ref[g * kg, :][:, None] == tk).astype(dt)
                    for j in range(g * kg, (g + 1) * kg):
                        gx = jnp.dot(oh, win,
                                     preferred_element_type=jnp.float32)
                        if j + 1 < (g + 1) * kg:
                            oh = (qk_ref[j + 1, :][:, None]
                                  == tk).astype(dt)
                        acc_ref[:, :] += jnp.dot(
                            gx.astype(dt), w_ref[j],
                            preferred_element_type=jnp.float32)
                    return
                oh0 = (qk_ref[g * kg, :][:, None] == tk).astype(dt)
                for j in range(g * kg, (g + 1) * kg):
                    if variant == "nohot":
                        oh = oh0
                    else:
                        oh = (qk_ref[j, :][:, None] == tk).astype(dt)
                    if variant == "hotonly":
                        # cheap consume: isolates the build cost without
                        # nodot's expensive cross-lane row reduction
                        acc_ref[:, 0:1] += oh[:, 0:1].astype(jnp.float32)
                        continue
                    if variant == "nodot":
                        acc_ref[:, 0:1] += jnp.sum(
                            oh, axis=1, keepdims=True).astype(jnp.float32)
                        continue
                    gx = jnp.dot(oh, win,
                                 preferred_element_type=jnp.float32)
                    if variant == "dot1":
                        acc_ref[:, :] += gx
                    else:
                        acc_ref[:, :] += jnp.dot(
                            gx.astype(dt), w_ref[j],
                            preferred_element_type=jnp.float32)

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
                    run_group(g, kwin_ref[slot, 0:1, :], xwin_ref[slot])

            out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)

        return kern

    def launch_fwd(variant, win, qp, wd, starts, nch, tkeys, xp):
        """Timed region: the pallas_call only (prep hoisted by caller);
        `variant`/`win` are bound statically before jax.jit."""
        k = qp.shape[0]
        grp, n_tiles = starts.shape
        c = xp.shape[1]
        cout = wd.shape[-1]

        kern = make_kernel(variant, k, grp, win)
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
                pltpu.VMEM((2, 8, win), jnp.int32),
                pltpu.VMEM((2, win, c), xp.dtype),
                pltpu.VMEM((8, win), jnp.int32),
                pltpu.VMEM((win, c), xp.dtype),
                pltpu.VMEM((TILE, cout), jnp.float32),
                pltpu.SemaphoreType.DMA((3, 2)),
            ],
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, cout),
                                           xp.dtype),
        )(starts, nch, qp, wd, tkeys, xp)

    def make_bwd_kernel(variant, K, G, W, C):
        """One-pass backward structure (pallas_conv._bwd_kernel): per
        offset, gather-GEMM the grad window, dX GEMM, dW accumulate."""
        def kern(starts_ref, nch_ref, qk_ref, w_ref, x_ref, tk_hbm,
                 g_hbm, dx_ref, dw_ref, kwin_ref, xwin_ref,
                 acc_ref, sems):
            dt = xwin_ref.dtype
            i = pl.program_id(0)
            n = pl.num_programs(0)
            kg = K // G
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

            @pl.when(i == 0)
            def _():
                dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

            xt_t = x_ref[:, :]

            def dma_k(g, tile, slot):
                base = pl.multiple_of(starts_ref[g, tile], 128)
                return pltpu.make_async_copy(
                    tk_hbm.at[:, pl.ds(base, W)], kwin_ref.at[slot],
                    sems.at[slot, 0])

            def dma_x(g, tile, slot):
                base = pl.multiple_of(starts_ref[g, tile], 128)
                return pltpu.make_async_copy(
                    g_hbm.at[pl.ds(base, W), :], xwin_ref.at[slot],
                    sems.at[slot, 1])

            def run_group(g, tk, win):
                for j in range(g * kg, (g + 1) * kg):
                    oh = (qk_ref[j, :][:, None] == tk).astype(dt)
                    gg = jnp.dot(oh, win,
                                 preferred_element_type=jnp.float32)
                    ggd = gg.astype(dt)
                    if variant != "bwd_nodx":
                        acc_ref[:, :] += jnp.dot(
                            ggd, w_ref[j],
                            preferred_element_type=jnp.float32)
                    if variant == "bwd_nodw":
                        continue
                    if variant == "bwd_dwhalf" and j % 2 == 1:
                        continue
                    dw_ref[j, :, :] += jnp.dot(
                        xt_t, ggd, preferred_element_type=jnp.float32)

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
                    run_group(g, kwin_ref[slot, 0:1, :], xwin_ref[slot])

            dx_ref[:, :] = acc_ref[:, :].astype(dx_ref.dtype)

        return kern

    def launch_bwd(variant, win, qp, w_rev_t, xp, starts, nch, tkeys,
                   gp):
        """Timed region: the pallas_call only (prep hoisted by caller)."""
        k = qp.shape[0]
        grp, n_tiles = starts.shape
        c = xp.shape[0]
        cout = gp.shape[-1]

        kern = make_bwd_kernel(variant, k, grp, win, c)
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
                pltpu.VMEM((2, 8, win), jnp.int32),
                pltpu.VMEM((2, win, cout), xp.dtype),
                pltpu.VMEM((TILE, c), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles * TILE, c), xp.dtype),
                jax.ShapeDtypeStruct((k, c, cout), jnp.float32),
            ),
        )(starts, nch, qp, w_rev_t, xp, tkeys, gp)

    # bench-scale same-level geometry: 516k rows, k=27, G=3, WIN=384,
    # realistic windows from the production fused-map builder.
    from bench import synth_lidar
    from gcl_tpu.core.kernel_maps import (ConvSpec, build_graph,
                                          default_level_caps)
    from gcl_tpu.data.device_pipeline import voxelize_per_cloud

    b, n_clouds, p_cap, nv_cap = 4, 7, 65536, 18432
    rng = np.random.RandomState(0)
    pts = np.zeros((b * n_clouds, p_cap, 3), np.float32)
    for i in range(b * n_clouds):
        pts[i] = synth_lidar(rng, p_cap)
    vox = voxelize_per_cloud(jnp.asarray(pts),
                             jnp.ones((b * n_clouds, p_cap), bool),
                             0.3, nv_cap)
    flat = vox.flatten()
    spec = ConvSpec("ablate", in_stride=1, out_stride=1, kernel_size=3)
    caps = default_level_caps(b * n_clouds * nv_cap, [1], 0.55)
    graph = build_graph(flat.coords, flat.mask, [spec], caps,
                        method="fused", sorted_blocks=True,
                        n_clouds=b * n_clouds)
    fm = graph.fused[spec.key]
    win = int(fm.win)
    n_rows = caps[1]
    print(json.dumps({"rows": n_rows, "k": 27, "win": win,
                      "tiles": int(fm.starts.shape[1])}), flush=True)

    FWD = ("full", "nohot", "dot1", "nodot", "nodma", "pipe", "hotonly")
    BWD = ("bwd_full", "bwd_nodw", "bwd_nodx", "bwd_dwhalf")
    variants = sys.argv[1:] or list(FWD) + list(BWD)
    bad = [v for v in variants if v not in FWD + BWD + ("setup",)]
    if bad:
        raise SystemExit(f"unknown variants {bad}; known: {FWD + BWD}")
    for c in (128,):
        feats = jnp.asarray(
            rng.randn(n_rows, c).astype(np.float32)).astype(jnp.bfloat16)
        weights = jnp.asarray(rng.randn(27, c, c).astype(np.float32))
        g_up = jnp.asarray(
            rng.randn(n_rows, c).astype(np.float32)).astype(jnp.bfloat16)
        # prep ONCE, outside the timed jits (the production conv pays
        # these per graph build, not per kernel launch)
        n_tiles = fm.starts.shape[1]
        t_pad = fm.tkeys.shape[1]
        qp = pc._pad_qkey(fm.qkey, n_tiles)
        xp_fwd = pc._pad_feats(feats, t_pad, c)
        wd = weights.astype(feats.dtype)
        w_rev_t = jnp.swapaxes(weights[::-1], 1, 2).astype(feats.dtype)
        gp = pc._pad_feats(g_up, t_pad, c)
        xp_bwd = jnp.zeros((c, n_tiles * TILE), feats.dtype).at[
            :c, :n_rows].set(feats.T)
        trace_only = os.environ.get("GCL_ABLATE_TRACE_ONLY") == "1"
        for variant in variants:
            if variant == "setup":  # CPU smoke: geometry build only
                continue
            if trace_only:  # CPU: verify tracing/shape logic, no compile
                if variant.startswith("bwd"):
                    shapes = jax.eval_shape(
                        functools.partial(launch_bwd, variant, win),
                        qp, w_rev_t, xp_bwd, fm.starts, fm.nch,
                        fm.tkeys, gp)
                else:
                    shapes = jax.eval_shape(
                        functools.partial(launch_fwd, variant, win),
                        qp, wd, fm.starts, fm.nch, fm.tkeys, xp_fwd)
                print(json.dumps({"variant": variant,
                                  "trace": "ok"}), flush=True)
                continue
            if variant.startswith("bwd"):
                f = jax.jit(functools.partial(launch_bwd, variant, win))
                args = (qp, w_rev_t, xp_bwd, fm.starts, fm.nch,
                        fm.tkeys, gp)
                dx, dw = f(*args)
                _ = float(jnp.sum(dx.astype(jnp.float32))
                          + jnp.sum(dw))  # sync
                t0 = time.perf_counter()
                iters = 20
                for _ in range(iters):
                    dx, dw = f(*args)
                _ = float(jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw))
            else:
                f = jax.jit(functools.partial(launch_fwd, variant, win))
                args = (qp, wd, fm.starts, fm.nch, fm.tkeys, xp_fwd)
                out = f(*args)
                _ = float(jnp.sum(out.astype(jnp.float32)))  # sync
                t0 = time.perf_counter()
                iters = 20
                for _ in range(iters):
                    out = f(*args)
                _ = float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({"variant": variant, "c": c,
                              "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
