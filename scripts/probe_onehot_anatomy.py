"""Decompose the one-hot gather GEMM's cost: VPU compare vs MXU dot.

Replicates the fused conv kernels' inner loop (27 offsets x [TILE, W]
one-hot + gather GEMM + accumulate GEMM) on pallas-pipelined VMEM blocks
(no manual DMA), and times ablated variants:

  full     cmp + select + gather dot + acc dot   (production structure)
  vpu      cmp + select only (dot replaced by a 1-vreg slice add)
  mxu      gather + acc dots only (one-hot built ONCE per tile, reused)
  nodacc   cmp + select + gather dot (no accumulate GEMM)

Usage: python -u scripts/probe_onehot_anatomy.py [TILE W C K N_TILES]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    argv = sys.argv[1:]
    nums = []
    while argv and argv[0].isdigit():
        nums.append(int(argv.pop(0)))
    TILE, W, C, K, N_TILES = (nums + [256, 384, 32, 27, 512])[:5]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N_TILES, W, C).astype(np.float32),
                    jnp.bfloat16)
    # realistic monotone positions: output row o's match sits near
    # o * (W - 128) / TILE + jitter, so each 128-row half's matches fit
    # a 128-aligned (W - 128)-wide static subwindow (the `split` mode)
    base = (np.arange(TILE) * (W - 128) / TILE).astype(np.int32)
    jit = rng.randint(0, 96, size=(N_TILES, K, TILE))
    pos = jnp.asarray(np.minimum(base[None, None, :] + jit, W - 1)
                      .astype(np.int32))
    wts = jnp.asarray(rng.randn(K, C, C).astype(np.float32), jnp.bfloat16)

    WS = W - 128  # split-mode subwindow width

    def kern(pos_ref, x_ref, w_ref, out_ref, *, mode):
        tkv = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        acc = jnp.zeros((TILE, C), jnp.float32)
        xw = x_ref[0]
        if mode in ("qsub", "qsubsplit"):
            # queries SUBLANE-major ([TILE, K] block): q column read is
            # layout-native — no per-offset lane->sublane relayout
            if mode == "qsub":
                for k in range(K):
                    q = pos_ref[0, :, k:k + 1]  # [TILE, 1]
                    oh = (q == tkv).astype(jnp.bfloat16)
                    gx = jnp.dot(oh, xw, preferred_element_type=jnp.float32)
                    acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                                   preferred_element_type=jnp.float32)
            else:
                h = TILE // 2
                for k in range(K):
                    gxs = []
                    for hh in range(2):
                        off = hh * 128
                        q = pos_ref[0, hh * h:(hh + 1) * h, k:k + 1]
                        oh = (q == tkv[:, off:off + WS]).astype(
                            jnp.bfloat16)
                        gxs.append(jnp.dot(
                            oh, xw[off:off + WS],
                            preferred_element_type=jnp.float32))
                    gx = jnp.concatenate(gxs, axis=0)
                    acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                                   preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return
        if mode == "pipe":
            # software-pipelined emission: offset k+1's one-hot build is
            # emitted BEFORE offset k's gather dot, nudging the scheduler
            # to overlap VPU compare with MXU passes
            def build(k):
                q = pos_ref[0, k, :][:, None]
                return (q == tkv).astype(jnp.bfloat16)
            oh = build(0)
            for k in range(K):
                oh_next = build(k + 1) if k + 1 < K else None
                gx = jnp.dot(oh, xw, preferred_element_type=jnp.float32)
                acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                               preferred_element_type=jnp.float32)
                oh = oh_next
            out_ref[0] = acc.astype(out_ref.dtype)
            return
        oh0 = (pos_ref[0, 0, :][:, None] == tkv).astype(jnp.bfloat16)
        if mode in ("split", "dsplit"):
            # each 128-row half compares against only the 128-aligned
            # WS-wide static slice of the window its matches occupy;
            # dsplit additionally hoists the broadcast-subtract out of
            # the offset loop (scalar per-offset compares)
            h = TILE // 2
            dh = []
            if mode == "dsplit":
                for hh in range(2):
                    off = hh * 128
                    q = pos_ref[0, 0, hh * h:(hh + 1) * h][:, None]
                    dh.append(q - tkv[:, off:off + WS])
            for k in range(K):
                gxs = []
                for hh in range(2):
                    off = hh * 128
                    if mode == "dsplit":
                        oh = (dh[hh] == jnp.int32(k)).astype(jnp.bfloat16)
                    else:
                        q = pos_ref[0, k, hh * h:(hh + 1) * h][:, None]
                        oh = (q == tkv[:, off:off + WS]).astype(
                            jnp.bfloat16)
                    gxs.append(jnp.dot(oh, xw[off:off + WS],
                                       preferred_element_type=jnp.float32))
                gx = jnp.concatenate(gxs, axis=0)
                acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                               preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return
        if mode == "half":
            # per-half-tile windows (the fine-alignment design): each
            # 128-row half compares + gathers against its OWN window of
            # WH = max(256, W // 2) rows — cost model of the 16-granular
            # half-window kernels (timing only; slices reuse the W-wide
            # buffer so data content is arbitrary but shapes are real)
            wh = max(256, W // 2)
            h = TILE // 2
            for k in range(K):
                gxs = []
                for hh in range(2):
                    q = pos_ref[0, k, hh * h:(hh + 1) * h][:, None]
                    oh = (q == tkv[:, :wh]).astype(jnp.bfloat16)
                    gxs.append(jnp.dot(oh, xw[:wh],
                                       preferred_element_type=jnp.float32))
                gx = jnp.concatenate(gxs, axis=0)
                acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                               preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return
        if mode == "dhalf":
            # half windows + hoisted broadcast-subtract: per half, ONE
            # [128, WH] subtract per tile-group, then per-offset scalar
            # equality (the production D-trick candidate for same-level
            # maps under GCL_CONV_HALF)
            wh = max(256, W // 2)
            h = TILE // 2
            dh = []
            for hh in range(2):
                q = pos_ref[0, 0, hh * h:(hh + 1) * h][:, None]
                dh.append(q - tkv[:, :wh])
            for k in range(K):
                gxs = []
                for hh in range(2):
                    oh = (dh[hh] == jnp.int32(-k)).astype(jnp.bfloat16)
                    gxs.append(jnp.dot(oh, xw[:wh],
                                       preferred_element_type=jnp.float32))
                gx = jnp.concatenate(gxs, axis=0)
                acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                               preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return
        if mode in ("i16", "i16d", "i16dv"):
            # 16-bit compare domain: if Mosaic packs int16 lanes 2:1 the
            # compare's vreg count halves; the bf16 one-hot it selects is
            # already the MXU operand dtype. i16d hoists a single int16
            # subtract per tile and compares against static scalars.
            tk16 = tkv.astype(jnp.int16)
            d16 = None
            if mode in ("i16d", "i16dv"):
                d16 = pos_ref[0, 0, :][:, None].astype(jnp.int16) - tk16
            for k in range(K):
                if d16 is not None:
                    oh = (d16 == jnp.int16(-k)).astype(jnp.bfloat16)
                else:
                    q = pos_ref[0, k, :][:, None].astype(jnp.int16)
                    oh = (q == tk16).astype(jnp.bfloat16)
                if mode == "i16dv":
                    acc += oh[:, :C].astype(jnp.float32)
                    continue
                gx = jnp.dot(oh, xw, preferred_element_type=jnp.float32)
                acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                               preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return
        dsh = None
        if mode in ("dshare", "dsharev"):
            # ONE broadcast-subtract per tile; per-offset compare is
            # against a STATIC SCALAR (no [TILE,1]x[1,W] broadcast)
            dsh = pos_ref[0, 0, :][:, None] - tkv  # [TILE, W]
        for k in range(K):
            if mode == "mxu":
                oh = oh0
            elif dsh is not None:
                oh = (dsh == jnp.int32(-k)).astype(jnp.bfloat16)
            else:
                q = pos_ref[0, k, :][:, None]
                oh = (q == tkv).astype(jnp.bfloat16)
            if mode in ("vpu", "dsharev"):
                acc += oh[:, :C].astype(jnp.float32)
                continue
            gx = jnp.dot(oh, xw, preferred_element_type=jnp.float32)
            if mode == "nodacc":
                acc += gx
            else:
                acc += jnp.dot(gx.astype(jnp.bfloat16), w_ref[k],
                               preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def build(mode):
        pspec = (pl.BlockSpec((1, TILE, K), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
                 if mode in ("qsub", "qsubsplit") else
                 pl.BlockSpec((1, K, TILE), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM))
        return jax.jit(pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid=(N_TILES,),
            in_specs=[
                pspec,
                pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, C, C), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES, TILE, C),
                                           jnp.bfloat16),
        ))

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(*a)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"TILE={TILE} W={W} C={C} K={K} N_TILES={N_TILES}")
    pos_t = jnp.swapaxes(pos, 1, 2).copy()
    modes = argv or (
        "full", "split", "qsub", "qsubsplit")
    for mode in modes:
        try:
            pin = pos_t if mode in ("qsub", "qsubsplit") else pos
            ms = timeit(build(mode), pin, x, wts)
            per = ms / N_TILES / K * 1e6  # ns per offset per tile
            print(f"{mode:8s} {ms:8.3f} ms   {per:7.1f} ns/offset/tile",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(mode, "FAILED:", str(e).split(chr(10))[0][:160])


if __name__ == "__main__":
    main()
