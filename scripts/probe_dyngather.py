"""Probe: is tpu.dynamic_gather (jnp.take_along_axis in Mosaic) a viable
replacement for the one-hot gather GEMM?

The per-layer profile (scripts/profile_convs.py) shows the fused conv
kernels are VPU-bound on the one-hot builds (2 ops x K x TILE x W); a
true dynamic row gather would cut that to O(TILE x C) per offset.

Variants (all [TILE rows out of a W-row window, C channels]):
  onehot   production structure: cmp + convert + [TILE,W]@[W,C] MXU gather
  subgath  take_along_axis(xw, idx, axis=0) on [W, C] (sublane gather)
  langath  take_along_axis(xw_T, idx, axis=1) on [C, W] (lane gather)

Each runs K=27 offsets per tile to mimic a block conv's gather load.
Prints ms per variant at bench-like shape and checks exactness.
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

    TILE, W, C, K = 256, 384, 32, 27
    N_TILES = 512  # ~ bench stride-1 level tiles (516096/256 = 2016; 512 is enough to time)

    rng = np.random.RandomState(0)
    x = rng.randn(N_TILES, W, C).astype(np.float32).astype(jnp.bfloat16)
    # per-tile, per-offset window-relative row positions
    pos = rng.randint(0, W, size=(N_TILES, K, TILE)).astype(np.int32)
    # query keys + window keys consistent with pos for the one-hot variant
    tk = np.arange(W, dtype=np.int32)

    def onehot_kernel(pos_ref, x_ref, out_ref, *, K):
        tkv = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        acc = jnp.zeros((TILE, C), jnp.float32)
        for k in range(K):
            q = pos_ref[0, k, :][:, None]
            oh = (q == tkv).astype(jnp.bfloat16)
            acc += jnp.dot(oh, x_ref[0], preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def subgath_kernel(pos_ref, x_ref, out_ref, *, K):
        acc = jnp.zeros((TILE, C), jnp.float32)
        xw = x_ref[0]  # [W, C]
        for k in range(K):
            p = pos_ref[0, k, :]  # [TILE]
            idx = jnp.broadcast_to(p[:, None], (TILE, C))
            idx = jnp.pad(idx, ((0, W - TILE), (0, 0)))
            g = jnp.take_along_axis(xw, idx, axis=0)  # [W, C]
            acc += g[:TILE].astype(jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def langath_kernel(pos_ref, xt_ref, out_ref, *, K):
        acc = jnp.zeros((C, TILE), jnp.float32)
        xt = xt_ref[0]  # [C, W]
        for k in range(K):
            p = pos_ref[0, k, :]  # [TILE]
            idx = jnp.broadcast_to(p[None, :], (C, TILE))
            idx = jnp.pad(idx, ((0, 0), (0, W - TILE)))
            g = jnp.take_along_axis(xt, idx, axis=1)  # [C, W]
            acc += g[:, :TILE].astype(jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def langath128_kernel(pos_ref, xt_ref, out_ref, *, K):
        """Lane gathers restricted to single-VREG 128-lane spans (the
        only form the Mosaic backend compiles, f32 only): the window is
        split into 128-wide thirds and the tile's outputs into
        128-column batches (take_along_axis needs idx.shape == x.shape);
        each (batch, third) is one dynamic_gather + range select."""
        acc = jnp.zeros((C, TILE), jnp.float32)
        xt = xt_ref[0].astype(jnp.float32)  # [C, W]
        nb = W // 128
        for k in range(K):
            cols = []
            for h in range(TILE // 128):
                p = pos_ref[0, k, h * 128:(h + 1) * 128]  # [128]
                idx = jnp.broadcast_to(p[None, :], (C, 128))
                g = jnp.zeros((C, 128), jnp.float32)
                for b in range(nb):
                    sel = (idx >= b * 128) & (idx < (b + 1) * 128)
                    lid = jnp.where(sel, idx - b * 128, 0)
                    gb = jnp.take_along_axis(
                        xt[:, b * 128:(b + 1) * 128], lid, axis=1)
                    g = jnp.where(sel, gb, g)
                cols.append(g)
            acc += jnp.concatenate(cols, axis=1)
        out_ref[0] = acc.astype(out_ref.dtype)

    def build(kern, x_in, x_spec, out_tc=True):
        oshape = (TILE, C) if out_tc else (C, TILE)
        return pl.pallas_call(
            functools.partial(kern, K=K),
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((1, K, TILE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                x_spec,
            ],
            out_specs=pl.BlockSpec((1,) + oshape, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES,) + oshape,
                                           jnp.bfloat16),
        )

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))
        del s
        return (time.perf_counter() - t0) / iters * 1e3, out

    xs_spec = pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    xt_spec = pl.BlockSpec((1, C, W), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    xj = jnp.asarray(x)
    xtj = jnp.swapaxes(xj, 1, 2).copy()
    posj = jnp.asarray(pos)

    results = {}
    want = None
    for name in (sys.argv[1:] or ["onehot", "langath", "langath128",
                                  "subgath"]):
        try:
            if name == "onehot":
                fn = jax.jit(build(onehot_kernel, xj, xs_spec))
                ms, out = timeit(fn, posj, xj)
            elif name == "subgath":
                fn = jax.jit(build(subgath_kernel, xj, xs_spec))
                ms, out = timeit(fn, posj, xj)
            elif name == "langath":
                fn = jax.jit(build(langath_kernel, xtj, xt_spec,
                                   out_tc=False))
                ms, out = timeit(fn, posj, xtj)
                out = jnp.swapaxes(out, 1, 2)
            elif name == "langath128":
                fn = jax.jit(build(langath128_kernel, xtj, xt_spec,
                                   out_tc=False))
                ms, out = timeit(fn, posj, xtj)
                out = jnp.swapaxes(out, 1, 2)
            else:
                continue
            if want is None:
                # numpy oracle
                want = np.zeros((N_TILES, TILE, C), np.float32)
                xb = np.asarray(xj, np.float32)
                for k in range(K):
                    want += np.take_along_axis(
                        xb, pos[:, k, :, None].repeat(C, 2), axis=1)
            got = np.asarray(out, np.float32)
            err = np.abs(got - want).max()
            results[name] = (round(ms, 3), float(err))
            print(name, "ms:", round(ms, 3), "max_err:", float(err),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED:", type(e).__name__,
                  str(e).split("\n")[0][:200], flush=True)
    print(results)


if __name__ == "__main__":
    main()
