"""Feasibility probe: dynamic SUBLANE row read of a VMEM key window.

The fine-alignment window design stores 8 shifted key replicas in the
tkeys array's 8 sublane rows (row r = keys shifted by 16*r). The conv
kernel must then read row r (a per-(group, tile) traced scalar) as the
[1, W] compare operand. This probe checks Mosaic lowers that read, and
times it against the static row-0 read.

Usage: python -u scripts/probe_dynsublane.py
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

    TILE, W, NT = 256, 384, 512
    rng = np.random.RandomState(0)
    tk = jnp.asarray(rng.randint(0, 1 << 20, size=(NT * 8, W)), jnp.int32)
    q = jnp.asarray(rng.randint(0, 1 << 20, size=(8, NT * TILE)), jnp.int32)
    ridx = jnp.asarray(rng.randint(0, 8, size=(NT,)), jnp.int32)

    def kern(ridx_ref, q_ref, tk_ref, out_ref, *, mode, K=9):
        i = pl.program_id(0)
        acc = jnp.zeros((TILE, 128), jnp.float32)
        for k in range(K):
            if mode == "dyn":
                r = ridx_ref[i]
                row = tk_ref[r, :][None, :]
            elif mode == "dyn_ds":
                r = ridx_ref[i]
                row = tk_ref[pl.ds(r, 1), :]
            else:
                row = tk_ref[0:1, :]
            oh = (q_ref[0, :][:, None] + k == row).astype(jnp.bfloat16)
            acc += oh[:, :128].astype(jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def build(mode):
        return jax.jit(pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NT,),
                in_specs=[
                    pl.BlockSpec((8, TILE), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, W), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TILE, 128), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NT, TILE, 128), jnp.bfloat16),
        ))

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(*a)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    for mode in ("static", "dyn", "dyn_ds"):
        try:
            ms = timeit(build(mode), ridx, q, tk)
            print(f"{mode:8s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(mode, "FAILED:", str(e).split(chr(10))[0][:200])


if __name__ == "__main__":
    main()
