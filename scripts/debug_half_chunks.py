"""Minimal TPU repro: half-window kernel with multi-chunk windows.

Crafts an explicit gather table whose matches for one output tile spread
far beyond win_h (forcing hnch >= 2) and compares the half kernel's
forward against the classic kernel + a numpy reference.

Usage: python -u scripts/debug_half_chunks.py
"""
import os
import sys

os.environ["GCL_CONV_WIN"] = os.environ.get("GCL_CONV_WIN", "256")
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core import pallas_conv

    rng = np.random.RandomState(0)
    n_in, n_out, k, c = 8192, 8192, 27, 64
    # per (tile, group): random span class so the pipeline sees a mix of
    # single-chunk, multi-chunk, empty-half and empty-group windows
    nt = n_out // 256
    idx = np.full((k, n_out), n_in, np.int32)
    for t in range(nt):
        for g in range(3):
            kind = rng.randint(0, 5)
            if kind == 0:
                continue  # empty group
            span = [130, 300, 700, 60][kind - 1]
            t0 = min(t * 220 + g * 37, n_in - span - 1)
            for kk in range(g * 9, (g + 1) * 9):
                base = np.linspace(0, span, 256).astype(np.int32) + t0
                jit = rng.randint(0, 24, 256)
                col = np.minimum(base + jit + (kk % 9), n_in - 1)
                col.sort()
                if kind == 4:  # empty half 1
                    col[128:] = n_in
                idx[kk, t * 256:(t + 1) * 256] = col
    miss = rng.rand(k, n_out) < 0.1
    idx = np.where(miss, n_in, idx)

    x = rng.randn(n_in, c).astype(np.float32)
    w = rng.randn(k, c, c).astype(np.float32) * 0.05

    xp = np.concatenate([x, np.zeros((1, c), np.float32)])
    ref = sum(xp[np.minimum(idx[kk], n_in)] @ w[kk] for kk in range(k))

    outs = {}
    for half in (False, True):
        pallas_conv.HALF = half
        f = jax.jit(lambda a, b: pallas_conv.pallas_conv_fwd(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            jnp.asarray(idx)))
        outs[half] = np.asarray(f(jnp.asarray(x), jnp.asarray(w)),
                                np.float32)

    for half, o in outs.items():
        err = np.max(np.abs(o - ref)) / np.abs(ref).max()
        print(f"half={half}: rel err vs numpy {err:.3e}")
    d = np.abs(outs[True] - outs[False]).max(axis=1)
    bad = np.where(d > 0.05 * np.abs(ref).max())[0]
    print("rows differing:", len(bad), bad[:20])


if __name__ == "__main__":
    main()
