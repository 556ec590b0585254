"""On-TPU exactness + timing check of the half-window conv kernels.

Builds a KITTI-like sorted voxel geometry, runs fused fwd/bwd with
GCL_CONV_HALF on vs off, checks outputs/grads match, and times both.

Usage: python -u scripts/probe_half_tpu.py [n_points]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: F401  (enables the persistent compile cache)


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core import pallas_conv
    from gcl_tpu.core import sparse_ops
    from gcl_tpu.core.kernel_maps import ConvSpec, build_graph
    from gcl_tpu.core.types import INVALID_BATCH, map_key

    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    rng = np.random.RandomState(0)
    pts = rng.randint(-60, 60, size=(n_req, 2))
    z = rng.randint(-20, 20, size=(n_req, 1))
    xyz = np.unique(np.concatenate([pts, z], axis=1), axis=0)
    xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
    n = len(xyz)
    cap = -(-n // 256) * 256 + 256
    coords = np.full((cap, 4), -1, np.int32)
    coords[:, 0] = int(INVALID_BATCH)
    coords[:n, 0] = 0
    coords[:n, 1:] = xyz
    mask = np.zeros(cap, bool)
    mask[:n] = True

    spec = ConvSpec("c", 1, 1, 3)
    spec_dn = ConvSpec("d", 1, 2, 3)
    caps = {1: cap, 2: cap}
    specs = [spec, spec_dn]

    def build():
        return build_graph(jnp.asarray(coords), jnp.asarray(mask), specs,
                           caps, method="fused", sorted_blocks=True,
                           n_clouds=1)

    cin, cout = 64, 64
    feats = rng.randn(cap, cin).astype(np.float32) * mask[:, None]
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.05
    cot = rng.randn(cap, cout).astype(np.float32)

    def run(sp, g):
        rk = map_key(sp.out_stride, sp.in_stride, sp.kernel_size, 1)
        fm, rfm = g.fused[sp.key], g.fused[rk]

        def loss(w_, f_):
            out = sparse_ops.sparse_conv_fused(
                f_.astype(jnp.bfloat16), w_.astype(jnp.bfloat16), fm, rfm)
            o = out.astype(jnp.float32)
            return jnp.sum(o * jnp.sin(0.01 * jnp.arange(
                o.shape[0]))[:, None])

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        val, (gw, gf) = f(jnp.asarray(w), jnp.asarray(feats))
        jax.block_until_ready(val)
        t0 = time.perf_counter()
        for _ in range(10):
            val, (gw, gf) = f(jnp.asarray(w), jnp.asarray(feats))
        _ = float(val)
        dt = (time.perf_counter() - t0) / 10
        return val, gw, gf, dt

    results = {}
    for half in (True, False):
        pallas_conv.HALF = half
        g = build()
        for sp in specs:
            key = (sp.name, half)
            results[key] = run(sp, g)
            print(f"{sp.name} half={half}: {results[key][3]*1e3:8.2f} ms "
                  f"loss={float(results[key][0]):.1f}", flush=True)

    for sp in specs:
        vh, gwh, gfh, _ = results[(sp.name, True)]
        vc, gwc, gfc, _ = results[(sp.name, False)]
        for a, b, nm in ((vh, vc, "loss"), (gwh, gwc, "dW"),
                         (gfh, gfc, "dX")):
            aa, bb = np.asarray(a, np.float32), np.asarray(b, np.float32)
            err = np.max(np.abs(aa - bb)) / (np.max(np.abs(bb)) + 1e-9)
            print(f"{sp.name} {nm}: rel err {err:.2e}")
            assert err < 2e-2, (sp.name, nm, err)
    print("EXACTNESS OK")


if __name__ == "__main__":
    main()
