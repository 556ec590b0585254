"""Fast A/B microbench for the fused-conv tuning knobs on the PRODUCTION
path (sparse_conv_fused + FusedMap windows, fused one-pass backward).

Times a handful of representative layers at bench scale (b=4) so a knob
sweep costs ~2 min/config instead of a 12-min full-step compile:

  block1    32 ->  32  same-level s1 (the widest-N narrow-channel shape)
  conv2     32 ->  64  downsample s1->s2
  block2_tr 128 -> 128 same-level s1 (widest-N wide-channel shape)
  conv2_tr  192 -> 128 upsample s2->s1

Knobs come from the usual env vars (GCL_CONV_TILE/WIN/WIN_DOWN/PAIR).

Usage: [GCL_CONV_PAIR=3 ...] python -u scripts/probe_conv_tuning.py
Prints one JSON line per layer: fwd ms + full-VJP (fwd+dX+dW) ms.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import synth_lidar  # noqa: E402  (enables the compile cache)


def timeit(fn, *args, iters=10):
    import jax.numpy as jnp

    def sync(o):
        leaves = [x for x in (o if isinstance(o, tuple) else (o,))]
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core import pallas_conv
    from gcl_tpu.core.kernel_maps import build_graph, default_level_caps
    from gcl_tpu.core.sparse_ops import sparse_conv_fused
    from gcl_tpu.core.types import map_key
    from gcl_tpu.data.device_pipeline import voxelize_per_cloud
    from gcl_tpu.models.resunet import ResUNetFatBN

    b, n_clouds, p_cap, nv_cap = 4, 7, 65536, 18432
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    caps = default_level_caps(b * n_clouds * nv_cap, strides, 0.55)

    rng = np.random.RandomState(0)
    points = np.stack([synth_lidar(rng, p_cap)
                       for _ in range(b * n_clouds)])
    pmask = np.ones((b * n_clouds, p_cap), bool)

    @jax.jit
    def geom(points, pmask):
        vox = voxelize_per_cloud(points, pmask, 0.3, nv_cap)
        flat = vox.flatten()
        return build_graph(flat.coords, flat.mask, specs, caps,
                           method="fused", sorted_blocks=True,
                           n_clouds=b * n_clouds)

    graph = geom(jnp.asarray(points), jnp.asarray(pmask))
    graph = jax.tree_util.tree_map(jax.block_until_ready, graph)

    pj, mj = jnp.asarray(points), jnp.asarray(pmask)

    def geom_probe(p, m):
        g = geom(p, m)
        return g.levels[1].coords  # sync handle

    t_geom = timeit(jax.jit(geom_probe), pj, mj, iters=5)
    print(json.dumps({"geom_ms": round(t_geom * 1e3, 2),
                      "note": "voxelize+build_graph, no groups"}),
          flush=True)

    by_name = {sp.name: sp for sp in specs}
    plan = [("block1", 32, 32), ("conv2", 32, 64),
            ("block2_tr", 128, 128), ("conv2_tr", 192, 128)]
    names = sys.argv[1:] or [p[0] for p in plan]
    print(json.dumps({"tile": pallas_conv.TILE, "win": pallas_conv.WIN,
                      "win_down": pallas_conv.WIN_DOWN,
                      "pair": pallas_conv.PAIR}), flush=True)

    krng = jax.random.PRNGKey(0)
    total = {"fwd": 0.0, "vjp": 0.0}
    for lname, cin, cout in plan:
        if lname not in names:
            continue
        sp = by_name[lname]
        fm = graph.fused[sp.key]
        rkey = map_key(sp.out_stride, sp.in_stride, sp.kernel_size,
                       sp.dilation)
        rfm = graph.fused[rkey]
        n_in = graph.levels[sp.in_stride].coords.shape[0]
        n_out = graph.levels[sp.out_stride].coords.shape[0]
        k = sp.kernel_size ** 3
        x = jax.random.normal(krng, (n_in, cin), jnp.bfloat16)
        w = jax.random.normal(krng, (k, cin, cout), jnp.bfloat16)
        g = jax.random.normal(krng, (n_out, cout), jnp.bfloat16)

        fwd = jax.jit(lambda x, w, fm=fm, rfm=rfm:
                      sparse_conv_fused(x, w, fm, rfm))

        def vjp_fn(x, w, g, fm=fm, rfm=rfm):
            out, pull = jax.vjp(
                lambda x, w: sparse_conv_fused(x, w, fm, rfm), x, w)
            dx, dw = pull(g)
            return out, dx, dw

        vjp = jax.jit(vjp_fn)
        t_fwd = timeit(fwd, x, w)
        t_vjp = timeit(vjp, x, w, g)
        total["fwd"] += t_fwd
        total["vjp"] += t_vjp
        print(json.dumps({"layer": lname, "cin": cin, "cout": cout,
                          "n_in": n_in, "n_out": n_out,
                          "fwd_ms": round(t_fwd * 1e3, 2),
                          "vjp_ms": round(t_vjp * 1e3, 2)}), flush=True)
    print(json.dumps({"total_fwd_ms": round(total["fwd"] * 1e3, 2),
                      "total_vjp_ms": round(total["vjp"] * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
