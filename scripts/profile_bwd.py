"""Per-layer timing: two-pass backward (dX kernel + dW kernel) vs the
one-pass fused backward (pallas_conv.fused_conv_bwd) on the production
FusedMaps at bench.py scale.

Usage: python -u scripts/profile_bwd.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import synth_lidar  # noqa: E402


def timeit(fn, *args, iters=10):
    import jax.numpy as jnp

    def sync(o):
        if isinstance(o, tuple):
            return [float(jnp.sum(x.astype(jnp.float32))) for x in o]
        return float(jnp.sum(o.astype(jnp.float32)))

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import build_graph, default_level_caps
    from gcl_tpu.core.pallas_conv import (bwd_fused_vmem_ok,
                                          fused_conv_bwd, fused_conv_dw,
                                          fused_conv_fwd)
    from gcl_tpu.core.types import map_key
    from gcl_tpu.data.device_pipeline import voxelize_per_cloud
    from gcl_tpu.models.resunet import ResUNetFatBN

    b, n_clouds, p_cap, nv_cap = 4, 7, 65536, 18432
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    n_flat = b * n_clouds * nv_cap
    caps = default_level_caps(n_flat, strides, 0.55)

    rng = np.random.RandomState(0)
    points = np.zeros((b * n_clouds, p_cap, 3), np.float32)
    for i in range(b * n_clouds):
        points[i] = synth_lidar(rng, p_cap)
    pmask = np.ones((b * n_clouds, p_cap), bool)

    @jax.jit
    def geom(points, pmask):
        vox = voxelize_per_cloud(points, pmask, 0.3, nv_cap)
        flat = vox.flatten()
        return flat, build_graph(flat.coords, flat.mask, specs, caps,
                                 method="fused", sorted_blocks=True,
                                 n_clouds=b * n_clouds)

    flat, graph = geom(jnp.asarray(points), jnp.asarray(pmask))
    graph = jax.tree_util.tree_map(jax.block_until_ready, graph)

    CH = [None, 32, 64, 128, 256]
    TR = [None, 128, 128, 128, 256]
    plan = [
        ("block1", CH[1], CH[1], 2),
        ("conv2", CH[1], CH[2], 1),
        ("block2", CH[2], CH[2], 2),
        ("conv3", CH[2], CH[3], 1),
        ("block3", CH[3], CH[3], 2),
        ("conv4", CH[3], CH[4], 1),
        ("block4", CH[4], CH[4], 2),
        ("conv4_tr", CH[4], TR[4], 1),
        ("block4_tr", TR[4], TR[4], 2),
        ("conv3_tr", TR[4] + CH[3], TR[3], 1),
        ("block3_tr", TR[3], TR[3], 2),
        ("conv2_tr", TR[3] + CH[2], TR[2], 1),
        ("block2_tr", TR[2], TR[2], 2),
    ]
    by_name = {sp.name: sp for sp in specs}
    krng = jax.random.PRNGKey(0)

    def two_pass(x, g, w, fm_q, fm_s, fm_n, fm_t, rm_q, rm_s, rm_n, rm_t,
                 win, rwin):
        wt = jnp.swapaxes(w[::-1], 1, 2)
        dx = fused_conv_fwd(g, wt, rm_q, rm_s, rm_n, rm_t, win=rwin)
        dw = fused_conv_dw(x, g, fm_q, fm_s, fm_n, fm_t, win=win)
        return dx, dw

    tot = {"two": 0.0, "one": 0.0}
    for lname, cin, cout, mult in plan:
        sp = by_name[lname]
        fm = graph.fused[sp.key]
        rm = graph.fused[map_key(sp.out_stride, sp.in_stride,
                                 sp.kernel_size, sp.dilation)]
        n_in = graph.levels[sp.in_stride].coords.shape[0]
        n_out = graph.levels[sp.out_stride].coords.shape[0]
        k = fm.qkey.shape[0]
        x = jax.random.normal(krng, (n_in, cin), jnp.bfloat16)
        w = jax.random.normal(krng, (k, cin, cout), jnp.bfloat16)
        g = jax.random.normal(krng, (n_out, cout), jnp.bfloat16)

        two_j = jax.jit(lambda x, g, w, fm=fm, rm=rm: two_pass(
            x, g, w, fm.qkey, fm.starts, fm.nch, fm.tkeys,
            rm.qkey, rm.starts, rm.nch, rm.tkeys, fm.win, rm.win))
        t_two = timeit(two_j, x, g, w)
        ok = bwd_fused_vmem_ok(k, cin, cout, rm.win)
        if ok:
            one_j = jax.jit(lambda x, g, w, fm=fm, rm=rm: fused_conv_bwd(
                x, g, w, rm.qkey, rm.starts, rm.nch, rm.tkeys,
                rwin=rm.win))
            t_one = timeit(one_j, x, g, w)
        else:
            t_one = t_two
        tot["two"] += t_two * mult
        tot["one"] += t_one * mult
        print(json.dumps({
            "layer": lname, "k": k, "cin": cin, "cout": cout,
            "mult": mult, "fused_ok": ok,
            "two_pass_ms": round(t_two * 1e3, 2),
            "one_pass_ms": round(t_one * 1e3, 2)}), flush=True)
    print(json.dumps({"total_two_s": round(tot["two"], 4),
                      "total_one_s": round(tot["one"], 4)}), flush=True)


if __name__ == "__main__":
    main()
