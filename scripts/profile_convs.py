"""Per-layer timing of every sparse conv in ResUNetFatBN at bench scale.

Builds the real voxel hierarchy + kernel maps from the bench.py synthetic
batch, then times each conv's forward, dX (reverse-map gather-GEMM) and
dW Pallas kernels in isolation. Prints one JSON line per layer.

Usage: python -u scripts/profile_convs.py
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
        # scalar sum -> 4-byte host transfer (axon block_until_ready is
        # unreliable; full np.asarray would measure host transfer instead)
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
    from gcl_tpu.core.pallas_conv import pallas_conv_dw, pallas_conv_fwd
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
        return flat, build_graph(flat.coords, flat.mask, specs, caps, method="pallas")

    flat, graph = geom(jnp.asarray(points), jnp.asarray(pmask))
    graph = jax.tree_util.tree_map(jax.block_until_ready, graph)

    # channel plan per conv (ResUNetFatBN)
    CH = [None, 32, 64, 128, 256]
    TR = [None, 128, 128, 128, 256]
    plan = [
        ("conv1", 1, CH[1]),
        ("block1a", CH[1], CH[1]), ("block1b", CH[1], CH[1]),
        ("conv2", CH[1], CH[2]),
        ("block2a", CH[2], CH[2]), ("block2b", CH[2], CH[2]),
        ("conv3", CH[2], CH[3]),
        ("block3a", CH[3], CH[3]), ("block3b", CH[3], CH[3]),
        ("conv4", CH[3], CH[4]),
        ("block4a", CH[4], CH[4]), ("block4b", CH[4], CH[4]),
        ("conv4_tr", CH[4], TR[4]),
        ("block4tra", TR[4], TR[4]), ("block4trb", TR[4], TR[4]),
        ("conv3_tr", TR[4] + CH[3], TR[3]),
        ("block3tra", TR[3], TR[3]), ("block3trb", TR[3], TR[3]),
        ("conv2_tr", TR[3] + CH[2], TR[2]),
        ("block2tra", TR[2], TR[2]), ("block2trb", TR[2], TR[2]),
    ]
    geo = {  # layer -> (map spec name base)
        "conv1": "conv1", "block1a": "block1", "block1b": "block1",
        "conv2": "conv2", "block2a": "block2", "block2b": "block2",
        "conv3": "conv3", "block3a": "block3", "block3b": "block3",
        "conv4": "conv4", "block4a": "block4", "block4b": "block4",
        "conv4_tr": "conv4_tr", "block4tra": "block4_tr",
        "block4trb": "block4_tr",
        "conv3_tr": "conv3_tr", "block3tra": "block3_tr",
        "block3trb": "block3_tr",
        "conv2_tr": "conv2_tr", "block2tra": "block2_tr",
        "block2trb": "block2_tr",
    }
    by_name = {sp.name: sp for sp in specs}
    krng = jax.random.PRNGKey(0)

    fwd_j = jax.jit(pallas_conv_fwd)
    dw_j = jax.jit(pallas_conv_dw)
    tot = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
    for lname, cin, cout in plan:
        sp = by_name[geo[lname]]
        kmap = graph.kmaps[sp.key]
        from gcl_tpu.core.types import map_key
        rkey = map_key(sp.out_stride, sp.in_stride, sp.kernel_size,
                       sp.dilation)
        rmap = graph.kmaps[rkey]
        n_in = graph.levels[sp.in_stride].coords.shape[0]
        n_out = graph.levels[sp.out_stride].coords.shape[0]
        x = jax.random.normal(krng, (n_in, cin), jnp.bfloat16)
        w = jax.random.normal(krng, (kmap.shape[0], cin, cout),
                              jnp.bfloat16)
        g = jax.random.normal(krng, (n_out, cout), jnp.bfloat16)
        wt = jnp.swapaxes(w[::-1], 1, 2)
        idx = jnp.where(kmap < 0, n_in, kmap)
        ridx = jnp.where(rmap < 0, n_out, rmap)
        t_fwd = timeit(fwd_j, x, w, idx)
        t_dx = timeit(fwd_j, g, wt, ridx)
        t_dw = timeit(dw_j, x, g, idx)
        tot["fwd"] += t_fwd
        tot["dx"] += t_dx
        tot["dw"] += t_dw
        print(json.dumps({
            "layer": lname, "k": int(kmap.shape[0]), "n_in": n_in,
            "n_out": n_out, "cin": cin, "cout": cout,
            "fwd_ms": round(t_fwd * 1e3, 2),
            "dx_ms": round(t_dx * 1e3, 2),
            "dw_ms": round(t_dw * 1e3, 2)}), flush=True)
    print(json.dumps({"total_fwd_s": round(tot["fwd"], 4),
                      "total_dx_s": round(tot["dx"], 4),
                      "total_dw_s": round(tot["dw"], 4)}), flush=True)


if __name__ == "__main__":
    main()
