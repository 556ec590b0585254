"""Marginal timing of build_graph internals at bench scale.

Times progressively larger subsets of the fused-graph construction so
the cost of each stage is visible: level building, level packed keys,
per-map query keys, window computation.

Usage: python -u scripts/profile_graph.py
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
        leaves = [x for x in (o if isinstance(o, (tuple, list)) else [o])]
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

    from gcl_tpu.core import kernel_maps as km
    from gcl_tpu.core.coords import pack_keys, pack_query_keys
    from gcl_tpu.core.kernel_maps import (_build_fused_maps, _fold_clouds,
                                          _index_level_sorted,
                                          _downsample_level,
                                          default_level_caps,
                                          kernel_offsets)
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
    def vox_fn(points, pmask):
        vox = voxelize_per_cloud(points, pmask, 0.3, nv_cap)
        flat = vox.flatten()
        return flat.coords, flat.mask

    coords, mask = jax.block_until_ready(vox_fn(jnp.asarray(points),
                                                jnp.asarray(pmask)))

    def levels_fn(coords, mask):
        levels = {1: _index_level_sorted(coords, mask)}
        for s in strides:
            if s != 1:
                src = max(p for p in levels if s % p == 0)
                levels[s] = _downsample_level(levels[src].coords,
                                              levels[src].mask, s, caps[s])
        return levels

    t_levels = timeit(jax.jit(
        lambda c, m: tuple(lv.coords for lv in levels_fn(c, m).values())),
        coords, mask)
    print(json.dumps({"stage": "levels", "time_s": round(t_levels, 4)}),
          flush=True)

    # levels + per-level tkeys/upks
    from gcl_tpu.core.pallas_conv import max_win

    def tkeys_fn(c, m):
        levels = levels_fn(c, m)
        outs = []
        for s, lv in levels.items():
            t_pad = -(-(lv.coords.shape[0] + max_win()) // 128) * 128
            outs.append(km._level_tkeys(lv, s, t_pad))
            upk = (pack_keys(_fold_clouds(lv.coords), s)
                   ^ km._SIGN)[lv.perm]
            outs.append(upk)
        return tuple(outs)

    t_tk = timeit(jax.jit(tkeys_fn), coords, mask)
    print(json.dumps({"stage": "levels+tkeys+upks",
                      "time_s": round(t_tk, 4)}), flush=True)

    # + query keys for every unique map
    import dataclasses as dc
    uniq = []
    seen = set()
    for sp in specs:
        for cand in (sp, dc.replace(sp, name=sp.name + "_rev",
                                    in_stride=sp.out_stride,
                                    out_stride=sp.in_stride)):
            if cand.is_identity_map or cand.key in seen:
                continue
            seen.add(cand.key)
            uniq.append(cand)

    def qk_fn(c, m):
        levels = levels_fn(c, m)
        outs = []
        for sp in uniq:
            offs = kernel_offsets(sp.kernel_size) * sp.offset_scale
            folded = _fold_clouds(levels[sp.out_stride].coords)
            qk = jax.vmap(
                lambda o, f=folded, s=sp: pack_query_keys(f, o, s.in_stride)
            )(jnp.asarray(offs))
            outs.append(qk)
        return tuple(outs)

    t_qk = timeit(jax.jit(qk_fn), coords, mask)
    print(json.dumps({"stage": "levels+qkeys",
                      "time_s": round(t_qk, 4),
                      "n_maps": len(uniq)}), flush=True)

    # full fused-map build
    def full_fn(c, m):
        levels = levels_fn(c, m)
        fused = _build_fused_maps(levels, uniq)
        return tuple(fm.qkey for fm in fused.values()) + tuple(
            fm.starts for fm in fused.values())

    t_full = timeit(jax.jit(full_fn), coords, mask)
    print(json.dumps({"stage": "full_fused_build",
                      "time_s": round(t_full, 4)}), flush=True)


if __name__ == "__main__":
    main()
