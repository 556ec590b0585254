"""Window-span statistics for every kernel map at bench scale.

For each map geometry and several output-tile sizes, reports quantiles of
the per-tile input-window span (rows the conv/join kernels must cover with
WIN-sized chunks). Runs on CPU — set JAX_PLATFORMS=cpu.

Usage: JAX_PLATFORMS=cpu python -u scripts/profile_spans.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import synth_lidar  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import build_graph, default_level_caps
    from gcl_tpu.data.device_pipeline import voxelize_per_cloud
    from gcl_tpu.models.resunet import ResUNetFatBN

    n_clouds, p_cap, nv_cap = 7, 65536, 18432
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    n_flat = n_clouds * nv_cap
    caps = default_level_caps(n_flat, strides, 0.55)

    rng = np.random.RandomState(0)
    points = np.stack([synth_lidar(rng, p_cap) for _ in range(n_clouds)])
    pmask = np.ones((n_clouds, p_cap), bool)

    @jax.jit
    def geom(points, pmask):
        vox = voxelize_per_cloud(points, pmask, 0.3, nv_cap)
        flat = vox.flatten()
        return flat, build_graph(flat.coords, flat.mask, specs, caps,
                                 method="bsearch")

    flat, graph = geom(jnp.asarray(points), jnp.asarray(pmask))

    seen = set()
    for sp in specs:
        if sp.is_identity_map or sp.key in seen:
            continue
        seen.add(sp.key)
        kmap = np.asarray(graph.kmaps[sp.key])  # [K, N_out]
        k, n_out = kmap.shape
        n_in = graph.levels[sp.in_stride].coords.shape[0]
        valid_frac = float((kmap >= 0).mean())
        row = {"map": sp.key, "K": k, "n_out": n_out, "n_in": n_in,
               "fill": round(valid_frac, 3)}
        ksz = round(k ** (1 / 3))
        for tile in (128, 256):
            nt = -(-n_out // tile)
            pad = nt * tile - n_out
            km = np.pad(kmap, ((0, 0), (0, pad)), constant_values=-1)
            km = km.reshape(k, nt, tile)
            v = km >= 0
            lo = np.where(v, km, 2**30).min(axis=(0, 2))
            hi = np.where(v, km, -1).max(axis=(0, 2))
            any_v = hi >= 0
            span = np.where(any_v, hi - lo + 1, 0)[any_v]
            if len(span) == 0:
                continue
            row[f"t{tile}"] = [int(np.quantile(span, q))
                               for q in (0.5, 0.9, 0.99, 1.0)]
            # per-dx-group spans (offsets are x-major: k^2 rows per dx)
            kg = km.reshape(ksz, k // ksz, nt, tile)
            vg = kg >= 0
            lo_g = np.where(vg, kg, 2**30).min(axis=(1, 3))
            hi_g = np.where(vg, kg, -1).max(axis=(1, 3))
            any_g = hi_g >= 0
            span_g = np.where(any_g, hi_g - lo_g + 1, 0)[any_g]
            row[f"t{tile}_dx"] = [int(np.quantile(span_g, q))
                                  for q in (0.5, 0.9, 0.99, 1.0)]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
