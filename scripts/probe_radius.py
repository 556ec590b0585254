"""Standalone timing of the colocation radius search at bench scale.

Times batched_grid_radius_knn (the windowed_cell_topk Mosaic kernel +
its XLA sort/probe prologue) on the real bench voxel geometry, without
compiling the whole train step — fast A/B iteration on
GCL_RADIUS_TILE / GCL_RADIUS_WIN and kernel changes.

Usage: python -u scripts/probe_radius.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_lidar  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core import pallas_radius
    from gcl_tpu.data.device_pipeline import (batched_grid_radius_knn,
                                              voxelize_per_cloud)

    b, n_clouds, p_cap, nv_cap = 4, 7, 65536, 18432
    rng = np.random.RandomState(0)
    points = np.zeros((b * n_clouds, p_cap, 3), np.float32)
    for i in range(b * n_clouds):
        points[i] = synth_lidar(rng, p_cap)
    pmask = np.ones((b * n_clouds, p_cap), bool)

    vox = jax.jit(lambda p, m: voxelize_per_cloud(p, m, 0.3, nv_cap))(
        jnp.asarray(points), jnp.asarray(pmask))
    xyz = jax.block_until_ready(vox.xyz)   # [28, nv_cap, 3]
    mask = vox.mask

    s_n = xyz.shape[0]
    radius = jnp.full((s_n,), 0.45, jnp.float32)
    k, cell = 5, 1.08

    f = jax.jit(lambda q, qm, t, tm, r: batched_grid_radius_knn(
        q, qm, t, tm, r, k, cell))

    rows, hit = f(xyz, mask, xyz, mask, radius)
    _ = float(jnp.sum(rows))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        rows, hit = f(xyz, mask, xyz, mask, radius)
    _ = float(jnp.sum(rows))
    dt = (time.perf_counter() - t0) / iters
    print(f"TILE={pallas_radius.TILE} WIN={pallas_radius.WIN} "
          f"k={k}: {dt * 1e3:8.2f} ms  (hits={int(jnp.sum(hit))})",
          flush=True)

    if os.environ.get("GCL_RADIUS_CHECK") == "1":
        from gcl_tpu.data.device_pipeline import grid_radius_knn
        rows_n, hit_n = np.asarray(rows), np.asarray(hit)
        bad_tot = 0
        for s in range(s_n):
            i0, h0 = grid_radius_knn(xyz[s], mask[s], xyz[s], mask[s],
                                     float(radius[0]), k, cell=cell,
                                     cell_cap=64)
            i0, h0 = np.asarray(i0), np.asarray(h0)
            if not np.array_equal(h0, hit_n[s]):
                d = np.where((h0 != hit_n[s]).any(axis=1))[0]
                bad_tot += len(d)
                if len(d) and bad_tot < 40:
                    qi = int(d[0])
                    print(f"search {s}: {len(d)} query rows differ; "
                          f"q{qi} xyz={np.asarray(xyz[s][qi])} "
                          f"ref_hits={h0[qi].sum()} "
                          f"got={hit_n[s][qi].sum()}", flush=True)
        print("total differing query rows:", bad_tot, flush=True)


if __name__ == "__main__":
    main()
