"""Time the production conv1 path (presence-bitmask c1z kernels) at
bench scale: fwd + dW, on the real L1 geometry.

Usage: python -u scripts/probe_c1z.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_lidar  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core.kernel_maps import ConvSpec, build_graph, \
        default_level_caps
    from gcl_tpu.core import sparse_ops
    from gcl_tpu.data.device_pipeline import voxelize_per_cloud

    b, n_clouds, p_cap, nv_cap = 4, 7, 65536, 18432
    rng = np.random.RandomState(0)
    points = np.zeros((b * n_clouds, p_cap, 3), np.float32)
    for i in range(b * n_clouds):
        points[i] = synth_lidar(rng, p_cap)
    pmask = np.ones((b * n_clouds, p_cap), bool)

    spec = ConvSpec("conv1", 1, 1, 5)
    caps = default_level_caps(b * n_clouds * nv_cap, [1], 0.55)

    @jax.jit
    def geom(points, pmask):
        vox = voxelize_per_cloud(points, pmask, 0.3, nv_cap)
        flat = vox.flatten()
        return build_graph(flat.coords, flat.mask, [spec], caps,
                           method="fused", sorted_blocks=True,
                           n_clouds=b * n_clouds)

    g = geom(jnp.asarray(points), jnp.asarray(pmask))
    g = jax.tree_util.tree_map(jax.block_until_ready, g)
    fm = g.fused[spec.key]
    assert fm.c1z is not None
    w = jnp.asarray(rng.randn(125, 1, 32).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    cot_seed = 0.01

    def loss(w_):
        out = sparse_ops.sparse_conv_c1z(w_, fm, jnp.bfloat16)
        o = out.astype(jnp.float32)
        return jnp.sum(o * jnp.sin(cot_seed * jnp.arange(
            o.shape[0]))[:, None])

    fwd = jax.jit(lambda w_: sparse_ops.sparse_conv_c1z(
        w_, fm, jnp.bfloat16))
    vg = jax.jit(jax.value_and_grad(loss))

    def timeit(fn, *a, iters=10):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"c1z fwd:     {timeit(fwd, w):8.2f} ms", flush=True)
    print(f"c1z fwd+dw:  {timeit(vg, w):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
