"""Host-facing helpers: the extract_features inference API
(reference util/misc.py:58-130) and square_distance.

The reference's integer pair hashes (_hash/_neg_hash/_exhaustive_hash,
util/misc.py:29-55) have no equivalent here: the device losses encode
intra-group exclusion as sorted pair lists / membership indexes
(losses/gcl.py) and nothing host-side needs the int64 hash trick.
"""
from __future__ import annotations

import math

import numpy as np


def square_distance(src, dst, normalised=False):
    """[B,N,C] x [B,M,C] -> [B,N,M] squared distances
    (reference util/misc.py:7-26)."""
    import jax.numpy as jnp

    dist = -2.0 * jnp.matmul(src, dst.transpose(0, 2, 1))
    if normalised:
        dist = dist + 2.0
    else:
        dist = dist + jnp.sum(src ** 2, -1)[:, :, None]
        dist = dist + jnp.sum(dst ** 2, -1)[:, None, :]
    return jnp.clip(dist, 1e-12, None)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def extract_features(model, params, batch_stats, xyz, rgb=None,
                     normal=None, voxel_size=0.05, step_cfg=None,
                     skip_check=False):
    """Voxelize one cloud and run the model — the reference inference
    entry (util/misc.py:58-130). Returns (return_coords, features) with
    return_coords the representative original points.

    If rgb/normal are given they become the input features ([rgb-0.5] /
    [normal/2]); otherwise occupancy ones.
    """
    import jax.numpy as jnp

    from ..core.kernel_maps import build_graph, default_level_caps
    from ..core.voxelize import voxelize_points

    if not skip_check:
        assert xyz.shape[1] == 3
        if rgb is not None:
            assert len(rgb) == len(xyz) and rgb.shape[1] == 3
            if np.any(rgb > 1):
                raise ValueError(
                    "Invalid color. Color must range from [0, 1]")
        if normal is not None:
            assert len(normal) == len(xyz) and normal.shape[1] == 3
            if np.any(normal > 1):
                raise ValueError(
                    "Invalid normal. Normal must range from [-1, 1]")

    feats_host = []
    if rgb is not None:
        feats_host.append(rgb - 0.5)
    if normal is not None:
        feats_host.append(normal / 2)
    if not feats_host:
        feats_host.append(np.ones((len(xyz), 1)))
    feats_host = np.hstack(feats_host).astype(np.float32)

    n_cap = _round_up(len(xyz), 4096)
    pts = np.zeros((1, n_cap, 3), np.float32)
    pts[0, :len(xyz)] = xyz
    mask = np.zeros((1, n_cap), bool)
    mask[0, :len(xyz)] = True

    batch, rep = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                                 voxel_size, n_cap)
    rep = np.asarray(rep)
    vmask = np.asarray(batch.mask)
    in_feats = np.zeros((n_cap, feats_host.shape[1]), np.float32)
    in_feats[vmask] = feats_host[rep[vmask, 1]]

    specs = type(model).conv_specs(model.conv1_kernel_size)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    caps = default_level_caps(n_cap, strides, 0.7)
    graph = build_graph(batch.coords, batch.mask, specs, caps)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      graph, jnp.asarray(in_feats), train=False)
    out = np.asarray(out)[vmask]
    return_coords = xyz[rep[vmask, 1]]
    return return_coords, out
