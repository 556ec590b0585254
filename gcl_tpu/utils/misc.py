"""Host-facing helpers: the extract_features inference API
(reference util/misc.py:58-130), integer pair hashes (util/misc.py:29-55,
kept for API parity — device code uses sorted pair lists instead) and
square_distance.
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


def _exhaustive_hash(index_split, M):
    """All unordered intra-group pairs, symmetric min-hash
    (reference util/misc.py:29-36)."""
    result = []
    for indexes in index_split:
        indexes = np.asarray(indexes)
        for i in range(len(indexes) - 1):
            result.append(np.min(
                [indexes[i] + indexes[i + 1:] * M,
                 indexes[i] * M + indexes[i + 1:]], axis=0))
    if not result:
        return np.zeros((0,), np.int64)
    return np.concatenate(result, axis=0)


def _neg_hash(inds1, inds2, M):
    return np.min([inds1 * M + inds2, inds1 + inds2 * M], axis=0)


def _hash(arr, M):
    if isinstance(arr, np.ndarray):
        N, D = arr.shape
    else:
        N, D = len(arr[0]), len(arr)
    hash_vec = np.zeros(N, dtype=np.int64)
    for d in range(D):
        if isinstance(arr, np.ndarray):
            hash_vec += arr[:, d] * M ** d
        else:
            hash_vec += np.asarray(arr[d]) * M ** d
    return hash_vec


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
