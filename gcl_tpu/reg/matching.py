"""Feature nearest-neighbor matching (reference lib/eval.py:9-48 and the
find_corr helpers of lib/trainer.py:386-400) — chunked device argmin.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e30


@partial(jax.jit, static_argnames=("chunk", "squared"))
def find_nn(f0: jax.Array, f1: jax.Array, mask1: jax.Array | None = None,
            chunk: int = 2048, squared: bool = True):
    """Nearest row of f1 for every row of f0 (chunked brute force).

    Equivalent of find_nn_gpu with nn_max_n=chunk (reference
    lib/eval.py:18-48). Returns (inds int32[N0], dists[N0]).
    """
    n0 = f0.shape[0]
    pad = (-n0) % chunk
    f0p = jnp.pad(f0, ((0, pad), (0, 0)))
    n1sq = jnp.sum(f1 * f1, axis=1)
    if mask1 is not None:
        n1sq = jnp.where(mask1, n1sq, _BIG)

    def per_chunk(fc):
        d = (jnp.sum(fc * fc, 1)[:, None] + n1sq[None, :]
             - 2.0 * fc @ f1.T)
        if mask1 is not None:
            d = jnp.where(mask1[None, :], d, _BIG)
        return jnp.argmin(d, 1).astype(jnp.int32), jnp.min(d, 1)

    inds, d2 = jax.lax.map(per_chunk, f0p.reshape(-1, chunk, f0.shape[1]))
    inds = inds.reshape(-1)[:n0]
    d2 = d2.reshape(-1)[:n0]
    d2 = jnp.maximum(d2, 0.0)
    return inds, (d2 if squared else jnp.sqrt(d2 + 1e-7))


def find_nn_cpu(feat0, feat1, return_distance=False):
    """scipy cKDTree NN (reference lib/eval.py:9-15)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(feat1)
    dists, nn_inds = tree.query(feat0, k=1)
    if return_distance:
        return nn_inds, dists
    return nn_inds


def find_corr(xyz0, xyz1, f0, f1, key, subsample_size=-1, chunk=2048):
    """Feature-NN correspondence sets with optional random subsampling
    (reference lib/trainer.py:386-400 / scripts/test_kitti.py:29-43).

    xyz*, f* are unpadded device or numpy arrays. Returns (xyz0_corr,
    xyz1_corr).
    """
    n0, n1 = f0.shape[0], f1.shape[0]
    if 0 < subsample_size < n0:
        k0, k1 = jax.random.split(key)
        inds0 = jax.random.choice(k0, n0, (subsample_size,), replace=False)
        f0 = f0[inds0]
        xyz0 = xyz0[inds0]
        if subsample_size < n1:
            inds1 = jax.random.choice(k1, n1, (subsample_size,),
                                      replace=False)
            f1 = f1[inds1]
            xyz1 = xyz1[inds1]
    nn, _ = find_nn(f0, f1, chunk=chunk)
    return xyz0, xyz1[nn]


@partial(jax.jit, static_argnames=("chunk",))
def mutual_feature_match(src_feats, tgt_feats, tgt_mask=None, chunk=2048):
    """SC2-PCR's coarse matching (scripts/SC2_PCR/SC2_PCR.py:277-302):
    argmin over normalized-feature distances sqrt(2 - 2 f0 f1^T + 1e-6)."""
    inds, _ = find_nn(src_feats, tgt_feats, tgt_mask, chunk=chunk)
    return inds
