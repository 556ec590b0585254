"""Correspondence-based RANSAC — vmapped hypothesis evaluation on device.

TPU-native replacement for Open3D's
registration_ransac_based_on_correspondence (used by the reference at
scripts/test_kitti.py:171-178 with 3-point samples, edge-length 0.8 and
distance checkers, 4M iterations / 0.999 confidence). A TPU evaluates
hypotheses in parallel instead of sequentially with early exit: we draw a
fixed number of minimal samples, apply the same edge-length/distance
prefilters, score all hypotheses by inlier count in one batched pass, and
refine the winner with iterative reweighted Kabsch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .procrustes import rigid_transform_3d
from .se3 import transform


@partial(jax.jit,
         static_argnames=("num_hypotheses", "sample_size", "refine_iters"))
def ransac_pose(src: jax.Array, tgt: jax.Array, key: jax.Array,
                distance_threshold: float,
                num_hypotheses: int = 16384,
                sample_size: int = 3,
                edge_length_ratio: float = 0.8,
                mask: jax.Array | None = None,
                refine_iters: int = 10):
    """Estimate the transform aligning corresponding src[i] -> tgt[i].

    Args:
      src, tgt: [N, 3] matched keypoints.
      key: PRNG key.
      distance_threshold: inlier radius (o3d checker semantics).
      num_hypotheses: minimal samples drawn (all evaluated in parallel).
      edge_length_ratio: o3d CorrespondenceCheckerBasedOnEdgeLength.
      mask: optional [N] validity for padded inputs.

    Returns (trans [4,4], inlier_mask [N], fitness scalar).
    """
    n = src.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask
    nvalid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    order = jnp.argsort(~valid)  # valid rows first

    samples = jax.random.randint(key, (num_hypotheses, sample_size), 0,
                                 jnp.int32(2 ** 30)) % nvalid
    samples = order[samples]  # [H, S] valid correspondence rows

    def hypothesis(idx):
        s = src[idx]
        t = tgt[idx]
        # edge-length check (o3d): every edge pair ratio within bounds
        ds = jnp.linalg.norm(s[:, None] - s[None], axis=-1)
        dt = jnp.linalg.norm(t[:, None] - t[None], axis=-1)
        off = ~jnp.eye(sample_size, dtype=bool)
        ok_edge = jnp.all(
            (ds * edge_length_ratio <= dt + 1e-9)
            & (dt * edge_length_ratio <= ds + 1e-9) | ~off)
        trans = rigid_transform_3d(s[None], t[None])[0]
        d = jnp.linalg.norm(transform(src, trans) - tgt, axis=-1)
        inl = (d < distance_threshold) & valid
        fitness = jnp.sum(inl) * ok_edge.astype(jnp.int32)
        return trans, fitness

    trans_h, fit_h = jax.lax.map(hypothesis,
                                 samples, batch_size=1024)
    best = jnp.argmax(fit_h)
    trans = trans_h[best]

    # refinement: iterative reweighted Kabsch over inliers
    def body(_, trans):
        d = jnp.linalg.norm(transform(src, trans) - tgt, axis=-1)
        w = ((d < distance_threshold) & valid).astype(src.dtype)
        return rigid_transform_3d(src[None], tgt[None], w[None])[0]

    trans = jax.lax.fori_loop(0, refine_iters, body, trans)
    d = jnp.linalg.norm(transform(src, trans) - tgt, axis=-1)
    inlier = (d < distance_threshold) & valid
    fitness = jnp.sum(inlier) / nvalid
    return trans, inlier, fitness
