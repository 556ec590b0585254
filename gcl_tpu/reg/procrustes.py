"""Weighted rigid alignment (Kabsch / weighted SVD) on device.

Reference scripts/SC2_PCR/common.py:7-45 — which falls back to CPU SVD;
here the batched 3x3 SVDs run on device (SURVEY.md §7 'hard parts').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import integrate_trans


def rigid_transform_3d(a: jax.Array, b: jax.Array,
                       weights: jax.Array | None = None,
                       weight_threshold: float = 0.0) -> jax.Array:
    """Weighted least-squares rigid transform mapping a -> b.

    a, b: [bs, n, 3]; weights: [bs, n] (None = uniform). Returns [bs,4,4].
    """
    if weights is None:
        weights = jnp.ones(a.shape[:2], a.dtype)
    weights = jnp.where(weights < weight_threshold, 0.0, weights)
    wsum = jnp.sum(weights, axis=1, keepdims=True)[:, :, None] + 1e-6
    centroid_a = jnp.sum(a * weights[:, :, None], axis=1,
                         keepdims=True) / wsum
    centroid_b = jnp.sum(b * weights[:, :, None], axis=1,
                         keepdims=True) / wsum
    am = a - centroid_a
    bm = b - centroid_b
    h = jnp.einsum("bnc,bn,bnd->bcd", am, weights, bm)
    u, s, vh = jnp.linalg.svd(h, full_matrices=False)
    v = vh.transpose(0, 2, 1)
    det = jnp.linalg.det(v @ u.transpose(0, 2, 1))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype),
                           (a.shape[0], 3, 3))
    eye = eye.at[:, 2, 2].set(det)
    r = v @ eye @ u.transpose(0, 2, 1)
    t = centroid_b.transpose(0, 2, 1) - r @ centroid_a.transpose(0, 2, 1)
    return integrate_trans(r, t)
