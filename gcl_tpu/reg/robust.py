"""Robust linearized pose estimation (validation pose) —
est_quad_linear_robust (reference util/transform_estimation.py:89-116):
20 rounds of small-angle weighted least squares with Geman-McClure-style
reweighting, `par` halved every 5 rounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _get_trans(x):
    """x: [6] = (rx, ry, rz, tx, ty, tz) small-angle parameters ->
    4x4 with R = Rz Ry Rx (reference :41-45)."""
    cx, sx = jnp.cos(x[0]), jnp.sin(x[0])
    cy, sy = jnp.cos(x[1]), jnp.sin(x[1])
    cz, sz = jnp.cos(x[2]), jnp.sin(x[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    t = jnp.eye(4)
    t = t.at[:3, :3].set(rz @ ry @ rx)
    t = t.at[:3, 3].set(x[3:])
    return t


def _build_system(pts0, pts1, weight):
    """A x = b linearization (reference :56-77); weight [N,1]."""
    n = pts0.shape[0]
    z = jnp.zeros(n)
    o = jnp.ones(n)
    a0 = jnp.stack([z, pts0[:, 2], -pts0[:, 1], o, z, z], 1)
    a1 = jnp.stack([-pts0[:, 2], z, pts0[:, 0], z, o, z], 1)
    a2 = jnp.stack([pts0[:, 1], -pts0[:, 0], z, z, z, o], 1)
    w = jnp.concatenate([weight, weight, weight], 0)
    a = w * jnp.concatenate([a0, a1, a2], 0)
    b = w * jnp.concatenate(
        [pts1[:, 0] - pts0[:, 0], pts1[:, 1] - pts0[:, 1],
         pts1[:, 2] - pts0[:, 2]], 0)[:, None]
    return a, b


def est_quad_linear_robust(pts0, pts1, weight=None, mask=None,
                           iters: int = 20):
    """Estimate T aligning pts0 onto pts1. `mask` zeroes padded rows
    (the static-shape generalization of the reference)."""
    n = pts0.shape[0]
    if weight is None:
        weight = jnp.ones((n, 1), pts0.dtype)
    if mask is not None:
        weight = weight * mask[:, None].astype(pts0.dtype)

    def body(i, carry):
        pts0_curr, trans, weight, par = carry
        par = jnp.where((i > 0) & (i % 5 == 0), par / 2.0, par)
        a, b = _build_system(pts0_curr, pts1, weight)
        ata = a.T @ a
        x = jnp.linalg.solve(ata + 1e-9 * jnp.eye(6), a.T @ b)[:, 0]
        tc = _get_trans(x)
        pts0_curr = pts0_curr @ tc[:3, :3].T + tc[:3, 3]
        weight = par / (jnp.linalg.norm(pts0_curr - pts1,
                                        axis=1)[:, None] + par)
        if mask is not None:
            weight = weight * mask[:, None].astype(pts0.dtype)
        return pts0_curr, tc @ trans, weight, par

    init = (pts0, jnp.eye(4, dtype=pts0.dtype), weight,
            jnp.asarray(1.0, pts0.dtype))
    _, trans, _, _ = jax.lax.fori_loop(0, iters, body, init)
    return trans
