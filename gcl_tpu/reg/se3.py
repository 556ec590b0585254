"""SE(3) helpers (reference scripts/SC2_PCR/utils/SE3.py:5-112) in jnp."""
from __future__ import annotations

import jax.numpy as jnp


def transform(pts, trans):
    """trans_pts = R @ pts + t; supports [N,3] or [bs,N,3]."""
    if pts.ndim == 3:
        out = trans[:, :3, :3] @ pts.transpose(0, 2, 1) + trans[:, :3, 3:4]
        return out.transpose(0, 2, 1)
    return pts @ trans[:3, :3].T + trans[:3, 3]


def integrate_trans(R, t):
    """R [...,3,3], t [...,3,1] -> [...,4,4]."""
    batch = R.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(4), batch + (4, 4))
    out = eye.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3:4].set(t.reshape(batch + (3, 1)))
    return out


def decompose_trans(trans):
    return trans[..., :3, :3], trans[..., :3, 3:4]


def concatenate(trans1, trans2):
    """Composite transform: first trans2, then trans1."""
    r1, t1 = decompose_trans(trans1)
    r2, t2 = decompose_trans(trans2)
    return integrate_trans(r1 @ r2, r1 @ t2 + t1)
