"""Training diagnostics: the distance-vs-feature-error study behind the
GCL paper's density-invariance figures (reference
lib/colocation_trainer.py:683-731 and the calc_distance_err branch of
_train_epoch :861-916): for sampled colocation groups, record each
member's distance offset to the finest member's LiDAR range and its
feature distance to the finest member, dump everything to
`dist_err_normal.npz` after 20 iterations.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import ColocationGroups


def group_distance_errors(f_out: jax.Array, groups: ColocationGroups,
                          central_distance: jax.Array,
                          max_pos_cluster: int = 512):
    """Per-member (distance-to-finest-range, feature-error) pairs.

    central_distance: float[G, Kc] — each member's distance to its own
    LiDAR origin (own-frame norm). Returns masked flat arrays
    (dist_err[G*Kc], feat_err[G*Kc], mask[G*Kc]).
    """
    mi = jnp.clip(groups.member_idx, 0)
    feats = f_out[mi]  # [G, Kc, C]
    fin = groups.finest_pos[:, None, None]
    f_fin = jnp.take_along_axis(feats, fin, axis=1)[:, 0]
    d_fin = jnp.take_along_axis(central_distance,
                                groups.finest_pos[:, None], axis=1)[:, 0]
    dist_err = central_distance - d_fin[:, None]
    feat_err = jnp.linalg.norm(feats - f_fin[:, None, :], axis=-1)
    mask = groups.member_mask & groups.valid[:, None]
    return (dist_err.reshape(-1), feat_err.reshape(-1), mask.reshape(-1))


class DistErrCollector:
    """Accumulates per-iteration diagnostics and writes the reference's
    npz layout (`dist_err_normal.npz` with distance/err arrays)."""

    def __init__(self, out_dir: str, max_iters: int = 20):
        self.out_dir = out_dir
        self.max_iters = max_iters
        self.all_dist: List[np.ndarray] = []
        self.all_err: List[np.ndarray] = []
        self.iters = 0

    def update(self, dist_err, feat_err, mask):
        m = np.asarray(mask)
        self.all_dist.append(np.asarray(dist_err)[m])
        self.all_err.append(np.asarray(feat_err)[m])
        self.iters += 1
        return self.iters >= self.max_iters

    def save(self, tail: str = "normal"):
        import os

        path = os.path.join(self.out_dir, f"dist_err_{tail}")
        np.savez(path, distance=np.concatenate(self.all_dist),
                 err=np.concatenate(self.all_err))
        print("Saved distance-err points!", flush=True)
        return path + ".npz"
