"""Registration metrics: RTE/RRE, registration recall, correspondence
losses (reference lib/metrics.py, scripts/test_kitti.py:189-207,
scripts/SC2_PCR/evaluate_metric.py:12-112).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rte_rre(t_est, t_gt):
    """Relative translation error (m) and rotation error (deg)."""
    t_est = np.asarray(t_est)
    t_gt = np.asarray(t_gt)
    rte = np.linalg.norm(t_est[:3, 3] - t_gt[:3, 3])
    c = (np.trace(t_est[:3, :3].T @ t_gt[:3, :3]) - 1) / 2
    rre = np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))
    return float(rte), float(rre)


def registration_success(t_est, t_gt, rte_thresh=2.0, rre_thresh=5.0):
    """Success criterion TE < 2 m, RE < 5 deg (reference README.md:28,
    scripts/test_kitti.py:195-207)."""
    rte, rre = rte_rre(t_est, t_gt)
    return (rte < rte_thresh and not np.isnan(rre)
            and rre < rre_thresh), rte, rre


def corr_dist(est, gth, xyz0, xyz1, weight=None, max_dist=1.0):
    """Clamped alignment discrepancy (reference lib/metrics.py:13-19)."""
    xyz0_est = xyz0 @ est[:3, :3].T + est[:3, 3]
    xyz0_gth = xyz0 @ gth[:3, :3].T + gth[:3, 3]
    dists = jnp.clip(
        jnp.sqrt(jnp.sum((xyz0_est - xyz0_gth) ** 2, axis=1)), None,
        max_dist)
    if weight is not None:
        dists = weight * dists
    return jnp.mean(dists)


def hit_ratio(xyz0_corr, xyz1_corr, t_gt, thresh):
    """Fraction of correspondences within thresh after GT alignment
    (reference lib/trainer.py:402-405)."""
    aligned = xyz0_corr @ np.asarray(t_gt)[:3, :3].T + np.asarray(
        t_gt)[:3, 3]
    dist = np.sqrt(((aligned - xyz1_corr) ** 2).sum(1) + 1e-6)
    return float((dist < thresh).mean())


class TransformationLoss:
    """RR / RE / TE / F1 at (re_thre deg, te_thre cm) — reference
    scripts/SC2_PCR/evaluate_metric.py:12-70."""

    def __init__(self, re_thre=15, te_thre=30):
        self.re_thre = re_thre
        self.te_thre = te_thre  # centimeters

    def __call__(self, trans, gt_trans, src_keypts, tgt_keypts,
                 pred_labels, gt_labels=None):
        recall = 0.0
        re_l, te_l, rmse_l = [], [], []
        bs = trans.shape[0]
        for b in range(bs):
            te, re = rte_rre(trans[b], gt_trans[b])
            te *= 100  # cm
            if te < self.te_thre and re < self.re_thre:
                recall += 1
                re_l.append(re)
                te_l.append(te)
        recall = recall * 100 / bs
        re = float(np.mean(re_l)) if re_l else 0.0
        te = float(np.mean(te_l)) if te_l else 0.0
        return recall, re, te


class ClassificationLoss:
    """Inlier P/R/F1 (reference evaluate_metric.py:73-112)."""

    def __call__(self, pred_labels, gt_labels):
        pred = np.asarray(pred_labels).reshape(-1) > 0.5
        gt = np.asarray(gt_labels).reshape(-1) > 0.5
        tp = (pred & gt).sum()
        precision = tp / max(pred.sum(), 1)
        recall = tp / max(gt.sum(), 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-12)
        return dict(precision=float(precision), recall=float(recall),
                    f1=float(f1))
