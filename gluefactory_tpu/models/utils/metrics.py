"""Match-quality metrics vs GT labels.

Counterpart of reference gluefactory/models/utils/metrics.py:5-50.
"""

from __future__ import annotations

import jax.numpy as jnp


def matcher_metrics(pred, data, prefix: str = "", prefix_gt: str | None = None) -> dict:
    """Recall / precision / accuracy / ranking-AP of predicted matches vs GT.

    GT conventions: gt > -1 matched, == -1 unmatched, == -2 ignored.
    """
    if prefix_gt is None:
        prefix_gt = prefix
    m = pred[f"{prefix}matches0"]
    gt_m = data[f"gt_{prefix_gt}matches0"]
    scores = pred[f"{prefix}matching_scores0"]

    def recall(m, gt_m):
        mask = (gt_m > -1).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def accuracy(m, gt_m):
        mask = (gt_m >= -1).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def precision(m, gt_m):
        mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def ranking_ap(m, gt_m, scores):
        p_mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        r_mask = (gt_m > -1).astype(jnp.float32)
        order = jnp.argsort(-scores, axis=-1)
        sorted_p_mask = jnp.take_along_axis(p_mask, order, axis=-1)
        sorted_r_mask = jnp.take_along_axis(r_mask, order, axis=-1)
        sorted_tp = jnp.take_along_axis((m == gt_m).astype(jnp.float32), order, axis=-1)
        p_pts = jnp.cumsum(sorted_tp * sorted_p_mask, axis=-1) / (
            1e-8 + jnp.cumsum(sorted_p_mask, axis=-1)
        )
        r_pts = jnp.cumsum(sorted_tp * sorted_r_mask, axis=-1) / (
            1e-8 + sorted_r_mask.sum(-1)[:, None]
        )
        r_pts_diff = r_pts[..., 1:] - r_pts[..., :-1]
        return jnp.sum(r_pts_diff * p_pts[..., 1:], axis=-1)

    return {
        f"{prefix}match_recall": recall(m, gt_m),
        f"{prefix}match_precision": precision(m, gt_m),
        f"{prefix}accuracy": accuracy(m, gt_m),
        f"{prefix}average_precision": ranking_ap(m, gt_m, scores),
    }


__all__ = ["matcher_metrics"]
