"""Detector/descriptor evaluation metrics for multispectral models.

Counterpart of reference gluefactory/multipoint/utils/evaluation.py:10-213:
repeatability of detections under a known homography, localization error,
and descriptor matching score.
"""

from __future__ import annotations

import numpy as np

from ...geometry.homography import warp_points_np


def keypoints_from_prob(prob: np.ndarray, threshold: float = 0.015, nms: int = 4,
                        top_k: int | None = None):
    """Extract (N, 2) xy keypoints from a probability map (host, eval only)."""
    import jax.numpy as jnp

    from ...models.extractors.superpoint_open import simple_nms

    heat = np.asarray(simple_nms(jnp.asarray(prob[None]), nms)[0])
    ys, xs = np.where(heat > threshold)
    scores = heat[ys, xs]
    order = np.argsort(-scores)
    if top_k:
        order = order[:top_k]
    return np.stack([xs[order], ys[order]], -1).astype(np.float32) + 0.5, scores[order]


def repeatability(kpts0, kpts1, H_0to1, shape, dist_thresh: float = 3.0) -> float:
    """Fraction of keypoints re-detected within dist_thresh under H
    (reference evaluation.py:10-80 semantics)."""
    if len(kpts0) == 0 or len(kpts1) == 0:
        return 0.0
    w, h = shape
    k0_w = warp_points_np(kpts0, H_0to1)
    vis0 = (k0_w[:, 0] >= 0) & (k0_w[:, 0] < w) & (k0_w[:, 1] >= 0) & (k0_w[:, 1] < h)
    k1_w = warp_points_np(kpts1, H_0to1, inverse=True)
    vis1 = (k1_w[:, 0] >= 0) & (k1_w[:, 0] < w) & (k1_w[:, 1] >= 0) & (k1_w[:, 1] < h)
    if vis0.sum() == 0 or vis1.sum() == 0:
        return 0.0
    d0 = np.linalg.norm(k0_w[vis0][:, None] - kpts1[None], axis=-1).min(-1)
    d1 = np.linalg.norm(k1_w[vis1][:, None] - kpts0[None], axis=-1).min(-1)
    count = (d0 <= dist_thresh).sum() + (d1 <= dist_thresh).sum()
    return float(count / (vis0.sum() + vis1.sum()))


def localization_error(kpts0, kpts1, H_0to1, dist_thresh: float = 3.0) -> float:
    """Mean distance of re-detected keypoints (reference evaluation.py:83-120)."""
    if len(kpts0) == 0 or len(kpts1) == 0:
        return float("nan")
    k0_w = warp_points_np(kpts0, H_0to1)
    d = np.linalg.norm(k0_w[:, None] - kpts1[None], axis=-1).min(-1)
    close = d <= dist_thresh
    return float(d[close].mean()) if close.any() else float("nan")


def matching_score(desc0, desc1, kpts0, kpts1, H_0to1, dist_thresh: float = 3.0) -> float:
    """Fraction of mutual-NN descriptor matches that are geometrically correct
    (reference evaluation.py:123-213)."""
    if len(desc0) == 0 or len(desc1) == 0:
        return 0.0
    sim = desc0 @ desc1.T
    nn0 = sim.argmax(1)
    nn1 = sim.argmax(0)
    mutual = nn1[nn0] == np.arange(len(desc0))
    if mutual.sum() == 0:
        return 0.0
    k0_w = warp_points_np(kpts0[mutual], H_0to1)
    d = np.linalg.norm(k0_w - kpts1[nn0[mutual]], axis=-1)
    return float((d <= dist_thresh).mean())


__all__ = [
    "keypoints_from_prob", "repeatability", "localization_error", "matching_score",
]
