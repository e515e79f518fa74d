"""Training-time match visualization.

Counterpart of reference gluefactory/visualization/visualize_batch.py:7-74:
build figures of predicted matches colored by GT correctness (TP green / FP
red) for TensorBoard/file logging during training.
"""

from __future__ import annotations

import numpy as np

from ..utils.tensor import batch_to_numpy
from .viz2d import cm_RdGn, plot_images, plot_keypoints, plot_matches


def make_match_figures(pred, data, n_pairs: int = 2):
    """Figure dict {'matching': fig} for the first n_pairs of the batch."""
    pred = batch_to_numpy(pred)
    data = batch_to_numpy(data)
    images, kpts, matches, colors = [], [], [], []
    for i in range(min(n_pairs, len(pred["keypoints0"]))):
        img0 = data["view0"]["image"][i]
        img1 = data["view1"]["image"][i]
        kp0 = pred["keypoints0"][i]
        kp1 = pred["keypoints1"][i]
        m0 = pred["matches0"][i]
        valid = m0 > -1
        kpm0 = kp0[valid]
        kpm1 = kp1[np.clip(m0[valid], 0, None)]
        if "gt_matches0" in pred or "gt_matches0" in data:
            gt = (pred if "gt_matches0" in pred else data)["gt_matches0"][i]
            correct = (m0 == gt)[valid]
            color = cm_RdGn(correct.astype(float)).tolist()
        else:
            color = "lime"
        images.append([img0, img1])
        kpts.append([kp0, kp1])
        matches.append((kpm0, kpm1))
        colors.append(color)

    figs = {}
    for i, (imgs, kps, (kpm0, kpm1), color) in enumerate(
        zip(images, kpts, matches, colors)
    ):
        fig, axes = plot_images(imgs)
        plot_keypoints(kps, axes=axes, colors="royalblue")
        if len(kpm0):
            plot_matches(kpm0, kpm1, color=color, axes=axes, ps=0, a=0.6)
        figs[f"matching_{i}"] = fig
    return figs


__all__ = ["make_match_figures"]
