"""DeepLSD-style learned line detection.

Counterpart of reference models/lines/deeplsd.py (pretrained DeepLSD net,
113 LoC). The original downloads a checkpoint; here the ARCHITECTURE is
native flax (U-Net predicting a line distance field + orientation field,
DeepLSD's intermediate representation) and segment EXTRACTION runs on host:
the predicted distance field gates a classical segment grower (cv2
HoughLinesP over the thresholded field). With converted official weights the
fields become meaningful; at random init this degrades to a learnable
line-detection scaffold (training objective out of scope this round).

Outputs match lines/lsd.py: lines (B, L, 2, 2), line_scores (B, L),
line_mask (B, L).
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel


class _DownBlock(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (3, 3), padding="SAME")(x)
        x = nn.relu(nn.GroupNorm(num_groups=4)(x))
        x = nn.Conv(self.c, (3, 3), padding="SAME")(x)
        return nn.relu(nn.GroupNorm(num_groups=4)(x))


class DeepLSD(BaseModel):
    default_conf = {
        "name": "deeplsd",
        "weights": None,
        "max_num_lines": 250,
        "min_length": 15.0,
        "df_threshold": 1.5,  # px distance-field threshold for line support
        "channels": [16, 32, 64],
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]
        if image.shape[-1] == 3:
            image = jnp.sum(
                image * jnp.asarray([0.299, 0.587, 0.114], image.dtype), -1,
                keepdims=True,
            )
        c1, c2, c3 = conf.channels
        d1 = _DownBlock(c1)(image)
        p1 = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = _DownBlock(c2)(p1)
        p2 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = _DownBlock(c3)(p2)
        b, h, w, _ = image.shape

        def up(x, skip):
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[-1]), "bilinear"
            )
            return jnp.concatenate([x, skip], -1)

        u2 = _DownBlock(c2)(up(d3, d2))
        u1 = _DownBlock(c1)(up(u2, d1))
        head = nn.Conv(3, (1, 1))(u1)
        df = nn.relu(head[..., 0])  # line distance field (px)
        angle = jnp.arctan2(head[..., 1], head[..., 2]) / 2  # orientation field

        lines, scores, mask = _extract_segments_host(
            np.asarray(jax.lax.stop_gradient(df)),
            float(conf.df_threshold), int(conf.max_num_lines),
            float(conf.min_length),
        )
        return {
            "lines": jnp.asarray(lines),
            "line_scores": jnp.asarray(scores),
            "line_mask": jnp.asarray(mask),
            "df": df,
            "line_level": angle,
        }

    def loss(self, pred, data):
        raise NotImplementedError


def _extract_segments_host(df: np.ndarray, th: float, max_lines: int, min_len: float):
    """Host extraction: threshold the distance field and grow segments with
    probabilistic Hough (the classical stage of the DeepLSD pipeline)."""
    b = df.shape[0]
    lines = np.zeros((b, max_lines, 2, 2), np.float32)
    scores = np.zeros((b, max_lines), np.float32)
    mask = np.zeros((b, max_lines), bool)
    for i in range(b):
        support = (df[i] < th).astype(np.uint8) * 255
        segs = cv2.HoughLinesP(
            support, 1, np.pi / 180, threshold=30,
            minLineLength=int(min_len), maxLineGap=4,
        )
        if segs is None:
            continue
        segs = segs.reshape(-1, 2, 2).astype(np.float32)
        lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
        order = np.argsort(-lengths)[:max_lines]
        n = len(order)
        lines[i, :n] = segs[order]
        sc = np.sqrt(lengths[order])
        scores[i, :n] = sc / (sc.max() + 1e-8)
        mask[i, :n] = True
    return lines, scores, mask


__main_model__ = DeepLSD
