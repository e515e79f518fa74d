"""DeepLSD-style learned line detection.

Counterpart of reference models/lines/deeplsd.py (pretrained DeepLSD net
wrapper, 113 LoC; the net itself lives in the external `deeplsd` package,
reference deeplsd.py:1,35 — not vendored, so no weight converter is possible
hermetically). Here the ARCHITECTURE is native flax (U-Net predicting a line
distance field + orientation field, DeepLSD's intermediate representation)
and segment EXTRACTION runs on host: the predicted distance field gates a
classical segment grower (cv2 HoughLinesP over the thresholded field).

Unlike the reference wrapper this model is TRAINABLE: `loss()` implements the
DeepLSD paper's field supervision (normalized distance-field regression +
proximity-weighted angular loss), and `gt_line_fields()` builds exact GT
fields from known segments (e.g. SyntheticShapes lines or the C++ LSD
output on real images — the paper's own GT source is LSD on homography
warps). `tests/test_lines.py` closes the hermetic quality loop: overfit the
fields on synthetic line images, then recover the segments through the full
extraction path.

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
        # training runs fully on device; the host segment grower is not
        # differentiable/traceable, so training configs switch it off
        "extract_segments": True,
        "max_dist": 5.0,  # df normalization radius (paper's r in d/r)
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
        # (sin 2θ, cos 2θ) vector — angles live on the π-periodic circle.
        # eps INSIDE the sqrt: linalg.norm has a NaN gradient at the zero
        # vector even behind a maximum() guard (NaN * 0 = NaN in the VJP).
        avec = head[..., 1:3]
        avec = avec * jax.lax.rsqrt(jnp.sum(avec * avec, -1, keepdims=True) + 1e-8)
        angle = jnp.arctan2(avec[..., 0], avec[..., 1]) / 2  # orientation field

        out = {"df": df, "line_level": angle, "angle_vec": avec}
        if not conf.extract_segments:
            return out
        # host segment grower behind pure_callback with static output shapes
        # (same pattern as sift.py's host extraction) so the default
        # inference path stays jit-traceable (ADVICE r3)
        L = int(conf.max_num_lines)
        lines, scores, mask = jax.pure_callback(
            lambda d: _extract_segments_host(
                np.asarray(d), float(conf.df_threshold), L,
                float(conf.min_length),
            ),
            (
                jax.ShapeDtypeStruct((b, L, 2, 2), jnp.float32),
                jax.ShapeDtypeStruct((b, L), jnp.float32),
                jax.ShapeDtypeStruct((b, L), jnp.bool_),
            ),
            jax.lax.stop_gradient(df),
            vmap_method="sequential",
        )
        out.update(lines=lines, line_scores=scores, line_mask=mask)
        return out

    def loss(self, pred, data):
        """DeepLSD field supervision (DeepLSD paper Sec. 3.2; GT fields from
        `gt_line_fields`). L1 on the r-normalized clipped distance field plus
        an angular loss on the doubled-angle unit vector, weighted toward
        pixels near lines (w = 1 - d/r), which is where the orientation is
        defined."""
        r = float(self.conf.max_dist)
        gt_df = jnp.minimum(data["gt_df"], r) / r
        pred_df = jnp.minimum(pred["df"], r) / r
        l_df = jnp.abs(pred_df - gt_df).mean(axis=(-1, -2))

        gt_vec = jnp.stack(
            [jnp.sin(2 * data["gt_angle"]), jnp.cos(2 * data["gt_angle"])], -1
        )
        w = jnp.maximum(0.0, 1.0 - gt_df)  # ~1 on lines, 0 beyond r
        ang_err = jnp.square(pred["angle_vec"] - gt_vec).sum(-1)
        l_angle = (w * ang_err).sum(axis=(-1, -2)) / jnp.maximum(
            w.sum(axis=(-1, -2)), 1.0
        )
        total = l_df + l_angle
        return {"total": total, "df": l_df, "angle": l_angle}, {}


def gt_line_fields(
    lines: np.ndarray, line_mask: np.ndarray, shape: tuple, max_dist: float = 5.0
):
    """Exact GT (distance field, angle field) from known segments.

    lines (B, L, 2, 2) xy endpoints, line_mask (B, L) validity, shape (H, W).
    Returns gt_df (B, H, W) point-to-segment distance (clipped at max_dist)
    and gt_angle (B, H, W) orientation (mod π) of the nearest segment.
    This is the supervision source the DeepLSD paper derives from LSD
    detections; with SyntheticShapes the segments are known analytically.
    """
    h, w = shape
    b, L = line_mask.shape
    ys, xs = np.mgrid[0:h, 0:w]
    p = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)  # (P, 2)
    gt_df = np.full((b, h * w), max_dist, np.float32)
    gt_angle = np.zeros((b, h * w), np.float32)
    for i in range(b):
        segs = lines[i][line_mask[i]]  # (l, 2, 2)
        if len(segs) == 0:
            continue
        a, bb = segs[:, 0], segs[:, 1]  # (l, 2)
        ab = bb - a
        denom = np.maximum((ab * ab).sum(-1), 1e-8)  # (l,)
        ap = p[:, None, :] - a[None, :, :]  # (P, l, 2)
        t = np.clip((ap * ab[None]).sum(-1) / denom[None], 0.0, 1.0)
        closest = a[None] + t[..., None] * ab[None]  # (P, l, 2)
        d = np.linalg.norm(p[:, None] - closest, axis=-1)  # (P, l)
        nearest = d.argmin(-1)
        gt_df[i] = np.minimum(d[np.arange(len(p)), nearest], max_dist)
        ang = np.arctan2(ab[:, 1], ab[:, 0]) % np.pi  # (l,)
        gt_angle[i] = ang[nearest]
    return gt_df.reshape(b, h, w), gt_angle.reshape(b, h, w)


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
