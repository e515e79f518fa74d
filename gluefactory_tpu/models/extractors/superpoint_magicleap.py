"""SuperPoint, MagicLeap architecture (weight-compatible).

Counterpart of reference gluefactory_nonfree/superpoint.py (356 LoC): the
original VGG encoder WITHOUT batchnorm (conv+ReLU only), 65-channel detector
and 256-d descriptor heads. Official weights cannot be downloaded here
(zero-egress), but `scripts/convert_superpoint_weights.py` maps the public
.pth into this module's parameter tree; layer names follow the original
(conv1a..convDb) so the mapping is 1:1.

The descriptor sampling implements BOTH conventions of the reference
(superpoint.py:117-149): the `legacy_sampling` grid (required for official
weights) and the corrected one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..base_model import BaseModel
from .superpoint_open import simple_nms


def sample_descriptors_legacy(keypoints, descriptors, s: int = 8):
    """The original (slightly off) sampling grid kept for weight
    compatibility (reference superpoint.py:117-133)."""
    b, hc, wc, d = descriptors.shape
    kp = keypoints - s / 2 + 0.5
    kp = kp / jnp.asarray([(wc * s - s / 2 - 0.5), (hc * s - s / 2 - 0.5)])
    kp = kp * 2 - 1  # normalized (-1, 1)
    # align_corners=True bilinear sampling
    x = (kp[..., 0] + 1) / 2 * (wc - 1)
    y = (kp[..., 1] + 1) / 2 * (hc - 1)
    return _bilinear(descriptors, x, y)


def sample_descriptors_fixed(keypoints, descriptors, s: int = 8):
    """Corrected sampling (reference superpoint.py:138-149)."""
    b, hc, wc, d = descriptors.shape
    x = (keypoints[..., 0] + 0.5) / s - 0.5
    y = (keypoints[..., 1] + 0.5) / s - 0.5
    return _bilinear(descriptors, x, y)


def _bilinear(fmap, x, y):
    b, h, w, d = fmap.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = fmap.reshape(b, h * w, d)

    def g(iy, ix):
        return jnp.take_along_axis(flat, (iy * w + ix)[..., None], axis=1)

    out = (
        g(y0i, x0i) * ((1 - wx) * (1 - wy))[..., None]
        + g(y0i, x1i) * (wx * (1 - wy))[..., None]
        + g(y1i, x0i) * ((1 - wx) * wy)[..., None]
        + g(y1i, x1i) * (wx * wy)[..., None]
    )
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)


class SuperPointMagicLeap(BaseModel):
    default_conf = {
        "name": "superpoint_magicleap",
        "descriptor_dim": 256,
        "nms_radius": 4,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "legacy_sampling": True,  # official weights expect the legacy grid
        "dense_outputs": False,
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

        def conv(x, c, k, name):
            return nn.Conv(c, (k, k), padding="SAME", name=name)(x)

        relu = nn.relu
        pool = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))
        x = relu(conv(image, 64, 3, "conv1a"))
        x = relu(conv(x, 64, 3, "conv1b"))
        x = pool(x)
        x = relu(conv(x, 64, 3, "conv2a"))
        x = relu(conv(x, 64, 3, "conv2b"))
        x = pool(x)
        x = relu(conv(x, 128, 3, "conv3a"))
        x = relu(conv(x, 128, 3, "conv3b"))
        x = pool(x)
        x = relu(conv(x, 128, 3, "conv4a"))
        x = relu(conv(x, 128, 3, "conv4b"))

        cPa = relu(conv(x, 256, 3, "convPa"))
        scores_cells = conv(cPa, 65, 1, "convPb")
        scores = jax.nn.softmax(scores_cells, -1)[..., :-1]
        b, hc, wc, _ = scores.shape
        scores = scores.reshape(b, hc, wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        cDa = relu(conv(x, 256, 3, "convDa"))
        dense = conv(cDa, conf.descriptor_dim, 1, "convDb")
        dense = dense / jnp.maximum(
            jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-8
        )

        scores = simple_nms(scores, conf.nms_radius)
        h, w = scores.shape[-2:]
        if conf.remove_borders:
            pad = conf.remove_borders
            border = jnp.zeros((h, w), bool).at[pad:-pad, pad:-pad].set(True)
            scores = jnp.where(border, scores, -1.0)

        k = conf.max_num_keypoints
        topv, topi = jax.lax.top_k(scores.reshape(b, h * w), k)
        xs = (topi % w).astype(jnp.float32)
        ys = (topi // w).astype(jnp.float32)
        keypoints = jnp.stack([xs, ys], -1)
        mask = topv > conf.detection_threshold

        sampler = (
            sample_descriptors_legacy if conf.legacy_sampling else sample_descriptors_fixed
        )
        desc = sampler(keypoints, dense, 8)

        pred = {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": jnp.where(mask, topv, 0.0),
            "descriptors": desc,
            "keypoint_mask": mask,
        }
        if conf.dense_outputs:
            pred["dense_descriptors"] = dense
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = SuperPointMagicLeap
