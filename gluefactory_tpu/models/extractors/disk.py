"""DISK: U-Net keypoint detector + dense descriptors.

Counterpart of reference models/extractors/disk_kornia.py (kornia pretrained
DISK wrapper, 120 LoC). kornia is unavailable here, so the architecture is
implemented natively: a small U-Net producing a detection heatmap and
128-d dense descriptors; keypoints by NMS + static top-k with validity
mask, descriptors bilinearly sampled (the DISK inference path — the
probabilistic training objective of the paper is out of scope).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..base_model import BaseModel
from .aliked import _bilinear_raw
from .superpoint_open import simple_nms


class _Down(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (3, 3), padding="SAME")(x)
        x = nn.gelu(nn.GroupNorm(num_groups=4)(x))
        x = nn.Conv(self.c, (3, 3), padding="SAME")(x)
        x = nn.gelu(nn.GroupNorm(num_groups=4)(x))
        return x


class DISK(BaseModel):
    default_conf = {
        "name": "disk",
        "weights": None,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0,
        "nms_radius": 2,
        "descriptor_dim": 128,
        "channels": [32, 64, 128],
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, -1)
        c1, c2, c3 = conf.channels

        # U-Net
        d1 = _Down(c1)(image)
        p1 = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = _Down(c2)(p1)
        p2 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = _Down(c3)(p2)

        b, h, w, _ = image.shape

        def up(x, skip):
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[-1]), "bilinear"
            )
            return jnp.concatenate([x, skip], axis=-1)

        u2 = _Down(c2)(up(d3, d2))
        u1 = _Down(c1)(up(u2, d1))

        out = nn.Conv(conf.descriptor_dim + 1, (1, 1))(u1)
        heatmap = out[..., 0]
        dense = out[..., 1:]
        dense = dense / jnp.maximum(jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-8)

        nms = simple_nms(jax.nn.sigmoid(heatmap), conf.nms_radius)
        k = conf.max_num_keypoints
        topv, topi = jax.lax.top_k(nms.reshape(b, h * w), k)
        xs = (topi % w).astype(jnp.float32)
        ys = (topi // w).astype(jnp.float32)
        keypoints = jnp.stack([xs, ys], -1) + 0.5
        mask = topv > conf.detection_threshold

        desc = _bilinear_raw(dense, keypoints[..., 0], keypoints[..., 1])
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)

        return {
            "keypoints": keypoints,
            "keypoint_scores": jnp.where(mask, topv, 0.0),
            "descriptors": desc,
            "keypoint_mask": mask,
            "heatmap": heatmap,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = DISK
