"""MultiPoint: multispectral (optical/thermal) keypoint detector+descriptor.

Re-design of reference gluefactory/multipoint/models/MultiPoint.py:18-400 for
JAX/flax: TWO modality-specific VGG encoders (optical + thermal) feeding
SHARED detector and descriptor heads (reference :89-93 — the core MultiPoint
idea: modality-invariant interest points via shared heads over per-modality
features). NHWC, batchnorm, cell-softmax detector (65 ch), D-dim descriptors.

Inputs: image (B, H, W, 1) and is_optical (B,) bool selecting the encoder per
sample (reference routes by an 'optical' flag in the batch).
Outputs: logits (B, Hc, Wc, 65), prob (B, H, W) full-res detection
probability, dense descriptors (B, Hc, Wc, D); plus fixed-size keypoints when
max_num_keypoints is set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.base_model import BaseModel
from ...models.extractors.superpoint_open import sample_descriptors, simple_nms


class _VGGEncoder(nn.Module):
    channels: tuple = (64, 64, 128, 128)

    @nn.compact
    def __call__(self, x, is_training: bool):
        for i, c in enumerate(self.channels):
            x = nn.Conv(c, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not is_training, epsilon=1e-3)(x)
            x = nn.Conv(c, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not is_training, epsilon=1e-3)(x)
            if i < len(self.channels) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class _Head(nn.Module):
    mid: int
    out: int

    @nn.compact
    def __call__(self, x, is_training: bool):
        x = nn.Conv(self.mid, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not is_training, epsilon=1e-3)(x)
        x = nn.Conv(self.out, (1, 1))(x)
        return x


class MultiPoint(BaseModel):
    default_conf = {
        "name": "multipoint",
        "multispectral": True,
        "descriptor_head": True,
        "descriptor_size": 256,
        "normalize_descriptors": True,
        "channels": [64, 64, 128, 128],
        "head_channels": 256,
        "cell": 8,
        "nms_radius": 4,
        "detection_threshold": 0.015,
        "max_num_keypoints": None,  # set for fixed-size keypoint output
        "is_training": False,
    }
    required_data_keys = ["image"]

    def setup(self):
        conf = self.conf
        ch = tuple(conf.channels)
        if conf.multispectral:
            self.encoder_optical = _VGGEncoder(ch)
            self.encoder_thermal = _VGGEncoder(ch)
        else:
            self.encoder = _VGGEncoder(ch)
        cell2 = conf.cell**2
        self.detector_head = _Head(conf.head_channels, cell2 + 1)
        if conf.descriptor_head:
            self.descriptor_head = _Head(conf.head_channels, conf.descriptor_size)

    def _encode(self, image, is_optical):
        is_training = self.conf.is_training
        if not self.conf.multispectral:
            return self.encoder(image, is_training)
        fo = self.encoder_optical(image, is_training)
        ft = self.encoder_thermal(image, is_training)
        sel = is_optical.astype(fo.dtype).reshape(-1, 1, 1, 1)
        return fo * sel + ft * (1.0 - sel)

    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]
        b = image.shape[0]
        is_optical = data.get("is_optical", jnp.ones((b,), bool))
        is_training = conf.is_training

        feats = self._encode(image, is_optical)
        logits = self.detector_head(feats, is_training)  # (B, Hc, Wc, 65)

        prob_cells = jax.nn.softmax(logits, axis=-1)[..., :-1]
        bb, hc, wc, _ = prob_cells.shape
        cell = conf.cell
        prob = prob_cells.reshape(bb, hc, wc, cell, cell)
        prob = prob.transpose(0, 1, 3, 2, 4).reshape(bb, hc * cell, wc * cell)

        pred = {"logits": logits, "prob": prob}
        if conf.descriptor_head:
            dense = self.descriptor_head(feats, is_training)
            if conf.normalize_descriptors:
                dense = dense / jnp.maximum(
                    jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-8
                )
            pred["dense_descriptors"] = dense

        if conf.max_num_keypoints:
            heat = simple_nms(prob, conf.nms_radius)
            h, w = heat.shape[-2:]
            flat = heat.reshape(b, h * w)
            k = conf.max_num_keypoints
            topv, topi = jax.lax.top_k(flat, k)
            xs = (topi % w).astype(jnp.float32)
            ys = (topi // w).astype(jnp.float32)
            kpts = jnp.stack([xs, ys], -1) + 0.5
            mask = topv > conf.detection_threshold
            pred.update(
                {
                    "keypoints": kpts,
                    "keypoint_scores": jnp.where(mask, topv, 0.0),
                    "keypoint_mask": mask,
                }
            )
            if conf.descriptor_head:
                pred["descriptors"] = sample_descriptors(kpts, dense, cell)
        return pred

    def loss(self, pred, data):
        from ..utils.losses import superpoint_loss

        return superpoint_loss(pred, data, self.conf)


__main_model__ = MultiPoint
