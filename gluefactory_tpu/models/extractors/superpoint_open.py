"""SuperPoint detector/descriptor (open architecture), TPU-native.

Re-design of reference models/extractors/superpoint_open.py:76-210 (itself the
rpautrat TF re-implementation) for JAX/XLA:

  - NHWC layout (TPU conv-friendly); VGG backbone of Conv+ReLU+BatchNorm
    blocks, 65-channel cell softmax detector, D-dim descriptor head.
  - NMS as max-pool equality with two suppression rounds (reference
    batched_nms :32-47) — pure reduce_window ops, no loops over pixels.
  - Keypoint selection is ALWAYS fixed-size: `jax.lax.top_k` of the NMS'd
    score map to exactly `max_num_keypoints`, with a validity mask
    `score > detection_threshold` — the static-shape equivalent of the
    reference's `force_num_keypoints` padding (superpoint_open.py:172-185).
  - Bilinear descriptor sampling at keypoint centers, align_corners=False
    convention, L2-normalized (reference sample_descriptors :18-28).

Outputs: keypoints (B,K,2) xy at pixel centers (+0.5 like reference :201),
keypoint_scores (B,K), descriptors (B,K,D), keypoint_mask (B,K) bool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..base_model import BaseModel


def simple_nms(scores: jnp.ndarray, radius: int, iterations: int = 2) -> jnp.ndarray:
    """Fast NMS: keep local maxima of a (B, H, W) score map (reference
    batched_nms, superpoint_open.py:32-47)."""

    def max_pool(x):
        # separable (2r+1)^2 max: two 1-D passes do 2(2r+1) compares/pixel
        # instead of (2r+1)^2 — XLA does not split reduce_window itself
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2 * radius + 1, 1), (1, 1, 1), "SAME"
        )
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2 * radius + 1), (1, 1, 1), "SAME"
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(iterations):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def sample_descriptors(
    keypoints: jnp.ndarray, descriptors: jnp.ndarray, s: int = 8
) -> jnp.ndarray:
    """Bilinearly sample a dense (B, Hc, Wc, D) descriptor map at (B, K, 2) xy
    pixel coords of the full-resolution image (cell stride s); L2-normalize.
    align_corners=False semantics like the reference grid_sample call
    (superpoint_open.py:18-28)."""
    b, hc, wc, d = descriptors.shape
    # full-res pixel -> descriptor-map continuous coords (align_corners=False)
    x = (keypoints[..., 0] + 0.5) / s - 0.5
    y = (keypoints[..., 1] + 0.5) / s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, wc - 1)
    x1i = jnp.clip(x0i + 1, 0, wc - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, hc - 1)
    y1i = jnp.clip(y0i + 1, 0, hc - 1)

    flat = descriptors.reshape(b, hc * wc, d)

    def gather(iy, ix):
        return jnp.take_along_axis(flat, (iy * wc + ix)[..., None], axis=1)

    # blend in the map's dtype (bf16 on TPU halves gather traffic — the
    # output is re-normalized in fp32 below, so the precision loss is ~1e-3
    # on unit vectors), accumulate in fp32
    wdt = descriptors.dtype
    out = (
        gather(y0i, x0i) * ((1 - wx) * (1 - wy)).astype(wdt)[..., None]
        + gather(y0i, x1i) * (wx * (1 - wy)).astype(wdt)[..., None]
        + gather(y1i, x0i) * ((1 - wx) * wy).astype(wdt)[..., None]
        + gather(y1i, x1i) * (wx * wy).astype(wdt)[..., None]
    ).astype(jnp.float32)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-8)


class VGGBlock(nn.Module):
    channels: int
    kernel: int = 3
    relu: bool = True
    dtype: object = None  # compute dtype (bf16 puts the convs on the MXU fast path)

    @nn.compact
    def __call__(self, x, is_training: bool):
        x = nn.Conv(
            self.channels, (self.kernel, self.kernel), padding="SAME",
            dtype=self.dtype,
        )(x)
        if self.relu:
            x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not is_training, epsilon=1e-3, momentum=0.9,
            dtype=self.dtype,
        )(x)
        return x


class SuperPoint(BaseModel):
    default_conf = {
        "name": "superpoint_open",
        "descriptor_dim": 256,
        "nms_radius": 4,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "channels": [64, 64, 128, 128, 256],
        "dense_outputs": False,
        "is_training": False,
        "dtype": "bfloat16",  # conv compute dtype; heads renormalize in fp32
        "approx_topk": True,  # lax.approx_max_k for keypoint selection on TPU
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]  # (B, H, W, C) in [0, 1]
        if image.shape[-1] == 3:  # RGB -> grayscale (reference :119-121)
            image = jnp.sum(
                image * jnp.asarray([0.299, 0.587, 0.114], image.dtype), -1, keepdims=True
            )
        is_training = conf.is_training

        channels = list(conf.channels)
        stride = 2 ** (len(channels) - 2)
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, None: None}[
            conf.get("dtype")
        ]
        x = image.astype(dtype) if dtype is not None else image
        for i, c in enumerate(channels[:-1]):
            x = VGGBlock(c, dtype=dtype)(x, is_training)
            x = VGGBlock(c, dtype=dtype)(x, is_training)
            if i < len(channels) - 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        features = x

        c_last = channels[-1]
        # descriptor head (L2 norm in fp32)
        dx = VGGBlock(c_last, dtype=dtype)(features, is_training)
        dense_desc = VGGBlock(conf.descriptor_dim, kernel=1, relu=False, dtype=dtype)(
            dx, is_training
        ).astype(jnp.float32)
        dense_desc = dense_desc / jnp.maximum(
            jnp.linalg.norm(dense_desc, axis=-1, keepdims=True), 1e-8
        )
        if dtype is not None:
            # unit-norm map: bf16 sampling costs ~1e-3 per component and the
            # sampled descriptor is re-normalized in fp32
            dense_desc = dense_desc.astype(dtype)

        # detector head: 65-channel cell softmax -> depth-to-space (fp32 softmax)
        sx = VGGBlock(c_last, dtype=dtype)(features, is_training)
        logits = VGGBlock(stride**2 + 1, kernel=1, relu=False, dtype=dtype)(
            sx, is_training
        ).astype(jnp.float32)
        scores = jax.nn.softmax(logits, axis=-1)[..., :-1]
        b, hc, wc, _ = scores.shape
        scores = scores.reshape(b, hc, wc, stride, stride)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * stride, wc * stride)

        if dtype is not None:
            # NMS + top-k are pure selection: bf16 scores halve the pooling /
            # sort traffic; the selected values are compared to the detection
            # threshold only (8-bit mantissa is plenty)
            scores = scores.astype(dtype)
        scores = simple_nms(scores, conf.nms_radius)

        h, w = scores.shape[-2:]
        if conf.remove_borders:
            pad = conf.remove_borders
            border = jnp.zeros((h, w), bool)
            border = border.at[pad:-pad, pad:-pad].set(True)
            scores = jnp.where(border, scores, -1.0)

        # static top-k selection with validity mask; approx_max_k uses the
        # TPU-optimized partial sort (recall ~0.95 on an NMS-sparsified map,
        # several times faster than a full sort of H*W scores)
        k = conf.max_num_keypoints
        flat = scores.reshape(b, h * w)
        if conf.get("approx_topk") and jax.default_backend() == "tpu":
            topv, topi = jax.lax.approx_max_k(flat, k)
        else:
            topv, topi = jax.lax.top_k(flat, k)
        ys = (topi // w).astype(jnp.float32)
        xs = (topi % w).astype(jnp.float32)
        keypoints = jnp.stack([xs, ys], axis=-1)
        topv = topv.astype(jnp.float32)
        mask = topv > conf.detection_threshold
        kp_scores = jnp.where(mask, topv, 0.0)

        desc = sample_descriptors(keypoints, dense_desc, stride)

        pred = {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": kp_scores,
            "descriptors": desc,
            "keypoint_mask": mask,
        }
        if conf.dense_outputs:
            pred["dense_descriptors"] = dense_desc.astype(jnp.float32)
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = SuperPoint
