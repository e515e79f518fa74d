"""ALIKED: differentiable keypoints + deformable descriptors, TPU-native.

Re-design of reference models/extractors/aliked.py (786 LoC): ResBlock
pyramid encoder with multi-scale feature aggregation, Score Map Head,
DKD (Differentiable Keypoint Detection: NMS + top-k + sub-pixel soft-argmax
refinement, reference :73-200) and SDDH (Sparse Deformable Descriptor Head,
reference :458-580).

The reference's SDDH uses torchvision's C++/CUDA deform_conv2d (:320). The
TPU-native equivalent implemented here predicts M deformable offsets from a
gathered KxK patch around each keypoint and bilinearly samples the feature
map at those offsets (pure gather/matmul ops — XLA-friendly, no custom op),
which is the same computation expressed as dense batched algebra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..base_model import BaseModel
from .superpoint_open import simple_nms


class _ResBlock(nn.Module):
    c: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.c, (3, 3), strides=(self.stride, self.stride), padding="SAME")(x)
        y = nn.gelu(nn.GroupNorm(num_groups=8)(y))
        y = nn.Conv(self.c, (3, 3), padding="SAME")(y)
        y = nn.GroupNorm(num_groups=8)(y)
        if x.shape[-1] != self.c or self.stride != 1:
            x = nn.Conv(self.c, (1, 1), strides=(self.stride, self.stride))(x)
        return nn.gelu(x + y)


class ALIKED(BaseModel):
    default_conf = {
        "name": "aliked",
        "model_name": "aliked-n16",
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0002,
        "nms_radius": 2,
        "descriptor_dim": 128,
        "channels": [16, 32, 64, 128],
        "sddh_M": 8,  # number of deformable samples per keypoint
        "sddh_radius": 5,
        "force_num_keypoints": True,
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, -1)
        c1, c2, c3, c4 = conf.channels

        # pyramid encoder (reference blocks :591-700)
        f1 = _ResBlock(c1)(image)  # 1/1
        f2 = _ResBlock(c2, stride=2)(f1)  # 1/2
        f3 = _ResBlock(c3, stride=2)(f2)  # 1/4
        f4 = _ResBlock(c4, stride=2)(f3)  # 1/8

        h, w = image.shape[1:3]

        def up(x):
            return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")

        agg = jnp.concatenate([f1, up(f2), up(f3), up(f4)], axis=-1)
        feats = nn.Conv(conf.descriptor_dim, (1, 1))(agg)
        feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)

        # score map head
        s = nn.Conv(8, (3, 3), padding="SAME")(agg)
        s = nn.gelu(s)
        score_map = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME")(s))[..., 0]

        # DKD: NMS + top-k + soft sub-pixel refinement (reference :73-200)
        nms = simple_nms(score_map, conf.nms_radius)
        b = image.shape[0]
        k = conf.max_num_keypoints
        topv, topi = jax.lax.top_k(nms.reshape(b, h * w), k)
        xs = (topi % w).astype(jnp.float32)
        ys = (topi // w).astype(jnp.float32)
        mask = topv > conf.detection_threshold

        # soft-argmax refinement in a 5x5 window of the raw score map
        r = 2
        dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0),
                              indexing="ij")
        offs = jnp.stack([dx, dy], -1).reshape(-1, 2)  # (25, 2)
        wins_x = xs[..., None] + offs[None, None, :, 0]
        wins_y = ys[..., None] + offs[None, None, :, 1]
        win_scores = _gather_values(score_map, wins_x.reshape(b, -1),
                                    wins_y.reshape(b, -1)).reshape(b, k, -1)
        soft = jax.nn.softmax(win_scores * 20.0, axis=-1)
        refine = jnp.einsum("bkn,nc->bkc", soft, offs)
        keypoints = jnp.stack([xs, ys], -1) + refine + 0.5

        # SDDH descriptors (reference :458-580): offsets from a local patch,
        # bilinear feature samples, learned combination
        R = conf.sddh_radius
        pdy, pdx = jnp.meshgrid(jnp.arange(-R, R + 1.0), jnp.arange(-R, R + 1.0),
                                indexing="ij")
        poffs = jnp.stack([pdx, pdy], -1).reshape(-1, 2)  # (P, 2)
        P = poffs.shape[0]
        px = keypoints[..., 0:1] + poffs[None, None, :, 0]
        py = keypoints[..., 1:2] + poffs[None, None, :, 1]
        patch = _gather_feats(feats, px.reshape(b, -1), py.reshape(b, -1))
        patch = patch.reshape(b, k, P, conf.descriptor_dim)
        M = conf.sddh_M
        pooled = patch.mean(2)
        offset_pred = nn.Dense(2 * M)(pooled).reshape(b, k, M, 2)
        offset_pred = jnp.tanh(offset_pred) * R  # bounded deformable offsets
        sx = keypoints[..., 0:1] + offset_pred[..., 0]
        sy = keypoints[..., 1:2] + offset_pred[..., 1]
        samples = _gather_feats(feats, sx.reshape(b, -1), sy.reshape(b, -1))
        samples = samples.reshape(b, k, M, conf.descriptor_dim)
        weights = nn.Dense(M)(pooled)
        weights = jax.nn.softmax(weights, -1)
        desc = jnp.einsum("bkm,bkmd->bkd", weights, samples)
        desc = nn.Dense(conf.descriptor_dim)(desc)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)

        return {
            "keypoints": keypoints,
            "keypoint_scores": jnp.where(mask, topv, 0.0),
            "descriptors": desc,
            "keypoint_mask": mask,
            "score_map": score_map,
        }

    def loss(self, pred, data):
        raise NotImplementedError


def _gather_values(fmap2d, x, y):
    """Nearest+bilinear raw-value gather from (B, H, W) map at (B, N) coords."""
    out = _bilinear_raw(fmap2d[..., None], x, y)
    return out[..., 0]


def _gather_feats(fmap, x, y):
    return _bilinear_raw(fmap, x, y)


def _bilinear_raw(fmap, x, y):
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

    return (
        g(y0i, x0i) * ((1 - wx) * (1 - wy))[..., None]
        + g(y0i, x1i) * (wx * (1 - wy))[..., None]
        + g(y1i, x0i) * ((1 - wx) * wy)[..., None]
        + g(y1i, x1i) * (wx * wy)[..., None]
    )


__main_model__ = ALIKED
