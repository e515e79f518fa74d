"""Weight-compatible official DISK (Tyszkiewicz et al., NeurIPS 2020).

The hermetic trainable DISK lives in disk.py (its own U-Net family). THIS
module reproduces the OFFICIAL architecture exactly — the thin pre-activation
U-Net shipped as `depth-save.pth` / kornia's `DISK.from_pretrained("depth")`
and wrapped by the reference at
/root/reference/gluefactory/models/extractors/disk_kornia.py:8-120 — so that
converted official checkpoints (scripts/convert_weights.py --kind disk)
produce the published detections/descriptors:

  - U-Net: down [16, 32, 64, 64, 64], up [64, 64, 64, desc_dim+1], 5x5
    convs. Every block except the stem is PRE-activation:
    InstanceNorm (no affine) -> PReLU(per-channel) -> Conv. Downsampling is
    2x2 average pooling, upsampling nearest-neighbor x2, skip connections by
    channel concat (upsampled bottom first, then the skip).
  - Head split: channels [:desc_dim] are dense descriptors, channel
    [desc_dim] is the detection heatmap (disk repo forward).
  - Keypoints: kornia's `heatmap_to_keypoints` GRID nms — max_pool2d with
    kernel == stride == window_size, i.e. at most one keypoint per
    NON-overlapping window — then score threshold and global top-n.
  - Descriptors sampled at integer keypoint locations, L2-normalized; the
    wrapper adds +0.5 px to keypoints (disk_kornia.py:103).

Padding to a /16 size mirrors `pad_if_not_divisible` (disk_kornia.py:28-37).
Outputs use the gluefactory batched-padded convention (keypoint_mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False): per-sample per-channel over H, W."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class DISKOfficial(BaseModel):
    default_conf = {
        "name": "disk_official",
        "weights": None,  # converted .npz (scripts/convert_weights.py --kind disk)
        "max_num_keypoints": 1024,
        "desc_dim": 128,
        "nms_window_size": 5,
        "detection_threshold": 0.0,
        "down": [16, 32, 64, 64, 64],
        "up": [64, 64, 64],  # final up block outputs desc_dim + 1
        "kernel_size": 5,
        "pad_if_not_divisible": True,
    }
    required_data_keys = ["image"]

    def setup(self):
        conf = self.conf
        ks = conf.kernel_size
        down = list(conf.down)
        up = list(conf.up) + [conf.desc_dim + 1]
        d_in = [3] + down[:-1]

        def conv_param(name, cin, cout):
            w = self.param(
                name + "_w",
                nn.initializers.lecun_normal(),
                (ks, ks, cin, cout),  # HWIO
            )
            b = self.param(name + "_b", nn.initializers.zeros, (cout,))
            return w, b

        self.down_convs = [
            conv_param(f"down_{i}_conv", cin, cout)
            for i, (cin, cout) in enumerate(zip(d_in, down))
        ]
        # pre-activation PReLU on the block INPUT channels (stem has none)
        self.down_prelu = [
            self.param(f"down_{i}_prelu", nn.initializers.constant(0.25), (cin,))
            for i, cin in enumerate(d_in)
            if i > 0
        ]
        # up block i consumes upsampled bottom + skip (reverse down order)
        bot = [down[-1]] + up[:-1]
        skips = down[-2::-1]
        self.up_convs = [
            conv_param(f"up_{i}_conv", b + s, cout)
            for i, (b, s, cout) in enumerate(zip(bot, skips, up))
        ]
        self.up_prelu = [
            self.param(f"up_{i}_prelu", nn.initializers.constant(0.25), (b + s,))
            for i, (b, s) in enumerate(zip(bot, skips))
        ]

    def _conv_block(self, x, conv, prelu=None):
        if prelu is not None:
            x = _instance_norm(x)
            x = jnp.where(x >= 0, x, prelu[None, None, None, :] * x)
        w, b = conv
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b

    def _unet(self, image):
        feats = []
        x = image
        for i, conv in enumerate(self.down_convs):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                x = self._conv_block(x, conv, self.down_prelu[i - 1])
            else:
                x = self._conv_block(x, conv)
            feats.append(x)
        x = feats[-1]
        for i, conv in enumerate(self.up_convs):
            skip = feats[-2 - i]
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[3]),
                "nearest",
            )
            x = jnp.concatenate([x, skip], axis=-1)
            x = self._conv_block(x, conv, self.up_prelu[i])
        return x

    def dense_forward(self, image):
        """(heatmap (B, H, W), dense descriptors (B, H, W, desc_dim))."""
        out = self._unet(image)
        d = self.conf.desc_dim
        return out[..., d], out[..., :d]

    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, -1)
        b, h, w, _ = image.shape
        if conf.pad_if_not_divisible:  # disk_kornia.py:28-37
            ph = (-h) % 16
            pw = (-w) % 16
            if ph or pw:
                image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        heatmap, dense = self.dense_forward(image)
        heatmap = heatmap[:, :h, :w]
        dense = dense[:, :h, :w]

        # kornia grid NMS: one argmax per NON-overlapping window
        win = conf.nms_window_size
        hp = (-h) % win
        wp = (-w) % win
        neg = jnp.asarray(-jnp.inf, heatmap.dtype)
        hm = jnp.pad(heatmap, ((0, 0), (0, hp), (0, wp)), constant_values=neg)
        gh, gw = hm.shape[1] // win, hm.shape[2] // win
        windows = hm.reshape(b, gh, win, gw, win).transpose(0, 1, 3, 2, 4)
        windows = windows.reshape(b, gh * gw, win * win)
        local = jnp.argmax(windows, axis=-1)
        scores = jnp.take_along_axis(windows, local[..., None], axis=-1)[..., 0]
        gy = jnp.arange(gh).repeat(gw)[None] * win + local // win
        gx = jnp.tile(jnp.arange(gw), gh)[None] * win + local % win

        k = min(conf.max_num_keypoints, gh * gw)
        topv, topi = jax.lax.top_k(scores, k)
        by = jnp.take_along_axis(gy, topi, axis=1)
        bx = jnp.take_along_axis(gx, topi, axis=1)
        mask = topv > conf.detection_threshold

        desc = dense[jnp.arange(b)[:, None], by, bx]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
        keypoints = jnp.stack([bx, by], -1).astype(jnp.float32) + 0.5
        return {
            "keypoints": keypoints,
            "keypoint_scores": jnp.where(mask, topv, 0.0),
            "descriptors": jnp.where(mask[..., None], desc, 0.0),
            "keypoint_mask": mask,
        }

    def loss(self, pred, data):
        raise NotImplementedError  # eval-only, like the reference wrapper


__main_model__ = DISKOfficial
