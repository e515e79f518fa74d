"""XPoint: attention-backbone multispectral detector.

Counterpart of reference gluefactory/multipoint/models/XPoint.py:12-300 — the
fork's MultiPoint variant with transformer backbones (SwinV2/SwinIR/SimpleViT;
note the reference's `.Swinv2` import is broken, XPoint.py:9) and an optional
homography-regression head.

TPU re-design: a compact windowed-attention (Swin-style, shifted windows)
encoder replaces the heavyweight pretrained backbones — zero-egress means no
ImageNet weights anyway — producing 1/8-resolution features into the same
shared detector/descriptor heads as MultiPoint. The optional homography
head regresses the 4-point parameterization from concatenated pair features
(reference HomographyNet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.base_model import BaseModel
from .multipoint import MultiPoint, _Head


def window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_merge(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class _WindowBlock(nn.Module):
    dim: int
    heads: int = 4
    window: int = 8
    shift: int = 0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window
        shortcut = x
        x = nn.LayerNorm()(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        wins = window_partition(x, ws)  # (B*nw, ws*ws, C)
        qkv = nn.Dense(3 * self.dim)(wins)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = self.dim // self.heads

        def heads_of(t):
            n, l, _ = t.shape
            return t.reshape(n, l, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        attn = jax.nn.softmax(
            jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32)
            / dh**0.5,
            -1,
        )
        out = jnp.einsum("nhlm,nhmd->nhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(wins.shape[0], ws * ws, self.dim)
        out = nn.Dense(self.dim)(out)
        x = window_merge(out, ws, h, w)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm()(x)
        y = nn.Dense(4 * self.dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class _SwinLiteEncoder(nn.Module):
    dim: int = 96
    depth: int = 4
    window: int = 8

    @nn.compact
    def __call__(self, x, is_training: bool):
        # patch embed: stride-8 (two stride-2 convs + one stride-2 pool)
        x = nn.Conv(self.dim // 2, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="SAME")(x)
        for i in range(self.depth):
            x = _WindowBlock(
                self.dim, window=self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
            )(x)
        return x


class XPoint(MultiPoint):
    """MultiPoint with a windowed-attention backbone (+ optional homography
    regression head)."""

    default_conf = {
        "name": "xpoint",
        "backbone_dim": 96,
        "backbone_depth": 4,
        "window": 8,
        "homography_head": False,
    }

    def setup(self):
        conf = self.conf
        dim = conf.backbone_dim
        if conf.multispectral:
            self.encoder_optical = _SwinLiteEncoder(dim, conf.backbone_depth, conf.window)
            self.encoder_thermal = _SwinLiteEncoder(dim, conf.backbone_depth, conf.window)
        else:
            self.encoder = _SwinLiteEncoder(dim, conf.backbone_depth, conf.window)
        cell2 = conf.cell**2
        self.detector_head = _Head(conf.head_channels, cell2 + 1)
        if conf.descriptor_head:
            self.descriptor_head = _Head(conf.head_channels, conf.descriptor_size)
        if conf.homography_head:
            self.h_head = nn.Sequential(
                [nn.Dense(256), nn.relu, nn.Dense(128), nn.relu, nn.Dense(8)]
            )

    def regress_homography(self, feats0, feats1):
        """4-point homography offsets from pooled pair features
        (reference HomographyNet-style head)."""
        f = jnp.concatenate(
            [feats0.mean(axis=(1, 2)), feats1.mean(axis=(1, 2))], axis=-1
        )
        return self.h_head(f).reshape(-1, 4, 2)


__main_model__ = XPoint
