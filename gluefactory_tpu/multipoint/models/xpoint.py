"""XPoint: attention-backbone multispectral detector.

Counterpart of reference gluefactory/multipoint/models/XPoint.py:12-300 — the
fork's MultiPoint variant with transformer backbones (SwinV2/SwinIR/SimpleViT;
note the reference's `.Swinv2` import is broken, XPoint.py:9) and an optional
homography-regression head.

TPU re-design: the reference's backbone family is implemented for real in
`.backbones` (SwinV2 with cosine attention + log-CPB, SwinIR RSTB groups,
SCUNet conv+swin) — all producing 1/8-resolution features into the same
shared detector/descriptor heads as MultiPoint; zero-egress means no
ImageNet weights, so `Swinv2pretrained` collapses into the same SwinV2
architecture. The optional homography head regresses the 4-point
parameterization (pool = HomographyNet, srhen = correlation-volume head,
ms2cahe = cross-attention head).
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


class _ViTEncoder(nn.Module):
    """SimpleViT-style global-attention encoder (reference SimpleViT.py:81):
    stride-8 patch embed + 2D sin-cos positions + pre-norm transformer."""

    dim: int = 96
    depth: int = 4
    heads: int = 4

    @nn.compact
    def __call__(self, x, is_training: bool):
        x = nn.Conv(self.dim, (8, 8), strides=(8, 8), padding="VALID")(x)
        b, h, w, c = x.shape
        # 2D sin-cos positional embedding (SimpleViT posemb_sincos_2d)
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        omega = 1.0 / (10000 ** (jnp.arange(c // 4) / max(c // 4 - 1, 1)))
        py = yy.reshape(-1, 1) * omega[None]
        px = xx.reshape(-1, 1) * omega[None]
        pos = jnp.concatenate(
            [jnp.sin(px), jnp.cos(px), jnp.sin(py), jnp.cos(py)], axis=-1
        )
        tokens = x.reshape(b, h * w, c) + pos[None, :, : c]
        dh = self.dim // self.heads
        for _ in range(self.depth):
            y = nn.LayerNorm()(tokens)
            qkv = nn.Dense(3 * self.dim)(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda t: t.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
            q, k, v = split(q), split(k), split(v)
            attn = jax.nn.softmax(
                jnp.einsum("bhld,bhmd->bhlm", q, k,
                           preferred_element_type=jnp.float32) / dh**0.5, -1)
            o = jnp.einsum("bhlm,bhmd->bhld", attn, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
            tokens = tokens + nn.Dense(self.dim)(o)
            y = nn.LayerNorm()(tokens)
            y = nn.Dense(4 * self.dim)(y)
            tokens = tokens + nn.Dense(self.dim)(nn.gelu(y))
        return tokens.reshape(b, h, w, self.dim)


class _CBAMBlock(nn.Module):
    """Convolutional block attention (reference cbam.py:84): channel gate
    from mean+max pooled MLP, then spatial gate from channel mean/max."""

    dim: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential([nn.Dense(self.dim // self.reduction), nn.relu,
                             nn.Dense(self.dim)])
        gate = jax.nn.sigmoid(
            mlp(x.mean(axis=(1, 2))) + mlp(x.max(axis=(1, 2)))
        )
        x = x * gate[:, None, None, :]
        pooled = jnp.stack([x.mean(-1), x.max(-1)], axis=-1)  # (B, H, W, 2)
        spatial = jax.nn.sigmoid(nn.Conv(1, (7, 7), padding="SAME")(pooled))
        return x * spatial


class _CBAMEncoder(nn.Module):
    """VGG-style conv encoder with CBAM attention after each stage."""

    dim: int = 96
    depth: int = 3  # stride-2 stages -> 1/8 resolution

    @nn.compact
    def __call__(self, x, is_training: bool):
        c = self.dim // 2
        for i in range(self.depth):
            c = min(c * 2, self.dim) if i else c
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(c, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = _CBAMBlock(c)(x)
        return nn.Conv(self.dim, (3, 3), padding="SAME")(x)


class XPoint(MultiPoint):
    """MultiPoint with a configurable attention backbone (+ optional
    homography regression head). `backbone`:
      swin    — hierarchical SwinV2 (cosine attention + log-CPB, the real
                architecture of reference SwinTransformerV2.py)
      swinir  — SwinIR RSTB groups (V1 learned-bias window attention,
                reference SwinIR.py)
      scunet  — SCUNet conv+swin UNet downsampling half (reference ScuNet.py)
      vit     — SimpleViT global attention (reference SimpleViT.py)
      cbam    — conv encoder with CBAM attention (reference cbam.py)
      swin_lite — the compact round-1 windowed encoder (kept for configs
                that trained against it)
    """

    default_conf = {
        "name": "xpoint",
        "backbone": "swin",
        "backbone_dim": 96,
        "backbone_depth": 4,
        "window": 8,
        "homography_head": False,
    }

    def _make_encoder(self):
        from .backbones import SCUNetEncoder, SwinIREncoder, SwinV2Encoder

        conf = self.conf
        name = conf.backbone
        dim, depth, window = conf.backbone_dim, conf.backbone_depth, conf.window
        if name == "swin":
            # stage1 runs at 2*stage0_dim: halve so the output is backbone_dim
            d0 = max(dim // 2, 16)
            per_stage = max(depth // 2, 1)
            return SwinV2Encoder(
                d0, depths=(per_stage, per_stage),
                heads=(max(d0 // 32, 1), max(d0 // 16, 1)), window=window,
            )
        if name == "swinir":
            groups = max(depth // 2, 1)
            return SwinIREncoder(
                dim, groups=groups, depth=2, heads=max(dim // 16, 1),
                window=window,
            )
        if name == "scunet":
            return SCUNetEncoder(
                max(dim * 2 // 3, 32), out_dim=dim,
                blocks_per_stage=max(depth // 2, 1), window=window,
            )
        if name == "swin_lite":
            return _SwinLiteEncoder(dim, depth, window)
        if name == "cbam":
            return _CBAMEncoder(dim)  # stage count fixed at 1/8 stride
        if name == "vit":
            return _ViTEncoder(dim, depth)
        raise ValueError(f"unknown XPoint backbone '{name}'")

    def setup(self):
        conf = self.conf
        if conf.multispectral:
            self.encoder_optical = self._make_encoder()
            self.encoder_thermal = self._make_encoder()
        else:
            self.encoder = self._make_encoder()
        cell2 = conf.cell**2
        self.detector_head = _Head(conf.head_channels, cell2 + 1)
        if conf.descriptor_head:
            self.descriptor_head = _Head(conf.head_channels, conf.descriptor_size)
        # homography head types mirror the reference's
        # homography_regression_head registry (MultiPoint.py:95-110):
        # pool = HomographyNet, srhen = SRHENNet (width<1 = the Lighter
        # variant), ms2cahe = MS2CAHENet cross-attention
        self.h_type = None
        h = conf.homography_head
        if h:
            width = 1.0
            if isinstance(h, str):
                self.h_type = h
            elif hasattr(h, "get"):
                self.h_type = h.get("type", "pool")
                width = float(h.get("width", 1.0))
            else:  # bool True: original pooled head
                self.h_type = "pool"
            if self.h_type == "pool":
                self.h_head = nn.Sequential(
                    [nn.Dense(256), nn.relu, nn.Dense(128), nn.relu, nn.Dense(8)]
                )
            elif self.h_type == "srhen":
                from .homography_net import CorrelationHomographyHead

                self.h_head = CorrelationHomographyHead(width)
            elif self.h_type == "ms2cahe":
                from .homography_net import CrossAttentionHomographyHead

                self.h_head = CrossAttentionHomographyHead()
            else:
                raise ValueError(f"unknown homography head {self.h_type}")

    def regress_homography(self, feats0, feats1):
        """4-point homography offsets from the pair's backbone features."""
        if self.h_type == "pool":
            f = jnp.concatenate(
                [feats0.mean(axis=(1, 2)), feats1.mean(axis=(1, 2))], axis=-1
            )
            return self.h_head(f).reshape(-1, 4, 2)
        return self.h_head(feats0, feats1)


__main_model__ = XPoint
