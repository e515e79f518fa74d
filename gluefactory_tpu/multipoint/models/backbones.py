"""XPoint attention backbones, faithful to the reference's backbone family.

Counterparts (architecture specs, re-designed for JAX/flax/TPU — static
shapes, numpy-precomputed window masks/index tables, NHWC):

  - SwinV2Encoder     <- gluefactory/multipoint/models/SwinTransformerV2.py
        cosine attention with learnable clamped per-head logit scale
        (:168-171), continuous log-spaced relative position bias from a
        2->512->heads MLP ("log-CPB", :100-137, 16*sigmoid at :179),
        res-post-norm blocks, shifted windows with boundary masks
        (:267-289), hierarchical stages with PatchMerging (:348-365).
  - SwinIREncoder     <- gluefactory/multipoint/models/SwinIR.py
        V1 window attention with a LEARNED relative-position-bias table
        (:65-114), pre-norm blocks, residual Swin transformer groups
        (RSTB: blocks + trailing 3x3 conv + group residual, :404-460) and
        a global conv_after_body residual.
  - SCUNetEncoder     <- gluefactory/multipoint/models/ScuNet.py
        ConvTransBlocks that split channels into a residual conv branch and
        a Swin (W/SW) branch, rejoined by 1x1 convs (:127-163), stacked in
        the UNet's downsampling half (:166-226).

All encoders take (B, H, W, C) and return (B, H/8, W/8, out_dim) features for
MultiPoint's shared cell-8 heads. DropPath/dropout are omitted (rates are 0
in the fork's configs). Zero egress: no pretrained weights, so the
Swinv2pretrained.py variant collapses into SwinV2Encoder with conf'd dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_merge(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    """(N, N) index into the (2ws-1)^2 relative-offset table (reference
    SwinTransformerV2.py:140-151)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def _log_coords_table(ws: int) -> np.ndarray:
    """((2ws-1)^2, 2) log-spaced relative coordinates, the log-CPB input
    (reference SwinTransformerV2.py:125-137: /(ws-1), *8, sign*log2(|x|+1)/3)."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)  # (2w-1,2w-1,2)
    table = table / max(ws - 1, 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2)


@functools.lru_cache(maxsize=None)
def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask separating the wrapped sub-windows of a
    cyclic-shifted partition (reference SwinTransformerV2.py:267-289)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, h - ws), slice(h - ws, h - shift), slice(h - shift, h)):
        for vs in (slice(0, w - ws), slice(w - ws, w - shift), slice(w - shift, w)):
            img[hs, vs] = cnt
            cnt += 1
    wins = (
        img.reshape(h // ws, ws, w // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttentionV2(nn.Module):
    """SwinV2 cosine window attention with log-CPB (reference :152-191)."""

    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None):
        nw, n, c = x.shape
        heads, dh = self.heads, self.dim // self.heads

        # fused qkv without bias; separate learnable q/v biases (k has none,
        # reference :113-119)
        qkv_w = self.param(
            "qkv", nn.initializers.lecun_normal(), (c, 3 * self.dim)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        qkv = x @ qkv_w + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(nw, n, heads, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        # cosine attention: normalized q.k times clamped learned scale
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-8)
        logit_scale = self.param(
            "logit_scale",
            lambda _key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
            (heads, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))
        attn = (
            jnp.einsum("whnd,whmd->whnm", q, k, preferred_element_type=jnp.float32)
            * scale
        )

        # continuous relative position bias: MLP(2 -> 512 -> heads) over the
        # log-spaced coords table, gathered per token pair, 16*sigmoid
        table = jnp.asarray(_log_coords_table(self.window))  # (T, 2)
        hdim = nn.Dense(512, name="cpb_fc1")(table)
        bias_table = nn.Dense(self.heads, use_bias=False, name="cpb_fc2")(
            nn.relu(hdim)
        )  # (T, heads)
        idx = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        rel_bias = bias_table[idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + 16.0 * jax.nn.sigmoid(rel_bias)[None]

        if mask is not None:
            nmask = mask.shape[0]
            attn = attn.reshape(nw // nmask, nmask, heads, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(nw, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whnm,whmd->whnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinV2Block(nn.Module):
    """Res-post-norm Swin block: x + norm(attn(x)), x + norm(mlp(x))
    (the V2 ordering, reference :290-347)."""

    dim: int
    heads: int
    window: int
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws, shift = self.window, self.shift
        if min(h, w) <= ws:  # window >= image: no partition benefit, no shift
            ws, shift = min(h, w), 0

        shortcut = x
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        wins = window_partition(x, ws)
        mask = _shift_mask(h, w, ws, shift) if shift else None
        wins = WindowAttentionV2(self.dim, self.heads, ws, name="attn")(wins, mask)
        x = window_merge(wins, ws, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + nn.LayerNorm(name="norm1")(x)

        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(x)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y))
        return x + nn.LayerNorm(name="norm2")(y)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> linear reduction to 2C (reference :348-365;
    V2 order: reduction then norm)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(name="norm")(x)


class SwinV2Encoder(nn.Module):
    """Hierarchical SwinV2: stride-4 patch embed, stage0 at 1/4, PatchMerging,
    stage1 at 1/8 (reference SwinTransformerV2.py:576-734 scaled to the
    XPoint cell-8 feature contract)."""

    dim: int = 96
    depths: tuple = (2, 2)
    heads: tuple = (3, 6)
    window: int = 8

    @nn.compact
    def __call__(self, x, is_training: bool):
        x = nn.Conv(self.dim, (4, 4), strides=(4, 4), padding="VALID",
                    name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)
        for i in range(self.depths[0]):
            x = SwinV2Block(
                self.dim, self.heads[0], self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                name=f"stage0_block{i}",
            )(x)
        x = PatchMerging(2 * self.dim, name="merge")(x)
        for i in range(self.depths[1]):
            x = SwinV2Block(
                2 * self.dim, self.heads[1], self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                name=f"stage1_block{i}",
            )(x)
        return nn.LayerNorm(name="norm_out")(x)


class WindowAttentionV1(nn.Module):
    """Swin V1 window attention: scaled dot product + LEARNED relative
    position bias table (reference SwinIR.py:65-114)."""

    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None):
        nw, n, c = x.shape
        heads, dh = self.heads, self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(nw, n, heads, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = (
            jnp.einsum("whnd,whmd->whnm", q, k, preferred_element_type=jnp.float32)
            * dh**-0.5
        )
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        rel_bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + rel_bias[None]
        if mask is not None:
            nmask = mask.shape[0]
            attn = attn.reshape(nw // nmask, nmask, heads, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(nw, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whnm,whmd->whnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinV1Block(nn.Module):
    """Pre-norm Swin block (V1 ordering, reference SwinIR.py:164-298)."""

    dim: int
    heads: int
    window: int
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws, shift = self.window, self.shift
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        wins = window_partition(x, ws)
        mask = _shift_mask(h, w, ws, shift) if shift else None
        wins = WindowAttentionV1(self.dim, self.heads, ws, name="attn")(wins, mask)
        x = window_merge(wins, ws, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y))
        return x + y


class RSTB(nn.Module):
    """Residual Swin Transformer Block group: V1 blocks + trailing 3x3 conv
    + group residual (reference SwinIR.py:349-460)."""

    dim: int
    depth: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.depth):
            x = SwinV1Block(
                self.dim, self.heads, self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                name=f"block{i}",
            )(x)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv")(x)
        return x + res


class SwinIREncoder(nn.Module):
    """SwinIR-style feature extractor for XPoint: shallow conv feature, RSTB
    deep feature groups with a global conv residual (reference SwinIR.py
    conv_first / layers / conv_after_body, :500-700). SwinIR natively keeps
    full resolution; the XPoint heads need cell-8 features, so the shallow
    stage downsamples by 8 with strided convs first (documented deviation)."""

    dim: int = 96
    groups: int = 2
    depth: int = 2
    heads: int = 6
    window: int = 8

    @nn.compact
    def __call__(self, x, is_training: bool):
        # shallow feature + downsample to the cell grid
        x = nn.Conv(self.dim // 2, (3, 3), strides=(2, 2), padding="SAME",
                    name="conv_first")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="SAME",
                    name="down1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="SAME",
                    name="down2")(x)
        shallow = x
        for g in range(self.groups):
            x = RSTB(self.dim, self.depth, self.heads, self.window,
                     name=f"rstb{g}")(x)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv_after_body")(x)
        return x + shallow


class ConvTransBlock(nn.Module):
    """SCUNet block: channels split into a residual conv branch and a Swin
    (W or SW) branch, rejoined by 1x1 convs around them
    (reference ScuNet.py:127-163)."""

    conv_dim: int
    trans_dim: int
    head_dim: int = 32
    window: int = 8
    swin_type: str = "W"  # "W" | "SW"

    @nn.compact
    def __call__(self, x):
        full = self.conv_dim + self.trans_dim
        y = nn.Conv(full, (1, 1), name="conv1_1")(x)
        cx, tx = jnp.split(y, [self.conv_dim], axis=-1)
        # conv branch: residual double conv
        cy = nn.Conv(self.conv_dim, (3, 3), padding="SAME", name="cb1")(cx)
        cy = nn.Conv(self.conv_dim, (3, 3), padding="SAME", name="cb2")(nn.relu(cy))
        cx = cx + cy
        # transformer branch: one V1-style block (WMSA with learned bias)
        tx = SwinV1Block(
            self.trans_dim, max(self.trans_dim // self.head_dim, 1), self.window,
            shift=0 if self.swin_type == "W" else self.window // 2,
            name="trans",
        )(tx)
        y = nn.Conv(full, (1, 1), name="conv1_2")(
            jnp.concatenate([cx, tx], axis=-1)
        )
        return x + y


class SCUNetEncoder(nn.Module):
    """Downsampling half of SCUNet as an encoder: head conv + three stages of
    ConvTransBlocks with stride-2 conv downsampling, to 1/8 resolution
    (reference ScuNet.py:166-226 m_head/m_down1..3)."""

    dim: int = 64
    out_dim: int = 96
    blocks_per_stage: int = 2
    window: int = 8

    @nn.compact
    def __call__(self, x, is_training: bool):
        d = self.dim
        x = nn.Conv(d, (3, 3), padding="SAME", name="head")(x)
        for stage in range(3):
            for i in range(self.blocks_per_stage):
                x = ConvTransBlock(
                    d // 2, d - d // 2, window=self.window,
                    swin_type="W" if i % 2 == 0 else "SW",
                    name=f"stage{stage}_block{i}",
                )(x)
            d = min(d * 2, 4 * self.dim)
            x = nn.Conv(d, (2, 2), strides=(2, 2), padding="VALID",
                        name=f"down{stage}")(x)
        return nn.Conv(self.out_dim, (1, 1), name="proj")(x)


__all__ = [
    "SwinV2Encoder", "SwinIREncoder", "SCUNetEncoder",
    "SwinV2Block", "SwinV1Block", "WindowAttentionV2", "WindowAttentionV1",
    "PatchMerging", "RSTB", "ConvTransBlock",
    "window_partition", "window_merge",
]
