"""ALIKED: differentiable keypoints + deformable descriptors, TPU-native.

Weight-compatible re-implementation of reference
models/extractors/aliked.py (786 LoC, the vendored Shiaoming/ALIKED model):

  - ConvBlock/ResBlock pyramid encoder with SELU gate and (folded) BatchNorm;
    blocks 3/4 use deformable convolution ('dcn', reference :270-328) —
    torchvision's CUDA deform_conv2d becomes a 9-tap bilinear-gather +
    matmul accumulation (`deform_conv2d` below), pure XLA ops.
  - Multi-scale aggregation: 1x1 convs + SELU per level, bilinear
    align_corners=True upsampling, concat; L2-normalized feature map and the
    4-conv score head (reference extract_dense_map :736-766).
  - DKD (reference :73-243): simple_nms, border zeroing, STATIC top-k (the
    force_num_keypoints path; threshold mode is expressed as a validity
    mask), temperature-0.1 soft-argmax sub-pixel refinement, bilinear
    keypoint rescoring, score dispersity.
  - SDDH (reference :458-580): 3x3 feature patch at each keypoint (with the
    reference's exact corner clamping), offset MLP (VALID 3x3 conv + SELU +
    1x1), clamped deformable sample positions, align_corners=True bilinear
    feature sampling, sf_conv + SELU, per-position aggregation weights.

Outputs keep this package's extractor contract: keypoints in PIXELS
(B, K, 2), keypoint_scores, descriptors, keypoint_mask. The reference
returns wh*(kp+1)/2 on the same normalized grid (aliked.py :774-780) —
identical pixel values.

Use conf `model_name` for the published channel configs; converted official
weights (scripts/convert_weights.py --kind aliked) load directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel
from .superpoint_open import simple_nms

CFGS = {
    # c1, c2, c3, c4, dim, K, M  (reference aliked.py:605-643)
    "aliked-t16": (8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": (16, 32, 64, 128, 128, 3, 32),
}


def _bilinear_zeros(fmap, x, y):
    """Bilinear sample fmap (H, W, C) at float coords (..., ) x/y with ZERO
    padding outside (grid_sample padding_mode='zeros' semantics)."""
    h, w, c = fmap.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix.astype(jnp.int32), 0, w - 1)
        iyc = jnp.clip(iy.astype(jnp.int32), 0, h - 1)
        v = fmap.reshape(h * w, c)[iyc * w + ixc]
        return v * inb.astype(fmap.dtype)[..., None]

    return (
        tap(x0, y0) * ((1 - wx) * (1 - wy))[..., None]
        + tap(x0 + 1, y0) * (wx * (1 - wy))[..., None]
        + tap(x0, y0 + 1) * ((1 - wx) * wy)[..., None]
        + tap(x0 + 1, y0 + 1) * (wx * wy)[..., None]
    )


def deform_conv2d(x, offset, kernel, bias=None):
    """Dense deformable conv (DCNv1, stride 1, SAME padding 1, 3x3) on NHWC.

    x: (B, H, W, Cin); offset: (B, H, W, 2*KH*KW) with torchvision's channel
    layout [dy_0, dx_0, dy_1, dx_1, ...] over row-major kernel taps;
    kernel: (KH, KW, Cin, Cout). Zero padding outside the map."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    ys = jnp.arange(h, dtype=x.dtype)[:, None]
    xs = jnp.arange(w, dtype=x.dtype)[None, :]
    out = None
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            dy = offset[..., 2 * k]
            dx = offset[..., 2 * k + 1]
            py = ys[None] + (ky - (kh - 1) // 2) + dy
            px = xs[None] + (kx - (kw - 1) // 2) + dx
            v = jax.vmap(_bilinear_zeros)(x, px, py)  # (B, H, W, Cin)
            part = jnp.einsum("bhwc,cd->bhwd", v, kernel[ky, kx])
            out = part if out is None else out + part
    if bias is not None:
        out = out + bias
    return out


class _Conv(nn.Module):
    """3x3/1x1 conv, OIHW-converted-friendly names, torch default padding."""

    features: int
    kernel: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel), padding="SAME",
            use_bias=self.use_bias, name="conv",
        )(x)


class _DCN(nn.Module):
    """DeformableConv2d (reference :270-328): offsets from a regular conv,
    clamped to +-max(h,w)/4, then the deformable 3x3."""

    features: int

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        max_offset = max(h, w) / 4.0
        off = nn.Conv(18, (3, 3), padding="SAME", name="offset_conv")(x)
        off = jnp.clip(off, -max_offset, max_offset)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(x, off, kernel, bias)


def _get_conv(features, conv_type, name):
    if conv_type == "dcn":
        return _DCN(features, name=name)
    return _Conv(features, use_bias=True, name=name)  # BN folded in => bias


class _ConvBlock(nn.Module):
    features: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x):
        x = nn.selu(_get_conv(self.features, self.conv_type, "conv1")(x))
        x = nn.selu(_get_conv(self.features, self.conv_type, "conv2")(x))
        return x


class _ResBlock(nn.Module):
    features: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x):
        out = nn.selu(_get_conv(self.features, self.conv_type, "conv1")(x))
        out = _get_conv(self.features, self.conv_type, "conv2")(out)
        identity = nn.Conv(
            self.features, (1, 1), use_bias=True, name="downsample"
        )(x)
        return nn.selu(out + identity)


class ALIKED(BaseModel):
    default_conf = {
        "name": "aliked",
        "model_name": "aliked-n16",
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0002,
        "nms_radius": 2,
        "force_num_keypoints": True,
        "weights": None,  # converted .npz (scripts/convert_weights.py)
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        c1, c2, c3, c4, dim, K, M = CFGS[conf.model_name]
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, -1)
        b, h, w, _ = image.shape
        # reference pads SYMMETRICALLY to /32 with replicate mode
        # (InputPadder :243-268)
        ph = -h % 32
        pw = -w % 32
        x = jnp.pad(
            image,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            mode="edge",
        )

        # ---- encoder (extract_dense_map :736-752)
        x1 = _ConvBlock(c1, name="block1")(x)
        x2 = nn.avg_pool(x1, (2, 2), strides=(2, 2))
        x2 = _ResBlock(c2, name="block2")(x2)
        x3 = nn.avg_pool(x2, (4, 4), strides=(4, 4))
        x3 = _ResBlock(c3, conv_type="dcn", name="block3")(x3)
        x4 = nn.avg_pool(x3, (4, 4), strides=(4, 4))
        x4 = _ResBlock(c4, conv_type="dcn", name="block4")(x4)

        # ---- aggregation: 1x1 + SELU per level, align_corners upsampling
        hp, wp = x1.shape[1:3]

        def up(t):
            # bilinear align_corners=True resize to full padded res (torch
            # nn.Upsample(align_corners=True); jax.image.resize uses
            # half-pixel centers, so sample explicitly)
            th, tw = t.shape[1:3]
            ys = jnp.arange(hp, dtype=jnp.float32) * ((th - 1) / max(hp - 1, 1))
            xs = jnp.arange(wp, dtype=jnp.float32) * ((tw - 1) / max(wp - 1, 1))
            gx, gy = jnp.meshgrid(xs, ys)
            return jax.vmap(_bilinear_zeros)(
                t,
                jnp.broadcast_to(gx.reshape(-1), (b, hp * wp)),
                jnp.broadcast_to(gy.reshape(-1), (b, hp * wp)),
            ).reshape(b, hp, wp, t.shape[-1])

        a1 = nn.selu(_Conv(dim // 4, 1, name="conv1")(x1))
        a2 = nn.selu(_Conv(dim // 4, 1, name="conv2")(x2))
        a3 = nn.selu(_Conv(dim // 4, 1, name="conv3")(x3))
        a4 = nn.selu(_Conv(dim // 4, 1, name="conv4")(x4))
        x1234 = jnp.concatenate([a1, up(a2), up(a3), up(a4)], axis=-1)

        # ---- score head + normalized features
        s = nn.selu(_Conv(8, 1, name="score1")(x1234))
        s = nn.selu(_Conv(4, 3, name="score2")(s))
        s = nn.selu(_Conv(4, 3, name="score3")(s))
        score_map = jax.nn.sigmoid(_Conv(1, 3, name="score4")(s))[..., 0]
        feature_map = x1234 / jnp.maximum(
            jnp.linalg.norm(x1234, axis=-1, keepdims=True), 1e-12
        )
        score_map = score_map[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w]
        feature_map = feature_map[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w]

        # ---- DKD (reference :73-243), static top-k
        r = conf.nms_radius
        nms = simple_nms(score_map, r)
        border = jnp.zeros((h, w), bool).at[r : h - r, r : w - r].set(True)
        nms = jnp.where(border, nms, 0.0)
        k = conf.max_num_keypoints
        topv, topi = jax.lax.top_k(nms.reshape(b, h * w), k)
        mask = topv > (conf.detection_threshold if conf.detection_threshold > 0 else -1.0)
        xs_i = (topi % w).astype(jnp.float32)
        ys_i = (topi // w).astype(jnp.float32)

        # soft-argmax window (temperature 0.1, reference :169-198)
        ks = 2 * r + 1
        gy, gx = np.meshgrid(
            np.linspace(-r, r, ks), np.linspace(-r, r, ks), indexing="ij"
        )
        grid = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2), jnp.float32)
        wy = ys_i[..., None] + grid[None, None, :, 1]
        wx = xs_i[..., None] + grid[None, None, :, 0]
        win = jax.vmap(_bilinear_zeros)(
            score_map[..., None], wx.reshape(b, -1), wy.reshape(b, -1)
        ).reshape(b, k, ks * ks)
        # (integer coords: the bilinear gather reads exact pixels; padding 0
        # like the reference's zero-padded Unfold)
        max_v = jnp.max(win, axis=-1, keepdims=True)
        x_exp = jnp.exp((win - max_v) / 0.1)
        denom = jnp.sum(x_exp, axis=-1, keepdims=True)
        residual = (x_exp @ grid) / denom  # (B, K, 2) xy
        dist2 = jnp.sum(
            ((grid[None, None] - residual[:, :, None]) / r) ** 2, axis=-1
        )
        dispersity = jnp.sum(x_exp * dist2, axis=-1) / denom[..., 0]
        kp_xy = jnp.stack([xs_i, ys_i], -1) + residual  # pixel coords

        kptscore = jax.vmap(_bilinear_zeros)(
            score_map[..., None], kp_xy[..., 0], kp_xy[..., 1]
        )[..., 0]

        # ---- SDDH descriptors (reference :458-580)
        desc = self._sddh(feature_map, kp_xy, dim, K, M)

        return {
            "keypoints": kp_xy,
            "keypoint_scores": jnp.where(mask, kptscore, 0.0),
            "score_dispersity": dispersity,
            "descriptors": desc,
            "keypoint_mask": mask,
            "score_map": score_map,
        }

    def _sddh(self, fmap, kp_xy, dim, K, M):
        """Sparse Deformable Descriptor Head on (B, H, W, D) features and
        (B, N, 2) pixel keypoints."""
        b, h, w, _ = fmap.shape
        max_offset = max(h, w) / 4.0
        # patch corner with the reference's exact clamp (get_patches :27-45)
        kp_long = jnp.floor(kp_xy).astype(jnp.int32)
        corner_x = jnp.clip(kp_long[..., 0] - K // 2, 0, w - 1 - K)
        corner_y = jnp.clip(kp_long[..., 1] - K // 2, 0, h - 1 - K)
        gy, gx = np.meshgrid(np.arange(K), np.arange(K), indexing="ij")
        px = corner_x[..., None] + jnp.asarray(gx.reshape(-1))[None, None]
        py = corner_y[..., None] + jnp.asarray(gy.reshape(-1))[None, None]
        flat_idx = py * w + px  # (B, N, K*K)
        patch = jax.vmap(
            lambda f, i: f.reshape(h * w, -1)[i.reshape(-1)]
        )(fmap, flat_idx).reshape(*kp_xy.shape[:2], K, K, dim)  # (B,N,K,K,D)

        # offset head: VALID 3x3 conv == one dense over the K*K*D patch
        w0 = self.param(
            "sddh_offset0_kernel", nn.initializers.lecun_normal(), (K, K, dim, 2 * M)
        )
        b0 = self.param("sddh_offset0_bias", nn.initializers.zeros, (2 * M,))
        o = jnp.einsum("bnhwd,hwdc->bnc", patch, w0) + b0
        o = nn.selu(o)
        w1 = self.param(
            "sddh_offset1_kernel", nn.initializers.lecun_normal(), (2 * M, 2 * M)
        )
        b1 = self.param("sddh_offset1_bias", nn.initializers.zeros, (2 * M,))
        o = jnp.clip(o @ w1 + b1, -max_offset, max_offset)
        # reference views (N, 2, M) then permutes -> offsets[:, m] = (o[m], o[M+m])
        off = o.reshape(*o.shape[:2], 2, M).transpose(0, 1, 3, 2)  # (B,N,M,2) xy

        pos = kp_xy[:, :, None, :] + off  # (B, N, M, 2) float pixels
        feats = jax.vmap(
            lambda f, x_, y_: _bilinear_zeros(f, x_, y_)
        )(fmap, pos[..., 0].reshape(b, -1), pos[..., 1].reshape(b, -1))
        feats = feats.reshape(*kp_xy.shape[:2], M, dim)  # (B, N, M, D)

        wsf = self.param(
            "sddh_sf_kernel", nn.initializers.lecun_normal(), (dim, dim)
        )
        feats = nn.selu(jnp.einsum("bnmd,de->bnme", feats, wsf))
        agg = self.param(
            "sddh_agg_weights",
            nn.initializers.normal(0.5),
            (M, dim, dim),
        )
        desc = jnp.einsum("bnmd,mde->bne", feats, agg)
        return desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

    def loss(self, pred, data):
        raise NotImplementedError


def _bilinear_raw(fmap, x, y):
    """(B, H, W, C) bilinear sample at (B, K) pixel coords, clamped edges
    (kept for DISK's sampler)."""
    b, h, w, c = fmap.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = fmap.reshape(b, h * w, c)

    def g(iy, ix):
        return jnp.take_along_axis(flat, (iy * w + ix)[..., None], axis=1)

    return (
        g(y0i, x0i) * ((1 - wx) * (1 - wy))[..., None]
        + g(y0i, x1i) * (wx * (1 - wy))[..., None]
        + g(y1i, x0i) * ((1 - wx) * wy)[..., None]
        + g(y1i, x1i) * (wx * wy)[..., None]
    )


__main_model__ = ALIKED
