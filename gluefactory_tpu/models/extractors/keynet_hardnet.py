"""KeyNet detector + HardNet patch descriptor, TPU-native.

Counterpart of reference models/extractors/keynet_affnet_hardnet.py (a thin
kornia.feature.KeyNetHardNet wrapper, 97 LoC). kornia is unavailable here, so
the full pipeline is implemented natively from the papers' architectures:

  - KeyNet ("Key.Net: Keypoint Detection by Handcrafted and Learned CNN
    Filters", Barroso-Laguna et al.): handcrafted 1st/2nd-order derivative
    feature block (10 channels) -> 3 learned conv blocks -> 1-channel score
    head, evaluated over a fixed image pyramid; per-level scores are
    upsampled and blended into one response map. The detection level gives
    each keypoint its scale.
  - Orientation: dominant-gradient-orientation per patch (36-bin Gaussian-
    weighted histogram, like kornia's PatchDominantGradientOrientation);
    disabled with `upright=True` (reference conf `upright`).
  - HardNet ("Working hard to know your neighbor's margins"): the standard
    7-conv architecture on per-patch-normalized 32x32 crops -> 128-d
    L2-normalized descriptors.

TPU-first: everything is fixed-shape (static pyramid, static top-k with a
validity mask like the other extractors), patches for orientation/HardNet are
gathered with batched bilinear sampling and the descriptor conv runs as ONE
(B*K, 32, 32, 1) batch on the MXU. No per-image Python loop (the reference
loops over the batch, keynet_affnet_hardnet.py:33-53).

Outputs mirror the reference: keypoints, scales, oris, lafs, keypoint_scores,
descriptors (desc_dim=128), plus keypoint_mask for the padding discipline.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel
from .superpoint_open import simple_nms


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W, C)."""
    radius = max(1, int(round(3.0 * sigma)))
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    c = x.shape[-1]
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )


def _derivatives(x: jnp.ndarray):
    """Sobel-style first derivatives of (B, H, W, 1) -> gx, gy."""
    sobel = np.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
    kx = jnp.asarray(sobel).reshape(3, 3, 1, 1)
    ky = jnp.asarray(sobel.T).reshape(3, 3, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    gx = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn)
    return gx, gy


def handcrafted_features(x: jnp.ndarray) -> jnp.ndarray:
    """KeyNet's handcrafted block: 10 channels of 1st/2nd-order derivative
    combinations (Key.Net paper, Sec. 3.1)."""
    gx, gy = _derivatives(x)
    gxx, gxy = _derivatives(gx)
    _, gyy = _derivatives(gy)
    feats = [
        gx,
        gy,
        gx * gy,
        gx * gx,
        gy * gy,
        gxx,
        gyy,
        gxx * gyy,
        gxy,
        gxy * gxy,
    ]
    return jnp.concatenate(feats, axis=-1)


class _KeyNetScoreHead(nn.Module):
    """Learned block: 3x (conv5x5 -> BN -> ReLU) + 1-channel score conv."""

    channels: int = 8

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = feats
        for i in range(3):
            x = nn.Conv(self.channels, (5, 5), padding="SAME", name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        score = nn.Conv(1, (5, 5), padding="SAME", name="score")(x)
        return score[..., 0]  # (B, H, W)


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, x.shape[:-3] + (h, w) + x.shape[-1:], "bilinear")


def extract_patches_laf(
    image: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    oris: jnp.ndarray,
    patch: int = 32,
    radius_mult: float = 1.0,
) -> jnp.ndarray:
    """Bilinearly sample (B, K, patch, patch) crops of (B, H, W, 1) `image`
    at rotated/scaled LAF grids. `scales` is the patch half-width in pixels,
    `oris` in radians."""
    b, h, w, _ = image.shape
    k = centers.shape[1]
    lin = (jnp.arange(patch, dtype=jnp.float32) + 0.5) / patch * 2.0 - 1.0
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")  # (P, P) in [-1, 1]
    grid = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (P*P, 2)

    cos = jnp.cos(oris)
    sin = jnp.sin(oris)
    r = scales * radius_mult  # (B, K)
    # rotation * scale applied to unit grid, then shift to center
    rot = jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2
    )  # (B, K, 2, 2)
    pts = jnp.einsum("pj,bkij->bkpi", grid, rot) * r[..., None, None]
    pts = pts + centers[:, :, None, :]  # (B, K, P*P, 2) xy

    x = jnp.clip(pts[..., 0], 0.0, w - 1.0)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = image[..., 0].reshape(b, h * w)

    def gather(iy, ix):
        idx = (iy * w + ix).reshape(b, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, k, patch * patch)

    out = (
        gather(y0i, x0i) * ((1 - wx) * (1 - wy))
        + gather(y0i, x1i) * (wx * (1 - wy))
        + gather(y1i, x0i) * ((1 - wx) * wy)
        + gather(y1i, x1i) * (wx * wy)
    )
    return out.reshape(b, k, patch, patch)


def dominant_orientation(patches: jnp.ndarray, num_bins: int = 36) -> jnp.ndarray:
    """Dominant gradient orientation (radians) of (B, K, P, P) patches via a
    Gaussian-weighted histogram (kornia PatchDominantGradientOrientation
    semantics)."""
    b, k, p, _ = patches.shape
    x = patches.reshape(b * k, p, p, 1)
    gx, gy = _derivatives(x)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)[..., 0]
    ang = jnp.arctan2(gy[..., 0], gx[..., 0])  # (-pi, pi]
    lin = jnp.linspace(-1.0, 1.0, p)
    gyw, gxw = jnp.meshgrid(lin, lin, indexing="ij")
    gauss = jnp.exp(-(gxw**2 + gyw**2) / (2 * 0.4**2))
    wgt = (mag * gauss[None]).reshape(b * k, p * p)

    bins = (ang + jnp.pi) / (2 * jnp.pi) * num_bins
    bins = jnp.clip(bins.reshape(b * k, p * p), 0, num_bins - 1e-3)
    lo = jnp.floor(bins)
    frac = bins - lo
    lo_i = lo.astype(jnp.int32) % num_bins
    hi_i = (lo_i + 1) % num_bins
    onehot_lo = jax.nn.one_hot(lo_i, num_bins, dtype=wgt.dtype)
    onehot_hi = jax.nn.one_hot(hi_i, num_bins, dtype=wgt.dtype)
    hist = jnp.einsum("np,npb->nb", wgt * (1 - frac), onehot_lo) + jnp.einsum(
        "np,npb->nb", wgt * frac, onehot_hi
    )
    # circular smoothing
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    best = jnp.argmax(hist, axis=-1)
    # parabolic refinement around the peak bin
    left = jnp.take_along_axis(hist, ((best - 1) % num_bins)[:, None], 1)[:, 0]
    mid = jnp.take_along_axis(hist, best[:, None], 1)[:, 0]
    right = jnp.take_along_axis(hist, ((best + 1) % num_bins)[:, None], 1)[:, 0]
    denom = left - 2 * mid + right
    offset = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (left - right) / denom, 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    theta = (best + offset + 0.5) / num_bins * 2 * jnp.pi - jnp.pi
    return theta.reshape(b, k)


class _HardNet(nn.Module):
    """HardNet descriptor CNN (7 conv layers, 32x32x1 -> 128)."""

    out_dim: int = 128

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        # per-patch normalization (HardNet input norm)
        mu = jnp.mean(patches, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(patches, axis=(1, 2, 3), keepdims=True)
        x = (patches - mu) / (sd + 1e-7)

        def block(x, c, stride=1, name=""):
            x = nn.Conv(
                c, (3, 3), strides=(stride, stride), padding="SAME",
                use_bias=False, name=f"conv{name}",
            )(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=f"bn{name}")(x)
            return nn.relu(x)

        x = block(x, 32, 1, "0")
        x = block(x, 32, 1, "1")
        x = block(x, 64, 2, "2")
        x = block(x, 64, 1, "3")
        x = block(x, 128, 2, "4")
        x = block(x, 128, 1, "5")
        x = nn.Conv(
            self.out_dim, (8, 8), padding="VALID", use_bias=False, name="conv6"
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn6")(x)
        x = x.reshape(x.shape[0], -1)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class KeyNetHardNet(BaseModel):
    """See module docstring. Conf mirrors keynet_affnet_hardnet.py:9-15."""

    default_conf = {
        "name": "keynet_hardnet",
        "max_num_keypoints": 1024,
        "desc_dim": 128,
        "upright": False,
        "scale_laf": 1.0,
        "num_levels": 3,  # pyramid levels (KeyNet multi-scale)
        "pyramid_ratio": 1.2,
        "nms_radius": 4,
        "detection_threshold": 0.0,
        "patch_size": 32,
        "weights": None,  # converted kornia weights (.npz); random init otherwise
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]  # (B, H, W, C) in [0, 1]
        if image.shape[-1] == 3:
            image = jnp.sum(
                image * jnp.asarray([0.299, 0.587, 0.114], image.dtype),
                -1,
                keepdims=True,
            )
        b, h, w, _ = image.shape

        head = _KeyNetScoreHead()
        ratio = float(conf.pyramid_ratio)
        level_score = []
        level_sigma = []
        x = image
        for lvl in range(conf.num_levels):
            if lvl > 0:
                x = _blur(x, 0.8 * ratio)
                hs = max(8, int(round(h / ratio**lvl)))
                ws = max(8, int(round(w / ratio**lvl)))
                x = _resize_bilinear(x, hs, ws)
            feats = handcrafted_features(x)
            s = head(feats)  # shared weights across levels
            if lvl > 0:
                s = _resize_bilinear(s[..., None], h, w)[..., 0]
            level_score.append(s)
            level_sigma.append(ratio**lvl)
        scores_all = jnp.stack(level_score, axis=-1)  # (B, H, W, L)
        scores = jnp.mean(scores_all, axis=-1)
        best_level = jnp.argmax(scores_all, axis=-1)  # (B, H, W)

        scores = jax.nn.relu(scores)
        scores = simple_nms(scores, conf.nms_radius)
        pad = 8  # keep LAF patches inside the image
        border = jnp.zeros((h, w), bool).at[pad:-pad, pad:-pad].set(True)
        scores = jnp.where(border, scores, 0.0)

        k = conf.max_num_keypoints
        flat = scores.reshape(b, h * w)
        if jax.default_backend() == "tpu":
            topv, topi = jax.lax.approx_max_k(flat, k)
        else:
            topv, topi = jax.lax.top_k(flat, k)
        ys = (topi // w).astype(jnp.float32)
        xs = (topi % w).astype(jnp.float32)
        keypoints = jnp.stack([xs, ys], axis=-1)  # (B, K) xy
        mask = topv > conf.detection_threshold
        kp_scores = jnp.where(mask, topv, 0.0)

        lvl_at_kp = jnp.take_along_axis(
            best_level.reshape(b, h * w), topi, axis=1
        ).astype(jnp.float32)
        sigmas = jnp.asarray(level_sigma, jnp.float32)
        # LAF scale in pixels: base patch half-extent at the detection level
        scales = (
            jnp.take(sigmas, lvl_at_kp.astype(jnp.int32)) * 6.0 * float(conf.scale_laf)
        )

        if conf.upright:
            oris = jnp.zeros((b, k), jnp.float32)
        else:
            ori_patches = extract_patches_laf(
                image, keypoints, scales, jnp.zeros((b, k)), patch=19
            )
            oris = dominant_orientation(ori_patches)

        patches = extract_patches_laf(
            image, keypoints, scales, oris, patch=conf.patch_size
        )
        descs = _HardNet(conf.desc_dim)(
            patches.reshape(b * k, conf.patch_size, conf.patch_size, 1)
        ).reshape(b, k, conf.desc_dim)
        descs = descs * mask[..., None]

        cos = jnp.cos(oris)
        sin = jnp.sin(oris)
        lafs = jnp.stack(
            [
                jnp.stack([scales * cos, -scales * sin, keypoints[..., 0]], -1),
                jnp.stack([scales * sin, scales * cos, keypoints[..., 1]], -1),
            ],
            -2,
        )  # (B, K, 2, 3) like kornia LAFs

        return {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": kp_scores,
            "descriptors": descs,
            "scales": scales,
            "oris": jnp.degrees(oris),
            "lafs": lafs,
            "keypoint_mask": mask,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = KeyNetHardNet
