"""DoG-SIFT implemented as a JAX conv pyramid — runs fully on-device.

The reference's SIFT is native C++ behind pycolmap/OpenCV
(models/extractors/sift.py:9-12,137-213); our host backend
(models/extractors/sift.py here) wraps OpenCV in a callback. This module is
the TPU-NATIVE backend promised by SURVEY §2.9 ("DoG-SIFT as JAX conv
pyramid"): the whole detect+describe path is jit-compiled, so per-view
feature extraction during training runs on the chip instead of the 2-core
host (the previous throughput bottleneck of the per-view recipe).

Design (all static shapes):
  - Gaussian scale space: `num_octaves` octaves x (scales+3) images, built
    with separable DW convolutions; difference-of-Gaussians per octave.
  - Extrema: 3x3 spatial max/min pools of the 3 adjacent DoG slices
    (26-neighbor test as pure reduce_window ops), contrast threshold and
    Lowe's edge-response (Hessian trace^2/det) filter.
  - One global top-k over the concatenated per-octave candidate scores
    (|DoG|), decoded back to octave/scale/position. Fixed K + validity mask.
  - Orientation: 36-bin Gaussian-weighted gradient histogram with parabolic
    peak refinement (shared with KeyNet's dominant_orientation).
  - Descriptor: rotated 18x18 patch -> 16x16 gradients -> classic 4x4x8
    trilinear histogram computed as ONE einsum against a precomputed static
    spatial-weight matrix; clip at 0.2, renormalize, optional RootSIFT
    (reference sift.py:54-57).

Same output contract as the host SIFT (keypoints/scores/scales/oris (rad)/
descriptors/keypoint_mask), so it slots into cached/per-view training and the
hermetic benchmarks unchanged: set `extractor.name=sift_tpu`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel
from .keynet_hardnet import (
    _gaussian_kernel1d,
    dominant_orientation,
    extract_patches_laf,
)


def _blur_dw(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W, 1)."""
    if sigma < 1e-4:
        return x
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, k.reshape(-1, 1, 1, 1), (1, 1), "SAME", dimension_numbers=dn
    )
    return jax.lax.conv_general_dilated(
        x, k.reshape(1, -1, 1, 1), (1, 1), "SAME", dimension_numbers=dn
    )


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, ::2, ::2, :]


def _spatial_weights_4x4(p: int = 16) -> np.ndarray:
    """Static (p*p, 16) trilinear spatial weights of each patch pixel onto the
    4x4 descriptor cells (classic SIFT binning)."""
    w = np.zeros((p * p, 16), np.float32)
    for iy in range(p):
        for ix in range(p):
            # continuous cell coords in [ -0.5, 3.5 ]
            cy = (iy + 0.5) / p * 4.0 - 0.5
            cx = (ix + 0.5) / p * 4.0 - 0.5
            y0, x0 = int(np.floor(cy)), int(np.floor(cx))
            fy, fx = cy - y0, cx - x0
            for dy, wy in ((y0, 1 - fy), (y0 + 1, fy)):
                if not 0 <= dy < 4:
                    continue
                for dx, wx in ((x0, 1 - fx), (x0 + 1, fx)):
                    if not 0 <= dx < 4:
                        continue
                    w[iy * p + ix, dy * 4 + dx] += wy * wx
    # Gaussian window over the patch (sigma = half patch width)
    lin = (np.arange(p) + 0.5) / p * 2 - 1
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    g = np.exp(-(gx**2 + gy**2) / (2 * 0.5**2)).reshape(-1, 1)
    return (w * g).astype(np.float32)


def sift_descriptor(
    patches: jnp.ndarray, rootsift: bool = True, num_ori: int = 8
) -> jnp.ndarray:
    """(N, 18, 18) rotated intensity patches -> (N, 128) SIFT descriptors.

    Gradients from central differences on the interior 16x16; orientation
    bins with linear interpolation; spatial bins via the static weight
    matrix; SIFT normalization (L2 -> clip 0.2 -> L2), optional RootSIFT.
    """
    p = patches.shape[-1] - 2
    gx = (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2]) * 0.5
    gy = (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1]) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12).reshape(-1, p * p)
    ang = jnp.arctan2(gy, gx).reshape(-1, p * p)  # patch frame == kp frame

    bins = (ang + jnp.pi) / (2 * jnp.pi) * num_ori
    bins = jnp.clip(bins, 0, num_ori - 1e-4)
    lo = jnp.floor(bins)
    frac = bins - lo
    lo_i = lo.astype(jnp.int32) % num_ori
    hi_i = (lo_i + 1) % num_ori
    w_ori = jax.nn.one_hot(lo_i, num_ori) * (1 - frac)[..., None] + jax.nn.one_hot(
        hi_i, num_ori
    ) * frac[..., None]  # (N, P*P, 8)
    w_sp = jnp.asarray(_spatial_weights_4x4(p))  # (P*P, 16) static
    desc = jnp.einsum("pc,npo->nco", w_sp, w_ori * mag[..., None])  # (N, 16, 8)
    desc = desc.reshape(-1, 16 * num_ori)

    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = jnp.minimum(desc / norm, 0.2)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = desc / norm
    if rootsift:
        desc = jnp.sqrt(
            desc / jnp.maximum(jnp.sum(desc, axis=-1, keepdims=True), 1e-8)
        )
    return desc


class SIFTTPU(BaseModel):
    """See module docstring. Interface mirrors models/extractors/sift.py."""

    default_conf = {
        "name": "sift_tpu",
        "max_num_keypoints": 2048,
        "detection_threshold": 0.0066667,  # DoG contrast threshold (OpenCV-like)
        "edge_threshold": 10.0,
        "num_octaves": 4,
        "scales_per_octave": 3,
        "sigma0": 1.6,
        "rootsift": True,
        "upright": False,
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
        image = image.astype(jnp.float32)
        b, h, w, _ = image.shape
        s = int(conf.scales_per_octave)
        n_oct = int(conf.num_octaves)
        sigma0 = float(conf.sigma0)
        k_step = 2.0 ** (1.0 / s)

        # per-octave incremental blur sigmas (applied on top of the previous
        # scale): sigma_total(i) = sigma0 * k^i
        inc = [
            sigma0 * (k_step**i) * math.sqrt(max(k_step**2 - 1.0, 1e-9))
            for i in range(s + 2)
        ]

        cand_scores = []  # per octave: (B, Hs*Ws*S)
        cand_meta = []  # (octave, scale_idx, Hs, Ws)
        base = _blur_dw(image, sigma0)  # assume input pre-smoothed ~ sigma0
        for o in range(n_oct):
            if min(base.shape[1], base.shape[2]) < 16:
                break
            gss = [base]
            for i in range(s + 2):
                gss.append(_blur_dw(gss[-1], inc[i]))
            dog = [gss[i + 1] - gss[i] for i in range(s + 2)]  # (S+2) maps
            dogs = jnp.concatenate(dog, axis=-1)  # (B, Hs, Ws, S+2)

            mx = jax.lax.reduce_window(
                dogs, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "SAME"
            )
            mn = jax.lax.reduce_window(
                dogs, jnp.inf, jax.lax.min, (1, 3, 3, 3), (1, 1, 1, 1), "SAME"
            )
            d_mid = dogs[..., 1 : s + 1]  # candidate scales
            is_ext = (d_mid >= mx[..., 1 : s + 1]) | (d_mid <= mn[..., 1 : s + 1])
            contrast = jnp.abs(d_mid) > conf.detection_threshold

            # Lowe's edge filter on the spatial Hessian of each DoG slice
            dxx = (
                jnp.roll(d_mid, -1, 2) + jnp.roll(d_mid, 1, 2) - 2 * d_mid
            )
            dyy = (
                jnp.roll(d_mid, -1, 1) + jnp.roll(d_mid, 1, 1) - 2 * d_mid
            )
            dxy = 0.25 * (
                jnp.roll(jnp.roll(d_mid, -1, 1), -1, 2)
                - jnp.roll(jnp.roll(d_mid, -1, 1), 1, 2)
                - jnp.roll(jnp.roll(d_mid, 1, 1), -1, 2)
                + jnp.roll(jnp.roll(d_mid, 1, 1), 1, 2)
            )
            tr = dxx + dyy
            det = dxx * dyy - dxy * dxy
            r = float(conf.edge_threshold)
            edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)

            hs, ws = d_mid.shape[1], d_mid.shape[2]
            margin = jnp.zeros((hs, ws), bool).at[8:-8, 8:-8].set(True)
            keep = is_ext & contrast & edge_ok & margin[None, :, :, None]
            score = jnp.where(keep, jnp.abs(d_mid), 0.0)
            cand_scores.append(score.reshape(b, -1))
            cand_meta.append((o, hs, ws))

            base = _downsample2(gss[s])  # next octave seed (sigma doubled)

        all_scores = jnp.concatenate(cand_scores, axis=1)
        k = int(conf.max_num_keypoints)
        if jax.default_backend() == "tpu":
            topv, topi = jax.lax.approx_max_k(all_scores, k)
        else:
            topv, topi = jax.lax.top_k(all_scores, k)
        mask = topv > 0.0

        # decode flat index -> octave, y, x, scale
        sizes = np.array([hs * ws * s for (_, hs, ws) in cand_meta])
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        xs = jnp.zeros_like(topv)
        ys = jnp.zeros_like(topv)
        sigmas = jnp.zeros_like(topv)
        for idx, (o, hs, ws) in enumerate(cand_meta):
            local = topi - int(offsets[idx])
            in_oct = (topi >= int(offsets[idx])) & (topi < int(offsets[idx + 1]))
            yy = (local // (ws * s)).astype(jnp.float32)
            rem = local % (ws * s)
            xx = (rem // s).astype(jnp.float32)
            si = (rem % s).astype(jnp.float32)
            scale_mult = float(2**o)
            xs = jnp.where(in_oct, (xx + 0.5) * scale_mult - 0.5, xs)
            ys = jnp.where(in_oct, (yy + 0.5) * scale_mult - 0.5, ys)
            sigmas = jnp.where(
                in_oct, sigma0 * k_step ** (si + 1.0) * scale_mult, sigmas
            )

        keypoints = jnp.stack([xs, ys], axis=-1)
        kp_scores = jnp.where(mask, topv, 0.0)

        if conf.upright:
            oris = jnp.zeros((b, k), jnp.float32)
        else:
            ori_patches = extract_patches_laf(
                image, keypoints, 4.5 * sigmas, jnp.zeros((b, k)), patch=19
            )
            oris = dominant_orientation(ori_patches)

        # descriptor window half-extent: 6*sigma covers the 4x4 cells of
        # width 3*sigma each (classic SIFT geometry)
        patches = extract_patches_laf(
            image, keypoints, 6.0 * sigmas, oris, patch=18
        )
        desc = sift_descriptor(
            patches.reshape(b * k, 18, 18), rootsift=bool(conf.rootsift)
        ).reshape(b, k, 128)
        desc = desc * mask[..., None]

        return {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": kp_scores,
            "scales": sigmas,
            "oris": oris,
            "descriptors": desc,
            "keypoint_mask": mask,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = SIFTTPU
