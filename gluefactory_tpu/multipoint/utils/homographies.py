"""Homographic adaptation for self-supervised detector labeling.

Counterpart of reference gluefactory/multipoint/utils/homographies.py:207-330:
aggregate the detector probability over many random warps of the image to
build pseudo-ground-truth keypoint maps (the SuperPoint "homographic
adaptation" bootstrapping step).

JAX design: the K random homographies are sampled on host; warping of images
and probability maps uses a bilinear inverse-warp implemented with gathers
(static shapes), and the aggregation (mean or max of probabilities over
aligned warps with a coverage mask) runs as one jit program over the K axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry.homography import sample_homography_corners


def warp_image_bilinear(image: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Inverse-warp (B, H, W, C) images by (B, 3, 3) homographies (dst->src
    sampling, cv2.warpPerspective semantics)."""
    b, h, w, c = image.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs + 0.5, ys + 0.5, ones], -1).reshape(-1, 3)  # (N, 3)
    Hinv = jnp.linalg.inv(H)
    src = jnp.einsum("bij,nj->bni", Hinv, pix)
    z = src[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    sx = src[..., 0] / z[..., 0] - 0.5
    sy = src[..., 1] / z[..., 0] - 0.5

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    inside = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)

    flat = image.reshape(b, h * w, c)

    def gather(iy, ix):
        return jnp.take_along_axis(flat, (iy * w + ix)[..., None], axis=1)

    out = (
        gather(y0i, x0i) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0i, x1i) * (wx * (1 - wy))[..., None]
        + gather(y1i, x0i) * ((1 - wx) * wy)[..., None]
        + gather(y1i, x1i) * (wx * wy)[..., None]
    )
    out = out * inside[..., None]
    return out.reshape(b, h, w, c)


def homographic_adaptation(
    apply_prob_fn,
    image: jnp.ndarray,
    num: int = 32,
    aggregation: str = "mean",
    rng: np.random.RandomState | None = None,
    hconf: dict | None = None,
):
    """Aggregate detector probabilities over `num` random warps.

    apply_prob_fn(images (B,H,W,C)) -> prob (B,H,W). Returns the aggregated
    probability map (B, H, W) aligned with the input image.
    """
    rng = rng or np.random.RandomState(0)
    hconf = hconf or {"difficulty": 0.8, "translation": 0.3, "max_angle": 30}
    b, h, w, _ = image.shape

    probs = [apply_prob_fn(image)]
    counts = [jnp.ones((b, h, w))]
    for _ in range(num):
        H, *_ = sample_homography_corners((w, h), (w, h), rng=rng, **hconf)
        Hb = jnp.broadcast_to(jnp.asarray(H, jnp.float32), (b, 3, 3))
        warped = warp_image_bilinear(image, Hb)
        prob_w = apply_prob_fn(warped)
        # warp probability back into the original frame
        prob_back = warp_image_bilinear(prob_w[..., None], jnp.linalg.inv(Hb))[..., 0]
        mask_back = warp_image_bilinear(jnp.ones_like(prob_w)[..., None], jnp.linalg.inv(Hb))[..., 0]
        probs.append(prob_back)
        counts.append(mask_back)

    probs = jnp.stack(probs)
    counts = jnp.stack(counts)
    if aggregation == "max":
        return jnp.max(probs * (counts > 0.5), axis=0)
    return jnp.sum(probs * counts, axis=0) / jnp.maximum(jnp.sum(counts, axis=0), 1e-6)


__all__ = ["homographic_adaptation", "warp_image_bilinear"]
