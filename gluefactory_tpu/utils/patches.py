"""Patch extraction around keypoints.

Counterpart of reference gluefactory/utils/patches.py:4-50: gather square
patches centered on keypoints from a batched image/feature map, and build
dense heatmaps from sparse keypoint scores. Batched JAX, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(
    tensor: jnp.ndarray, kpts: jnp.ndarray, ps: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract ps x ps patches centered at integer keypoint locations.

    tensor: (B, H, W, C); kpts: (B, N, 2) xy. Returns (patches (B, N, ps, ps, C),
    valid (B, N)) where valid marks patches fully inside the image.
    """
    b, h, w, c = tensor.shape
    n = kpts.shape[1]
    half = ps // 2
    cx = jnp.round(kpts[..., 0]).astype(jnp.int32)
    cy = jnp.round(kpts[..., 1]).astype(jnp.int32)
    valid = (cx >= half) & (cy >= half) & (cx < w - half) & (cy < h - half)
    cx = jnp.clip(cx, half, w - half - 1)
    cy = jnp.clip(cy, half, h - half - 1)

    dy, dx = jnp.meshgrid(
        jnp.arange(-half, ps - half), jnp.arange(-half, ps - half), indexing="ij"
    )
    ys = cy[..., None, None] + dy  # (B, N, ps, ps)
    xs = cx[..., None, None] + dx
    flat = tensor.reshape(b, h * w, c)
    idx = (ys * w + xs).reshape(b, n * ps * ps)
    patches = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return patches.reshape(b, n, ps, ps, c), valid


def build_heatmap(
    kpts: jnp.ndarray, scores: jnp.ndarray, shape: tuple[int, int]
) -> jnp.ndarray:
    """Scatter keypoint scores into a dense (B, H, W) heatmap (max-reduce on
    collisions)."""
    h, w = shape
    b, n, _ = kpts.shape
    xs = jnp.clip(jnp.round(kpts[..., 0]).astype(jnp.int32), 0, w - 1)
    ys = jnp.clip(jnp.round(kpts[..., 1]).astype(jnp.int32), 0, h - 1)
    idx = ys * w + xs
    import jax

    def one(i, s):
        return jnp.zeros((h * w,), scores.dtype).at[i].max(s).reshape(h, w)

    return jax.vmap(one)(idx, scores)


__all__ = ["extract_patches", "build_heatmap"]
