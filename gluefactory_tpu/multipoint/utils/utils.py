"""Multipoint utilities: box NMS and keypoint-map helpers.

Counterpart of reference gluefactory/multipoint/utils/utils.py (box_nms :96,
space_to_depth etc. — space_to_depth lives in losses.py here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_nms(
    prob: jnp.ndarray, size: int = 4, iou: float = 0.1, min_prob: float = 0.015,
    keep_top_k: int = 0,
) -> jnp.ndarray:
    """Greedy box-NMS on a probability map (reference utils.py:96-142).

    TPU adaptation: the reference runs torchvision.ops.nms over dynamic box
    lists; here we use the equivalent iterative max-pool suppression (same
    fixed box size => IoU test reduces to a distance test), which is
    fixed-shape and jit-able.
    """
    from ...models.extractors.superpoint_open import simple_nms

    radius = max(size // 2, 1)
    out = simple_nms(prob[None] if prob.ndim == 2 else prob, radius)
    out = jnp.where(out >= min_prob, out, 0.0)
    if keep_top_k:
        b, h, w = out.shape
        flat = out.reshape(b, -1)
        kth = jax.lax.top_k(flat, keep_top_k)[0][:, -1:]
        out = jnp.where(flat >= jnp.maximum(kth, min_prob), flat, 0.0).reshape(b, h, w)
    return out[0] if prob.ndim == 2 else out


def keypoint_map_from_points(kpts, mask, shape) -> jnp.ndarray:
    """Scatter (B, K, 2) xy keypoints into a binary (B, H, W) map."""
    h, w = shape
    b, k, _ = kpts.shape
    xs = jnp.clip(kpts[..., 0].astype(jnp.int32), 0, w - 1)
    ys = jnp.clip(kpts[..., 1].astype(jnp.int32), 0, h - 1)

    def one(x, y, m):
        flat = jnp.zeros((h * w,), jnp.float32)
        idx = y * w + x
        return flat.at[idx].max(m.astype(jnp.float32)).reshape(h, w)

    return jax.vmap(one)(xs, ys, mask)


__all__ = ["box_nms", "keypoint_map_from_points"]
