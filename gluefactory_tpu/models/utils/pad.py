"""Fixed-shape padding/masking utilities.

On TPU every keypoint set has a static size N with a boolean validity mask —
the discipline the reference only uses in batched-training mode
(force_num_keypoints, gluefactory_nonfree/superpoint.py:304-317 and
models/utils/misc.py:19-70) is mandatory here and threaded end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_to_length(
    x: jnp.ndarray, length: int, axis: int = -2, value: float = 0.0
) -> jnp.ndarray:
    """Pad (or truncate) `x` along `axis` to `length` with constant `value`."""
    axis = axis % x.ndim
    cur = x.shape[axis]
    if cur == length:
        return x
    if cur > length:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, length)
        return x[tuple(sl)]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, length - cur)
    return jnp.pad(x, pads, constant_values=value)


def random_fill_keypoints(
    key: jax.Array,
    kpts: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    image_size: jnp.ndarray,
):
    """Replace padded keypoints by uniform random in-image locations with score 0.

    Equivalent to the reference's pad_random strategy
    (gluefactory_nonfree/superpoint.py:306-312): random fills keep padded
    tokens from collapsing onto a single location, which would distort
    attention statistics; the mask still excludes them everywhere.
    """
    b, n, _ = kpts.shape
    rand = jax.random.uniform(key, (b, n, 2)) * image_size[:, None, :]
    kpts = jnp.where(mask[..., None], kpts, rand)
    scores = jnp.where(mask, scores, 0.0)
    return kpts, scores


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-8):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / (jnp.sum(m, axis=axis) + eps)


__all__ = ["pad_to_length", "random_fill_keypoints", "masked_mean"]
