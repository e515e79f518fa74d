"""Basic geometric primitives in pure JAX.

Counterpart of reference gluefactory/geometry/utils.py:5-167 (homogeneous
coordinates, skew-symmetric matrices, SO(3) exponential, radial distortion),
re-designed as batched, vmap-friendly jnp functions with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

_HI = "highest"


def to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last dimension: (..., D) -> (..., D+1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Normalize by the last coordinate: (..., D+1) -> (..., D).

    The denominator is sign-preservingly clamped away from zero so points on
    the plane at infinity stay finite (matches reference warp semantics,
    geometry/homography.py:155).
    """
    z = points[..., -1:]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    return points[..., :-1] / z


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]_x of a (..., 3) vector."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            z, -v[..., 2], v[..., 1],
            v[..., 2], z, -v[..., 0],
            -v[..., 1], v[..., 0], z,
        ],
        axis=-1,
    ).reshape(v.shape[:-1] + (3, 3))


def so3exp_map(w: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """SO(3) exponential map: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Rodrigues' formula with a Taylor fallback near theta=0 (reference
    geometry/utils.py:22-41 semantics).
    """
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta[..., 0] < eps
    safe_theta = jnp.where(theta < eps, 1.0, theta)
    W = skew_symmetric(w / safe_theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    th = theta[..., None]
    sin, cos = jnp.sin(th), jnp.cos(th)
    R = eye + sin * W + (1.0 - cos) * jnp.matmul(W, W, precision=_HI)
    # first-order approximation: I + [w]_x
    R_small = eye + skew_symmetric(w)
    return jnp.where(small[..., None, None], R_small, R)


def angle_error_mat(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (degrees) between rotation matrices (..., 3, 3)."""
    cos = (jnp.einsum("...ii->...", jnp.matmul(jnp.swapaxes(R1, -1, -2), R2, precision=_HI)) - 1) / 2
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.abs(jnp.arccos(cos)))


def angle_error_vec(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Angle (degrees) between two (..., D) vectors."""
    n = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    cos = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(n, eps)
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
