"""Multi-view triangulation (batched DLT).

New capability beyond the reference (its pipeline stops at two-view eval);
part of the SfM/SLAM layer (SURVEY §7 step 7).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.wrappers import Camera, Pose

_HI = "highest"


def triangulate_dlt(
    rays: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Linear triangulation of one world point from K views.

    rays: (..., K, 2) normalized image coords x/z, y/z per view;
    R, t: (..., K, 3, 3), (..., K, 3) world->cam poses; valid: (..., K).
    Returns (..., 3) world point (least-squares DLT via 3x3 normal equations).

    Each view contributes rows [x * P3 - P1; y * P3 - P2] with P = [R | t].
    """
    x = rays[..., 0:1]
    y = rays[..., 1:2]
    r1, r2, r3 = R[..., 0, :], R[..., 1, :], R[..., 2, :]
    t1, t2, t3 = t[..., 0:1], t[..., 1:2], t[..., 2:3]
    rowA = x * r3 - r1  # (..., K, 3)
    rowB = y * r3 - r2
    cA = x[..., 0] * t3[..., 0] - t1[..., 0]  # (..., K)
    cB = y[..., 0] * t3[..., 0] - t2[..., 0]
    A = jnp.concatenate([rowA, rowB], axis=-2)  # (..., 2K, 3)
    c = -jnp.concatenate([cA, cB], axis=-1)  # (..., 2K)
    w = jnp.concatenate([valid, valid], axis=-1).astype(A.dtype)
    Aw = A * w[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", Aw, A, precision=_HI)
    Atc = jnp.einsum("...ki,...k->...i", Aw, c, precision=_HI)
    # damped solve for degenerate tracks; batched 1-D rhs needs a unit column
    AtA = AtA + 1e-8 * jnp.eye(3)
    return jnp.linalg.solve(AtA, Atc[..., None])[..., 0]


def reprojection_errors(
    X: jnp.ndarray, uv: jnp.ndarray, camera: Camera, R: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Pixel reprojection error of world points X (..., 3) observed at uv
    (..., 2) by cameras with world->cam (R, t)."""
    p_cam = jnp.einsum("...ij,...j->...i", R, X, precision=_HI) + t
    proj, _ = camera.cam2image(p_cam[..., None, :])
    return jnp.linalg.norm(proj[..., 0, :] - uv, axis=-1)


__all__ = ["triangulate_dlt", "reprojection_errors"]
