"""Epipolar geometry in batched JAX.

Counterpart of reference gluefactory/geometry/epipolar.py:7-155.
"""

from __future__ import annotations

import jax.numpy as jnp

# 3x3 geometry is precision-critical: TPU matmuls default to bf16 passes,
# which visibly degrades epipolar distances and pose errors. Force fp32.
from functools import partial
_einsum = partial(jnp.einsum, precision="highest")
def _mm(*ms):
    out = ms[0]
    for m in ms[1:]:
        out = jnp.matmul(out, m, precision="highest")
    return out

from .utils import angle_error_mat, angle_error_vec, skew_symmetric, to_homogeneous
from .wrappers import Camera, Pose


def T_to_E(T: Pose) -> jnp.ndarray:
    """Relative pose -> essential matrix: E = [t]_x R (epipolar.py:7-12)."""
    return _mm(skew_symmetric(T.t), T.R)


def E_to_F(cam0: Camera, cam1: Camera, E: jnp.ndarray) -> jnp.ndarray:
    K0 = cam0.calibration_matrix()
    K1 = cam1.calibration_matrix()
    return _mm(jnp.swapaxes(jnp.linalg.inv(K1), -1, -2), E, jnp.linalg.inv(K0))


def T_to_F(cam0: Camera, cam1: Camera, T_0to1: Pose) -> jnp.ndarray:
    return E_to_F(cam0, cam1, T_to_E(T_0to1))


def F_to_E(cam0: Camera, cam1: Camera, F: jnp.ndarray) -> jnp.ndarray:
    K0 = cam0.calibration_matrix()
    K1 = cam1.calibration_matrix()
    return _mm(jnp.swapaxes(K1, -1, -2), F, K0)


def sym_epipolar_distance(p0, p1, E, squared: bool = True) -> jnp.ndarray:
    """Symmetric epipolar distance of paired points (..., N, 2|3) -> (..., N)
    (epipolar.py:32-57)."""
    if p0.shape[-1] != 3:
        p0 = to_homogeneous(p0)
    if p1.shape[-1] != 3:
        p1 = to_homogeneous(p1)
    p1_E_p0 = _einsum("...ni,...ij,...nj->...n", p1, E, p0)
    E_p0 = _einsum("...ij,...nj->...ni", E, p0)
    Et_p1 = _einsum("...ij,...ni->...nj", E, p1)
    d0 = jnp.maximum(E_p0[..., 0] ** 2 + E_p0[..., 1] ** 2, 1e-6)
    d1 = jnp.maximum(Et_p1[..., 0] ** 2 + Et_p1[..., 1] ** 2, 1e-6)
    if squared:
        return p1_E_p0**2 * (1 / d0 + 1 / d1)
    return jnp.abs(p1_E_p0) * (jax_rsqrt(d0) + jax_rsqrt(d1)) / 2


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def sym_epipolar_distance_all(p0, p1, E, eps: float = 1e-15) -> jnp.ndarray:
    """All-pairs symmetric epipolar distance (..., N0, N1) where entry [n, m]
    relates p0[n] and p1[m] (epipolar.py:60-72: output indexed '...nm')."""
    if p0.shape[-1] != 3:
        p0 = to_homogeneous(p0)
    if p1.shape[-1] != 3:
        p1 = to_homogeneous(p1)
    p1_E_p0 = jnp.abs(_einsum("...mi,...ij,...nj->...nm", p1, E, p0))
    E_p0 = _einsum("...ij,...nj->...ni", E, p0)
    Et_p1 = _einsum("...ij,...mi->...mj", E, p1)
    d0 = p1_E_p0 / jnp.sqrt(E_p0[..., None, 0] ** 2 + E_p0[..., None, 1] ** 2 + eps)
    d1 = p1_E_p0 / jnp.sqrt(
        Et_p1[..., None, :, 0] ** 2 + Et_p1[..., None, :, 1] ** 2 + eps
    )
    return (d0 + d1) / 2


def generalized_epi_dist(
    kpts0, kpts1, cam0: Camera, cam1: Camera, T_0to1: Pose,
    all_pairs: bool = True, essential: bool = True,
) -> jnp.ndarray:
    """Epipolar distance in normalized (essential) or pixel (fundamental) units
    (epipolar.py:75-94)."""
    if essential:
        E = T_to_E(T_0to1)
        p0 = cam0.image2cam(kpts0)
        p1 = cam1.image2cam(kpts1)
        if all_pairs:
            return sym_epipolar_distance_all(p0, p1, E)
        return sym_epipolar_distance(p0, p1, E, squared=False)
    F = T_to_F(cam0, cam1, T_0to1)
    if all_pairs:
        return sym_epipolar_distance_all(kpts0, kpts1, F)
    return sym_epipolar_distance(kpts0, kpts1, F, squared=False)


def decompose_essential_matrix(E: jnp.ndarray):
    """E -> two candidate rotations and a translation direction
    (epipolar.py:97-122)."""
    from ..ops.linalg import svd3x3

    U, _, Vt = svd3x3(E)
    # keep proper rotations
    U = jnp.where(
        (jnp.linalg.det(U) < 0)[..., None, None],
        U * jnp.array([1.0, 1.0, -1.0]),
        U,
    )
    Vt = jnp.where(
        (jnp.linalg.det(Vt) < 0)[..., None, None],
        Vt * jnp.array([[1.0], [1.0], [-1.0]]),
        Vt,
    )
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = _mm(U, W, Vt)
    R2 = _mm(U, W.T, Vt)
    t = U[..., -1]
    return R1, R2, t


def relative_pose_error(T_0to1: Pose, R, t, ignore_gt_t_thr: float = 0.0):
    """Angular errors (deg) of an estimated relative pose vs GT
    (epipolar.py:139-155). Returns (t_err, r_err)."""
    R_gt, t_gt = T_0to1.R, T_0to1.t
    t_err = angle_error_vec(t, t_gt)
    t_err = jnp.minimum(t_err, 180.0 - t_err)  # E-decomposition sign ambiguity
    if ignore_gt_t_thr > 0:
        t_err = jnp.where(jnp.linalg.norm(t_gt, axis=-1) < ignore_gt_t_thr, 0.0, t_err)
    r_err = angle_error_mat(R, R_gt)
    return t_err, r_err


__all__ = [
    "T_to_E", "T_to_F", "E_to_F", "F_to_E",
    "sym_epipolar_distance", "sym_epipolar_distance_all", "generalized_epi_dist",
    "decompose_essential_matrix", "relative_pose_error",
]
