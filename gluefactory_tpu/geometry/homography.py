"""Homography sampling, solving, warping and evaluation.

Counterpart of reference gluefactory/geometry/homography.py:40-342. Host-side
random sampling stays NumPy (it runs in the data pipeline); everything touched
by training/eval is batched JAX.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from functools import partial

# force fp32 matmuls (TPU defaults to bf16 passes; fatal for DLT/warping)
_einsum = partial(jnp.einsum, precision="highest")

from .utils import from_homogeneous, to_homogeneous

# ---------------------------------------------------------------------------
# host-side random homography sampling (data pipeline; NumPy by design)
# ---------------------------------------------------------------------------


def _center_patch(shape, patch_shape=None):
    width, height = shape
    pw, ph = patch_shape if patch_shape is not None else shape
    l, b = (width - pw) / 2.0, (height - ph) / 2.0
    r, t = (width + pw) / 2.0, (height + ph) / 2.0
    return np.array([[l, b], [l, t], [r, t], [r, b]])


def _is_convex(patch: np.ndarray, min_convexity: float = 0.05) -> bool:
    n = patch.shape[0]
    for i in range(n):
        x1, y1 = patch[(i - 1) % n]
        x2, y2 = patch[i]
        x3, y3 = patch[(i + 1) % n]
        if (x2 - x1) * (y3 - y2) - (x3 - x2) * (y2 - y1) > -min_convexity:
            return False
    return True


def sample_homography_corners(
    shape,
    patch_shape,
    difficulty: float = 1.0,
    translation: float = 0.4,
    n_angles: int = 10,
    max_angle: float = 90.0,
    min_convexity: float = 0.05,
    rng=np.random,
):
    """Sample a random convex warp of the image borders and its homography.

    Same sampling distribution as the reference (homography.py:40-107): random
    convex quadrilateral within the image, optional rotation among linearly
    spaced angles (first in-bounds one wins), scaled random translation; the
    output homography maps image corners to the patch.
    Returns (H, corners, warped_corners, patch_shape).
    """
    max_angle_rad = max_angle / 180.0 * math.pi
    width, height = shape
    pwidth, pheight = width * (1 - difficulty), height * (1 - difficulty)
    min_pts1 = _center_patch(shape, (pwidth, pheight))
    full = _center_patch(shape)
    pts2 = _center_patch(patch_shape)
    scale = min_pts1 - full
    while True:
        offsets = rng.uniform(0.0, 1.0, size=(4, 2)) * scale
        pts1 = full + offsets
        if _is_convex(pts1 / np.array(shape), min_convexity):
            break

    # re-center
    pts1 = pts1 - pts1.mean(axis=0, keepdims=True) + min_pts1.mean(axis=0, keepdims=True)

    if n_angles > 0 and difficulty > 0:
        angles = np.linspace(
            -max_angle_rad * difficulty, max_angle_rad * difficulty, n_angles
        )
        rng.shuffle(angles)
        center = pts1.mean(axis=0, keepdims=True)
        for ang in angles:
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[c, -s], [s, c]])
            cand = (pts1 - center) @ rot + center
            norm = cand / np.array(shape)
            if np.all((norm >= 0.0) & (norm < 1.0)):
                pts1 = cand
                break

    if translation > 0:
        min_trans = -pts1.min(axis=0)
        max_trans = np.array(shape) - pts1.max(axis=0)
        trans = rng.uniform(min_trans, max_trans)[None]
        pts1 = pts1 + trans * translation * difficulty

    H = solve_homography_4pt_np(pts1, pts2)
    warped = warp_points_np(full, H)
    return H, full, warped, patch_shape


def solve_homography_4pt_np(pts1: np.ndarray, pts2: np.ndarray) -> np.ndarray:
    """Exact homography from 4 correspondences via an 8x8 linear solve
    (reference compute_homography, homography.py:110-128)."""
    A, b = [], []
    for (x, y), (u, v) in zip(pts1, pts2):
        A.append([x, y, 1, 0, 0, 0, -x * u, -y * u])
        A.append([0, 0, 0, x, y, 1, -x * v, -y * v])
        b.extend([u, v])
    h = np.linalg.solve(np.asarray(A, np.float64), np.asarray(b, np.float64))
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def warp_points_np(points: np.ndarray, H: np.ndarray, inverse: bool = False) -> np.ndarray:
    M = np.linalg.inv(H) if inverse else H
    p = np.concatenate([points, np.ones_like(points[..., :1])], axis=-1)
    w = p @ M.T
    z = w[..., 2:]
    z = np.where(np.abs(z) < 1e-8, 1e-8, z)
    return w[..., :2] / z


# ---------------------------------------------------------------------------
# JAX: batched warping / solving / errors
# ---------------------------------------------------------------------------


def warp_points(points: jnp.ndarray, H: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Warp (..., N, 2) points by (..., 3, 3) homographies.

    `inverse=True` multiplies by H^-1 (reference warp_points_torch,
    homography.py:161-180, whose default is inverse=True; we default to the
    forward map and pass inverse explicitly at call sites).
    """
    M = jnp.linalg.inv(H) if inverse else H
    p = to_homogeneous(points)
    w = _einsum("...ij,...nj->...ni", M, p)
    return from_homogeneous(w, eps=1e-5)


def solve_homography_dlt(
    pts0: jnp.ndarray, pts1: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(Weighted) normalized DLT: (..., N, 2) x2 -> (..., 3, 3).

    Hartley-normalized SVD solution of A h = 0; the TPU-native replacement for
    kornia.geometry.find_homography_dlt used by the reference eval
    (eval/utils.py:188) and the minimal solver inside our batched RANSAC.
    Fully vmap/batched: all leading dims are preserved.
    """
    dtype = jnp.promote_types(pts0.dtype, jnp.float32)
    pts0 = pts0.astype(dtype)
    pts1 = pts1.astype(dtype)
    n = pts0.shape[-2]
    if weights is None:
        weights = jnp.ones(pts0.shape[:-1], dtype=dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-8)

    # Hartley normalization (weighted): zero mean, mean distance sqrt(2)
    def normalize(p):
        mean = jnp.sum(p * w, axis=-2, keepdims=True) / wsum
        d = jnp.linalg.norm(p - mean, axis=-1, keepdims=True)
        scale = jnp.sum(d * w, axis=-2, keepdims=True) / wsum
        scale = jnp.maximum(scale, 1e-8)
        s = math.sqrt(2.0) / scale[..., 0, :]
        T = jnp.zeros(p.shape[:-2] + (3, 3), dtype=dtype)
        T = T.at[..., 0, 0].set(s[..., 0])
        T = T.at[..., 1, 1].set(s[..., 0])
        T = T.at[..., 2, 2].set(1.0)
        T = T.at[..., 0, 2].set(-s[..., 0] * mean[..., 0, 0])
        T = T.at[..., 1, 2].set(-s[..., 0] * mean[..., 0, 1])
        return (p - mean) * s[..., None, :], T

    p0n, T0 = normalize(pts0)
    p1n, T1 = normalize(pts1)

    x, y = p0n[..., 0], p0n[..., 1]
    u, v = p1n[..., 0], p1n[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ax = jnp.stack([x, y, one, zero, zero, zero, -x * u, -y * u, -u], axis=-1)
    ay = jnp.stack([zero, zero, zero, x, y, one, -x * v, -y * v, -v], axis=-1)
    A = jnp.concatenate([ax, ay], axis=-2)  # (..., 2N, 9)
    wa = jnp.concatenate([weights, weights], axis=-1)[..., None]
    A = A * wa

    # null vector via smallest eigenvector of A^T A (9x9): batched cyclic
    # Jacobi (ops/linalg.py) - much faster than XLA's generic eigh for
    # thousands of tiny problems on TPU
    from ..ops.linalg import smallest_eigenvector

    AtA = jnp.matmul(jnp.swapaxes(A, -1, -2), A, precision="highest")
    h = smallest_eigenvector(AtA)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.matmul(jnp.matmul(jnp.linalg.inv(T1), Hn, precision="highest"), T0, precision="highest")
    H = H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-8, 1.0, H[..., 2:3, 2:3])
    return H


def sym_homography_error(kpts0, kpts1, H) -> jnp.ndarray:
    """Mean of forward/backward transfer error per correspondence
    (reference homography.py:314-323)."""
    d01 = jnp.linalg.norm(warp_points(kpts0, H) - kpts1, axis=-1)
    d10 = jnp.linalg.norm(warp_points(kpts1, H, inverse=True) - kpts0, axis=-1)
    return (d01 + d10) / 2.0


def sym_homography_error_all(kpts0, kpts1, H) -> jnp.ndarray:
    """All-pairs symmetric transfer error matrix (..., M, N)
    (reference homography.py:326-333)."""
    kp0_1 = warp_points(kpts0, H)
    kp1_0 = warp_points(kpts1, H, inverse=True)
    d0 = jnp.linalg.norm(kp0_1[..., :, None, :] - kpts1[..., None, :, :], axis=-1)
    d1 = jnp.linalg.norm(kpts0[..., :, None, :] - kp1_0[..., None, :, :], axis=-1)
    return (d0 + d1) / 2.0


def homography_corner_error(H, H_gt, image_size) -> jnp.ndarray:
    """Mean displacement of the four image corners under H vs H_gt
    (reference homography.py:336-342)."""
    W = image_size[..., 0]
    Hh = image_size[..., 1]
    zeros = jnp.zeros_like(W)
    corners = jnp.stack(
        [
            jnp.stack([zeros, zeros], -1),
            jnp.stack([W, zeros], -1),
            jnp.stack([W, Hh], -1),
            jnp.stack([zeros, Hh], -1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    c_gt = warp_points(corners, H_gt)
    c = warp_points(corners, H)
    return jnp.linalg.norm(c - c_gt, axis=-1).mean(-1)


def homography_from_corner_correspondence(
    corners0: Tuple[float, float], H: np.ndarray
) -> np.ndarray:
    """Compose warp metadata into a pair homography (numpy helper)."""
    return H


__all__ = [
    "sample_homography_corners",
    "solve_homography_4pt_np",
    "solve_homography_dlt",
    "warp_points",
    "warp_points_np",
    "sym_homography_error",
    "sym_homography_error_all",
    "homography_corner_error",
]
