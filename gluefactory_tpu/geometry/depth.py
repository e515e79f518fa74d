"""Depth sampling and two-view reprojection in batched JAX.

Counterpart of reference gluefactory/geometry/depth.py:8-88. Instead of
torch grid_sample with NaN propagation, we use an explicit bilinear gather
with validity masks — NaNs are never materialized, which keeps the path safe
under jit and bf16.
"""

from __future__ import annotations

import jax.numpy as jnp

from .wrappers import Camera, Pose


def _gather_2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[..., iy, ix] with clamped indices. img: (..., H, W); iy/ix: (..., N)."""
    H, W = img.shape[-2:]
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    flat = img.reshape(img.shape[:-2] + (H * W,))
    idx = iy * W + ix
    return jnp.take_along_axis(flat, idx, axis=-1)


def sample_depth(pts: jnp.ndarray, depth: jnp.ndarray):
    """Bilinearly sample a depth map at keypoint locations.

    Args:
        pts: (..., N, 2) xy pixel coordinates.
        depth: (..., H, W) depth map; <=0 means invalid.
    Returns:
        (depth_at_pts (..., N), valid (..., N) bool).

    Semantics match the reference (depth.py:20-25 + grid_sample align_corners
    =False): a sample is valid only if all four bilinear neighbors carry valid
    (positive) depth and the point is inside the image.
    """
    H, W = depth.shape[-2:]
    x = pts[..., 0] - 0.5  # align_corners=False pixel-center convention
    y = pts[..., 1] - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)

    d00 = _gather_2d(depth, y0, x0)
    d01 = _gather_2d(depth, y0, x1)
    d10 = _gather_2d(depth, y1, x0)
    d11 = _gather_2d(depth, y1, x1)

    interp = (
        d00 * (1 - wx) * (1 - wy)
        + d01 * wx * (1 - wy)
        + d10 * (1 - wx) * wy
        + d11 * wx * wy
    )
    inside = (x0 >= 0) & (y0 >= 0) & (x1 <= W - 1) & (y1 <= H - 1)
    valid = inside & (d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0) & (interp > 0)
    return jnp.where(valid, interp, 0.0), valid


def project(
    kpi: jnp.ndarray,
    di: jnp.ndarray,
    depthj: jnp.ndarray | None,
    camera_i: Camera,
    camera_j: Camera,
    T_itoj: Pose,
    validi: jnp.ndarray,
    ccth: float | None = None,
):
    """Reproject keypoints of view i into view j using their depths.

    Mirrors reference depth.py:37-68 including the optional cycle-consistency
    check: reproject back via the depth of view j and require the round trip
    to land within sqrt(ccth) pixels.
    Returns (kpi_in_j (..., N, 2), visible (..., N) bool).
    """
    kpi_3d_i = camera_i.image2cam(kpi) * di[..., None]
    kpi_3d_j = T_itoj.transform(kpi_3d_i)
    kpi_j, validj = camera_j.cam2image(kpi_3d_j)
    visible = validi & validj
    if depthj is None or ccth is None:
        return kpi_j, visible
    dj, valid_dj = sample_depth(kpi_j, depthj)
    kpi_j_3d_j = camera_j.image2cam(kpi_j) * dj[..., None]
    kpi_j_i, validj_i = camera_i.cam2image(T_itoj.inv().transform(kpi_j_3d_j))
    consistent = jnp.sum((kpi - kpi_j_i) ** 2, axis=-1) < ccth
    return kpi_j, visible & consistent & validj_i & valid_dj


def dense_warp_consistency(
    depthi: jnp.ndarray,
    depthj: jnp.ndarray,
    T_itoj: Pose,
    camerai: Camera,
    cameraj: Camera,
    **kwargs,
):
    """Warp every pixel of view i into view j (depth.py:71-88)."""
    H, W = depthi.shape[-2:]
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=depthi.dtype), jnp.arange(W, dtype=depthi.dtype),
        indexing="ij",
    )
    kpi = jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(1, H * W, 2)
    kpi = jnp.broadcast_to(kpi, depthi.shape[:-2] + (H * W, 2))
    di = depthi.reshape(depthi.shape[:-2] + (H * W,))
    validi = di > 0
    kpir, validir = project(kpi, di, depthj, camerai, cameraj, T_itoj, validi, **kwargs)
    return (
        kpir.reshape(depthi.shape[:-2] + (H, W, 2)),
        validir.reshape(depthi.shape[:-2] + (H, W)),
    )


__all__ = ["sample_depth", "project", "dense_warp_consistency"]
