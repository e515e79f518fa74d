"""Batched `Pose` and `Camera` as registered JAX pytrees.

Counterpart of the reference's TensorWrapper-based wrappers
(gluefactory/geometry/wrappers.py:50-425). Instead of wrapping a flat tensor
and intercepting torch functions, we register plain dataclass-style containers
as pytrees: they flow through jit/vmap/pjit transparently, index/slice like
arrays, and keep static shapes.

Conventions (same as reference):
  - Pose maps points FROM its source frame TO its target frame: p' = R p + t.
  - Camera packs (width, height, fx, fy, cx, cy, [k1, k2]) and uses the COLMAP
    corner convention where appropriate; `cam2image` = project -> distort ->
    denormalize with a validity mask (wrappers.py:388-394).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

# force fp32 matmuls in pose/camera math (TPU bf16 default is too coarse)
_einsum = partial(jnp.einsum, precision="highest")

from .utils import from_homogeneous, skew_symmetric, to_homogeneous


@jax.tree_util.register_pytree_node_class
class Pose:
    """Rigid transform with batched rotation (..., 3, 3) and translation (..., 3)."""

    def __init__(self, R: jnp.ndarray, t: jnp.ndarray):
        self.R = R
        self.t = t

    def tree_flatten(self):
        return (self.R, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # constructors -----------------------------------------------------------
    @classmethod
    def from_Rt(cls, R: jnp.ndarray, t: jnp.ndarray) -> "Pose":
        return cls(jnp.asarray(R), jnp.asarray(t))

    @classmethod
    def from_4x4mat(cls, T: jnp.ndarray) -> "Pose":
        T = jnp.asarray(T)
        return cls(T[..., :3, :3], T[..., :3, 3])

    @classmethod
    def from_aa(cls, aa: jnp.ndarray, t: jnp.ndarray) -> "Pose":
        from .utils import so3exp_map

        return cls(so3exp_map(jnp.asarray(aa)), jnp.asarray(t))

    @classmethod
    def identity(cls, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return cls(R, t)

    # ops --------------------------------------------------------------------
    @property
    def shape(self):
        return self.R.shape[:-2]

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix (..., 4, 4)."""
        bottom = jnp.zeros(self.R.shape[:-2] + (1, 4), dtype=self.R.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def inv(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(Rt, -_einsum("...ij,...j->...i", Rt, self.t))

    def compose(self, other: "Pose") -> "Pose":
        """self @ other: apply `other` first, then `self`."""
        R = jnp.matmul(self.R, other.R, precision="highest")
        t = self.t + _einsum("...ij,...j->...i", self.R, other.t)
        return Pose(R, t)

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def transform(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Transform (..., N, 3) points."""
        return _einsum("...ij,...nj->...ni", self.R, p3d) + self.t[..., None, :]

    def magnitude(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(rotation angle in degrees, translation norm)."""
        trace = jnp.einsum("...ii->...", self.R)
        cos = jnp.clip((trace - 1) / 2, -1.0, 1.0)
        dr = jnp.degrees(jnp.abs(jnp.arccos(cos)))
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt

    def E_matrix(self) -> jnp.ndarray:
        """Essential matrix of the relative pose: E = [t]_x R (epipolar.py:7-12)."""
        return jnp.matmul(skew_symmetric(self.t), self.R, precision="highest")

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.R[idx], self.t[idx])

    def __repr__(self):
        return f"Pose(batch={self.shape}, dtype={self.R.dtype})"


@jax.tree_util.register_pytree_node_class
class Camera:
    """Pinhole(+radial) camera, packed as (..., 6|8): w, h, fx, fy, cx, cy, [k1, k2]."""

    eps = 1e-4

    def __init__(self, data: jnp.ndarray):
        self._data = data

    def tree_flatten(self):
        return (self._data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # constructors -----------------------------------------------------------
    @classmethod
    def from_params(cls, width, height, fx, fy, cx, cy, dist=()) -> "Camera":
        return cls(jnp.asarray([width, height, fx, fy, cx, cy, *dist], dtype=jnp.float32))

    @classmethod
    def from_calibration_matrix(cls, K: jnp.ndarray) -> "Camera":
        K = jnp.asarray(K)
        fx, fy = K[..., 0, 0], K[..., 1, 1]
        cx, cy = K[..., 0, 2], K[..., 1, 2]
        data = jnp.stack([2 * cx, 2 * cy, fx, fy, cx, cy], axis=-1)
        return cls(data)

    @classmethod
    def from_colmap(cls, camera: dict) -> "Camera":
        """COLMAP camera dict -> Camera (wrappers.py:245-267 semantics)."""
        model, params = camera["model"], np.asarray(camera["params"], np.float64)
        if model in ("OPENCV", "PINHOLE", "RADIAL"):
            fx, fy, cx, cy = params[:4]
            dist = params[4:]
        elif model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
            fx = fy = params[0]
            cx, cy = params[1:3]
            dist = params[3:]
            if model == "SIMPLE_RADIAL":
                dist = np.r_[dist, 0.0]
        else:
            raise NotImplementedError(model)
        data = np.r_[camera["width"], camera["height"], fx, fy, cx, cy, dist]
        return cls(jnp.asarray(data, dtype=jnp.float32))

    # accessors --------------------------------------------------------------
    @property
    def size(self) -> jnp.ndarray:
        return self._data[..., :2]

    @property
    def f(self) -> jnp.ndarray:
        return self._data[..., 2:4]

    @property
    def c(self) -> jnp.ndarray:
        return self._data[..., 4:6]

    @property
    def dist(self) -> jnp.ndarray:
        return self._data[..., 6:]

    @property
    def shape(self):
        return self._data.shape[:-1]

    def calibration_matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self._data[..., 0])
        o = jnp.ones_like(z)
        K = jnp.stack(
            [
                self._data[..., 2], z, self._data[..., 4],
                z, self._data[..., 3], self._data[..., 5],
                z, z, o,
            ],
            axis=-1,
        )
        return K.reshape(self._data.shape[:-1] + (3, 3))

    def scale(self, scales) -> "Camera":
        s = jnp.asarray(scales, dtype=self._data.dtype)
        s = jnp.broadcast_to(s, self.size.shape)
        data = jnp.concatenate(
            [self.size * s, self.f * s, self.c * s, self.dist], axis=-1
        )
        return Camera(data)

    def crop(self, left_top, size) -> "Camera":
        left_top = jnp.asarray(left_top, dtype=self._data.dtype)
        size = jnp.broadcast_to(jnp.asarray(size, dtype=self._data.dtype), self.size.shape)
        data = jnp.concatenate([size, self.f, self.c - left_top, self.dist], axis=-1)
        return Camera(data)

    # projection pipeline ----------------------------------------------------
    def in_image(self, p2d: jnp.ndarray) -> jnp.ndarray:
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0) & (p2d <= size - 1), axis=-1)

    def project(self, p3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = p3d[..., -1]
        valid = z > self.eps
        z = jnp.maximum(z, self.eps)
        return p3d[..., :-1] / z[..., None], valid

    def distort(self, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Radial distortion (k1, k2) of normalized coords; identity if no dist."""
        if self.dist.shape[-1] == 0:
            return pts, jnp.ones(pts.shape[:-1], dtype=bool)
        k1 = self.dist[..., 0:1]
        k2 = self.dist[..., 1:2] if self.dist.shape[-1] > 1 else jnp.zeros_like(k1)
        r2 = jnp.sum(pts**2, axis=-1)
        radial = 1.0 + k1[..., None, 0] * r2 + k2[..., None, 0] * r2**2
        return pts * radial[..., None], radial > 0

    def denormalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return p2d * self.f[..., None, :] + self.c[..., None, :]

    def normalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return (p2d - self.c[..., None, :]) / self.f[..., None, :]

    def cam2image(self, p3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p2d, visible = self.project(p3d)
        p2d, dmask = self.distort(p2d)
        p2d = self.denormalize(p2d)
        valid = visible & dmask & self.in_image(p2d)
        return p2d, valid

    def image2cam(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Pixels -> unit-depth 3D rays (ignores distortion like the reference
        training path, wrappers.py:399-405)."""
        return to_homogeneous(self.normalize(p2d))

    def __getitem__(self, idx) -> "Camera":
        return Camera(self._data[idx])

    def __repr__(self):
        return f"Camera(batch={self.shape}, params={self._data.shape[-1]})"


def world_points_to_image(p3d_w, pose: Pose, camera: Camera):
    """Convenience: world -> camera -> image with validity."""
    return camera.cam2image(pose.transform(p3d_w))


__all__ = ["Pose", "Camera", "world_points_to_image", "from_homogeneous", "to_homogeneous"]
