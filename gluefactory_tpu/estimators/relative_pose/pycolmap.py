"""Alias: `estimator: pycolmap` -> the TPU-native batched E RANSAC
(reference robust_estimators/relative_pose/pycolmap.py is COLMAP C++
two_view_geometry_estimation)."""

from .jax_ransac import JaxRansacRelativePose

__main_estimator__ = JaxRansacRelativePose
