"""Alias: `estimator: poselib` -> the TPU-native batched E RANSAC
(reference robust_estimators/relative_pose/poselib.py is PoseLib C++)."""

from .jax_ransac import JaxRansacRelativePose

__main_estimator__ = JaxRansacRelativePose
