"""Alias: `estimator: poselib` -> the TPU-native batched RANSAC.

The reference's recommended backend is the PoseLib C++ library
(robust_estimators/homography/poselib.py). Here the same estimator name
resolves to the on-device batched DLT RANSAC so reference configs work
unchanged (README tables validated against PoseLib-level AUC targets).
"""

from .jax_ransac import JaxRansacHomography

__main_estimator__ = JaxRansacHomography
