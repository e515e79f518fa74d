"""Alias: `estimator: homography_est` -> the hybrid point+line RANSAC.

The reference's GlueStick eval uses the C++ `homography_est` library
(robust_estimators/homography/homography_est.py); the same name here
resolves to the batched point+line homography RANSAC.
"""

from .hybrid_pl import HybridPointLineHomography

__main_estimator__ = HybridPointLineHomography
