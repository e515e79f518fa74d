from .base_estimator import BaseEstimator, load_estimator  # noqa: F401
from .ransac import (  # noqa: F401
    RansacResult,
    RelPoseResult,
    ransac_homography,
    ransac_relative_pose,
)
