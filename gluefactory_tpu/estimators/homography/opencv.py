"""OpenCV homography estimator (host-side, eval-only cross-check).

Counterpart of reference robust_estimators/homography/opencv.py:7-53. Kept as
a validation baseline for the TPU-native jax_ransac estimator; not used on the
training path.
"""

from __future__ import annotations

import cv2
import numpy as np

from ..base_estimator import BaseEstimator


class OpenCVHomography(BaseEstimator):
    default_conf = {
        "name": "opencv",
        "ransac_th": 3.0,
        "options": {"method": "ransac", "max_iters": 3000, "confidence": 0.995},
    }
    required_data_keys = ["m_kpts0", "m_kpts1"]

    _methods = {
        "ransac": cv2.RANSAC,
        "lmeds": cv2.LMEDS,
        "rho": cv2.RHO,
        "usac": cv2.USAC_DEFAULT,
        "usac_fast": cv2.USAC_FAST,
        "usac_accurate": cv2.USAC_ACCURATE,
        "usac_prosac": cv2.USAC_PROSAC,
        "usac_magsac": cv2.USAC_MAGSAC,
    }

    def _forward(self, data):
        pts0 = np.asarray(data["m_kpts0"], np.float32)
        pts1 = np.asarray(data["m_kpts1"], np.float32)
        mask = data.get("match_mask")
        if mask is not None:
            mask = np.asarray(mask, bool)
            pts0, pts1 = pts0[mask], pts1[mask]
        if len(pts0) < 4:
            return {"success": False, "M_0to1": np.eye(3), "inliers": np.zeros(0, bool)}
        method = self._methods[self.conf.options.method]
        H, inl = cv2.findHomography(
            pts0,
            pts1,
            method=method,
            ransacReprojThreshold=float(self.conf.ransac_th),
            maxIters=int(self.conf.options.max_iters),
            confidence=float(self.conf.options.confidence),
        )
        success = H is not None
        if not success:
            H = np.eye(3)
            inl = np.zeros(len(pts0), bool)
        return {
            "success": success,
            "M_0to1": H.astype(np.float32),
            "inliers": np.asarray(inl, bool).reshape(-1),
        }


__main_estimator__ = OpenCVHomography
