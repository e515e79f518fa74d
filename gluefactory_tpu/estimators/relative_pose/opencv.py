"""OpenCV relative-pose estimator (host-side, eval-only cross-check).

Counterpart of reference robust_estimators/relative_pose/opencv.py:10-64:
essential-matrix RANSAC on normalized coordinates with the pixel threshold
scaled by the mean focal length, then recoverPose.
"""

from __future__ import annotations

import cv2
import numpy as np

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator


class OpenCVRelativePose(BaseEstimator):
    default_conf = {
        "name": "opencv",
        "ransac_th": 0.5,
        "options": {"confidence": 0.99999},
    }
    required_data_keys = ["m_kpts0", "m_kpts1", "camera0", "camera1"]

    def _forward(self, data):
        pts0 = np.asarray(data["m_kpts0"], np.float64)
        pts1 = np.asarray(data["m_kpts1"], np.float64)
        cam0, cam1 = data["camera0"], data["camera1"]
        mask = data.get("match_mask")
        if mask is not None:
            m = np.asarray(mask, bool)
            pts0, pts1 = pts0[m], pts1[m]
        if len(pts0) < 5:
            return {"success": False, "M_0to1": None, "inliers": np.zeros(0, bool)}

        f0 = np.asarray(cam0.f)
        f1 = np.asarray(cam1.f)
        p0n = (pts0 - np.asarray(cam0.c)) / f0
        p1n = (pts1 - np.asarray(cam1.c)) / f1
        th_norm = float(self.conf.ransac_th) / ((f0.mean() + f1.mean()) / 2)

        E, inl = cv2.findEssentialMat(
            p0n,
            p1n,
            np.eye(3),
            threshold=th_norm,
            prob=float(self.conf.options.confidence),
            method=cv2.RANSAC,
        )
        if E is None:
            return {"success": False, "M_0to1": None, "inliers": np.zeros(len(pts0), bool)}
        best = None
        for Ei in np.split(E, len(E) / 3):
            n, R, t, inl_i = cv2.recoverPose(Ei, p0n, p1n, np.eye(3), 1e9, mask=inl.copy())
            if best is None or n > best[0]:
                best = (n, R, t, inl_i)
        _, R, t, inl = best
        return {
            "success": True,
            "M_0to1": Pose.from_Rt(R.astype(np.float32), t[:, 0].astype(np.float32)),
            "inliers": np.asarray(inl, bool).reshape(-1),
        }


__main_estimator__ = OpenCVRelativePose
