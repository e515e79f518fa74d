"""TPU-native relative-pose estimator (counterpart of the reference PoseLib /
OpenCV / pycolmap backends, robust_estimators/relative_pose/*.py).

Data: m_kpts0/m_kpts1 (N, 2) matched PIXEL keypoints, camera0/camera1
(geometry.Camera), optional match_mask. ransac_th is in PIXELS; it is
converted to normalized units with the mean focal length like the reference
opencv backend (relative_pose/opencv.py:30-43).
Returns: success, M_0to1 (Pose), inliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator
from ..ransac import ransac_relative_pose_jit


class JaxRansacRelativePose(BaseEstimator):
    default_conf = {
        "name": "jax_ransac",
        "ransac_th": 2.0,
        "options": {"num_hypotheses": 8192, "refine_iters": 4, "seed": 0,
                    "guided_rounds": 1},
    }
    required_data_keys = ["m_kpts0", "m_kpts1", "camera0", "camera1"]

    def _forward(self, data):
        kpts0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        kpts1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        cam0, cam1 = data["camera0"], data["camera1"]
        valid = data.get("match_mask")
        if valid is None:
            valid = jnp.ones(kpts0.shape[0], bool)
        key = data.get("rng", jax.random.PRNGKey(self.conf.options.seed))

        n = kpts0.shape[0]
        from ..homography.jax_ransac import pad_to_bucket

        kpts0, kpts1, valid = pad_to_bucket(kpts0, kpts1, valid)
        p0n = cam0.normalize(kpts0[None])[0]
        p1n = cam1.normalize(kpts1[None])[0]
        f_mean = (jnp.mean(cam0.f) + jnp.mean(cam1.f)) / 2.0
        th_norm = float(self.conf.ransac_th) / f_mean

        result = ransac_relative_pose_jit(
            p0n,
            p1n,
            valid,
            key,
            th=th_norm,
            num_hypotheses=int(self.conf.options.num_hypotheses),
            refine_iters=int(self.conf.options.refine_iters),
            guided_rounds=int(self.conf.options.get("guided_rounds", 1)),
        )
        t = result.t / jnp.maximum(jnp.linalg.norm(result.t), 1e-9)
        return {
            "success": result.success,
            "M_0to1": Pose.from_Rt(result.R, t),
            "inliers": result.inliers[:n],
        }


__main_estimator__ = JaxRansacRelativePose
