"""TPU-native homography estimator (counterpart of the reference PoseLib /
OpenCV homography backends, robust_estimators/homography/{poselib,opencv}.py).

Data: m_kpts0/m_kpts1 (N, 2) matched keypoints, optional match_mask (N,).
Returns: success, M_0to1 (3, 3) homography, inliers (N,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base_estimator import BaseEstimator
from ..ransac import ransac_homography_jit


class JaxRansacHomography(BaseEstimator):
    default_conf = {
        "name": "jax_ransac",
        "ransac_th": 3.0,
        "options": {"num_hypotheses": 1024, "refine_iters": 3, "seed": 0},
    }
    required_data_keys = ["m_kpts0", "m_kpts1"]

    def _forward(self, data):
        kpts0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        kpts1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("match_mask")
        if valid is None:
            valid = jnp.ones(kpts0.shape[0], bool)
        n = kpts0.shape[0]
        kpts0, kpts1, valid = pad_to_bucket(kpts0, kpts1, valid)
        key = data.get("rng", jax.random.PRNGKey(self.conf.options.seed))
        result = ransac_homography_jit(
            kpts0,
            kpts1,
            valid,
            key,
            th=jnp.float32(self.conf.ransac_th),
            num_hypotheses=int(self.conf.options.num_hypotheses),
            refine_iters=int(self.conf.options.refine_iters),
        )
        return {
            "success": result.success,
            "M_0to1": result.model,
            "inliers": result.inliers[:n],
        }


def pad_to_bucket(kpts0, kpts1, valid, bucket: int = 256):
    """Pad match count to a multiple of `bucket` so repeated estimator calls
    with varying match counts reuse one compiled program."""
    n = kpts0.shape[0]
    n_pad = -(-max(n, 1) // bucket) * bucket
    if n_pad == n:
        return kpts0, kpts1, valid
    pad = n_pad - n
    kpts0 = jnp.pad(kpts0, ((0, pad), (0, 0)))
    kpts1 = jnp.pad(kpts1, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    return kpts0, kpts1, valid


__main_estimator__ = JaxRansacHomography
