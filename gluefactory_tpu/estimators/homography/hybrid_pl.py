"""Hybrid point+line homography estimator (Hest counterpart).

Counterpart of reference robust_estimators/homography/homography_est.py:14-74
(the C++ `homography_est` ransac_point_line_homography used by the GlueStick
HPatches eval). Data: m_kpts0/1, optional m_lines0/1 (Lx2x2 endpoint
segments), optional masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base_estimator import BaseEstimator
from ..ransac import ransac_homography_point_line
from .jax_ransac import pad_to_bucket


class HybridPointLineHomography(BaseEstimator):
    default_conf = {
        "name": "hybrid_pl",
        "ransac_th": 3.0,
        "options": {"num_hypotheses": 1024, "refine_iters": 3, "seed": 0,
                     "line_th": None},
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

        lines0 = data.get("m_lines0")
        if lines0 is None:
            lines0 = jnp.zeros((0, 2, 2), jnp.float32)
            lines1 = jnp.zeros((0, 2, 2), jnp.float32)
        else:
            lines0 = jnp.asarray(lines0, jnp.float32)
            lines1 = jnp.asarray(data["m_lines1"], jnp.float32)
        lvalid = data.get("line_mask")
        if lvalid is None:
            lvalid = jnp.ones(lines0.shape[0], bool)
        nl = lines0.shape[0]
        # pad lines to a bucket too (reuse pad_to_bucket on flattened endpoints)
        pad_l = max(-(-max(nl, 1) // 64) * 64 - nl, 0)
        if pad_l:
            lines0 = jnp.pad(lines0, ((0, pad_l), (0, 0), (0, 0)))
            lines1 = jnp.pad(lines1, ((0, pad_l), (0, 0), (0, 0)))
            lvalid = jnp.pad(lvalid, (0, pad_l))

        key = data.get("rng", jax.random.PRNGKey(self.conf.options.seed))
        opt = self.conf.options
        line_th = opt.get("line_th") or float(self.conf.ransac_th)
        result, line_inl = jax.jit(
            ransac_homography_point_line,
            static_argnames=("num_hypotheses", "refine_iters"),
        )(
            kpts0, kpts1, valid, lines0, lines1, lvalid, key,
            th=jnp.float32(self.conf.ransac_th), line_th=jnp.float32(line_th),
            num_hypotheses=int(opt.num_hypotheses),
            refine_iters=int(opt.refine_iters),
        )
        return {
            "success": result.success,
            "M_0to1": result.model,
            "inliers": result.inliers[:n],
            "line_inliers": line_inl[:nl],
        }


__main_estimator__ = HybridPointLineHomography
