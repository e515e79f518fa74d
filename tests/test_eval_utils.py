"""Eval metric unit tests with synthetic transforms and exact expected values
(mirrors the scenarios of reference tests/test_eval_utils.py:9-88)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.eval.utils import (
    eval_homography_dlt,
    eval_homography_robust,
    eval_matches_homography,
    eval_poses,
)
from gluefactory_tpu.geometry.homography import warp_points_np
from gluefactory_tpu.utils.tools import AUCMetric, MedianMetric, cal_error_auc


def default_pts():
    return np.array([[10.0, 10.0], [10.0, 20.0], [20.0, 20.0], [20.0, 10.0]])


def default_pred(kps0, kps1):
    return {
        "keypoints0": kps0,
        "keypoints1": kps1,
        "matches0": np.arange(len(kps0)),
        "matching_scores0": np.ones(len(kps0)),
    }


class TestEvalMatchesHomography:
    def test_trivial(self):
        data = {"H_0to1": np.eye(3)}
        kps = default_pts()
        results = eval_matches_homography(data, default_pred(kps, kps))
        assert results["prec@1px"] == 1
        assert results["prec@3px"] == 1
        assert results["num_matches"] == 4
        assert results["num_keypoints"] == 4

    def test_real_h(self):
        H = np.array([[1.5, 0.2, 21], [-0.3, 1.6, 33], [0, 0, 1.0]])
        kps0 = default_pts()
        kps1 = warp_points_np(kps0, H)
        results = eval_matches_homography({"H_0to1": H}, default_pred(kps0, kps1))
        assert results["prec@1px"] == 1
        assert results["prec@3px"] == 1

    def test_outliers(self):
        H = np.array([[1.5, 0.2, 21], [-0.3, 1.6, 33], [0, 0, 1.0]])
        kps0 = np.concatenate([default_pts(), [[5.0, 5.0]]])
        kps1 = warp_points_np(kps0, H)
        kps1[-1] += 1.5  # 1.5px off in x and y
        results = eval_matches_homography({"H_0to1": H}, default_pred(kps0, kps1))
        assert results["prec@1px"] == pytest.approx(0.8)
        assert results["prec@3px"] == pytest.approx(1.0)


class TestRobustEvals:
    def make_pair(self, rng, n=100, n_out=20):
        H = np.array([[1.2, 0.1, 15], [-0.05, 1.1, -8], [0, 0, 1.0]])
        kps0 = rng.uniform(30, 400, (n, 2))
        kps1 = warp_points_np(kps0, H)
        kps1[:n_out] += rng.uniform(30, 80, (n_out, 2))
        data = {"H_0to1": H, "view0": {"image_size": np.array([640.0, 480.0])}}
        return data, default_pred(kps0, kps1)

    def test_homography_robust(self, rng):
        data, pred = self.make_pair(rng)
        res = eval_homography_robust(data, pred, {"ransac_th": 3.0})
        assert res["H_error_ransac"] < 1.0
        assert res["ransac_inl"] >= 75

    def test_homography_dlt_clean(self, rng):
        data, pred = self.make_pair(rng, n_out=0)
        res = eval_homography_dlt(data, pred)
        assert res["H_error_dlt"] < 0.5

    def test_eval_poses_summary(self):
        pose_results = {
            0.5: {"rel_pose_error": [0.5, 1.5, 30.0, 2.0], "ransac_inl": [10] * 4},
            1.0: {"rel_pose_error": [0.2, 0.4, 0.8, 1.2], "ransac_inl": [20] * 4},
        }
        summaries, best = eval_poses(pose_results, [1, 3, 5], "rel_pose_error")
        assert best == 1.0  # clearly better errors
        assert summaries["rel_pose_error@5°"] > summaries["rel_pose_error@1°"]
        assert summaries["mransac_inl"] == 20


class TestAUC:
    def test_cal_error_auc_known_values(self):
        # all errors zero -> AUC 1 at any threshold
        assert cal_error_auc([0.0, 0.0], [1.0]) == [1.0]
        # all errors above threshold -> AUC 0
        assert cal_error_auc([10.0, 12.0], [1.0]) == [0.0]
        # single error at half the threshold: recall rises linearly 0->1 over
        # [0, 0.5] (trapezoid), then flat: AUC = 0.25 + 0.5 = 0.75
        assert cal_error_auc([0.5], [1.0]) == [0.75]

    def test_auc_metric_matches_direct(self, rng):
        errs = rng.rand(100) * 5
        m = AUCMetric([1, 3, 5])
        m.update(errs)
        assert m.compute() == cal_error_auc(errs, [1, 3, 5])

    def test_median_metric_nan_safe(self):
        m = MedianMetric()
        m.update(np.array([1.0, np.nan, 3.0]))
        assert m.compute() == 2.0


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
