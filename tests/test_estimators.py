"""RANSAC estimator tests: recovery of known H / relative pose under outliers,
cross-checked against the OpenCV baselines, plus vmap/jit coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.estimators import (
    load_estimator,
    ransac_homography,
    ransac_relative_pose,
)
from gluefactory_tpu.geometry import (
    Camera,
    Pose,
    homography_corner_error,
    relative_pose_error,
    so3exp_map,
)
from gluefactory_tpu.geometry.homography import (
    sample_homography_corners,
    warp_points_np,
)


def make_h_problem(rng, n=200, outlier_frac=0.4, noise=0.5):
    H, *_ = sample_homography_corners((640, 480), (640, 480), 0.3, rng=rng)
    kp0 = rng.uniform(50, 430, (n, 2)).astype(np.float32)
    kp1 = warp_points_np(kp0, H).astype(np.float32)
    kp1 += rng.randn(n, 2).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    kp1[:n_out] = rng.uniform(0, 640, (n_out, 2)).astype(np.float32)
    return H, kp0, kp1, n_out


def make_pose_problem(rng, n=200, outlier_frac=0.4, noise=0.5):
    cam = Camera.from_params(640, 480, 600.0, 600.0, 320.0, 240.0)
    aa = rng.randn(3) * 0.15
    t = rng.randn(3)
    t = t / np.linalg.norm(t)
    T = Pose.from_Rt(np.asarray(so3exp_map(jnp.asarray(aa))), t.astype(np.float32))
    p3d = rng.uniform([-3, -2, 3], [3, 2, 12], (n, 3)).astype(np.float32)
    kp0, v0 = cam.cam2image(jnp.asarray(p3d[None]))
    kp1, v1 = cam.cam2image(T.transform(jnp.asarray(p3d[None])))
    kp0 = np.asarray(kp0[0])
    kp1 = np.asarray(kp1[0]) + rng.randn(n, 2).astype(np.float32) * noise
    ok = np.asarray(v0[0] & v1[0])
    n_out = int(n * outlier_frac)
    kp1[:n_out] = rng.uniform(0, 640, (n_out, 2)).astype(np.float32)
    return cam, T, kp0, kp1, ok


class TestHomographyRansac:
    def test_recovers_h_with_outliers(self, rng):
        H, kp0, kp1, n_out = make_h_problem(rng)
        res = ransac_homography(
            jnp.asarray(kp0), jnp.asarray(kp1), jnp.ones(len(kp0), bool),
            jax.random.PRNGKey(0), th=3.0,
        )
        assert bool(res.success)
        err = homography_corner_error(
            res.model[None], jnp.asarray(H[None], jnp.float32),
            jnp.asarray([[640.0, 480.0]]),
        )
        assert float(err[0]) < 2.0, float(err[0])
        inl = np.asarray(res.inliers)
        assert inl[n_out:].mean() > 0.9  # finds the true inliers
        assert inl[:n_out].mean() < 0.1  # rejects the outliers

    def test_estimator_interface_and_opencv_agree(self, rng):
        H, kp0, kp1, n_out = make_h_problem(rng)
        data = {"m_kpts0": kp0, "m_kpts1": kp1}
        ours = load_estimator("homography", "jax_ransac")({"ransac_th": 3.0})(data)
        cv = load_estimator("homography", "opencv")({"ransac_th": 3.0})(data)
        assert bool(ours["success"]) and bool(cv["success"])
        size = jnp.asarray([[640.0, 480.0]])
        H_gt = jnp.asarray(H[None], jnp.float32)
        err_ours = float(homography_corner_error(ours["M_0to1"][None], H_gt, size)[0])
        err_cv = float(
            homography_corner_error(jnp.asarray(cv["M_0to1"][None]), H_gt, size)[0]
        )
        assert err_ours < max(2.0, 2 * err_cv + 0.5), (err_ours, err_cv)

    def test_vmapped_pairs(self, rng):
        problems = [make_h_problem(rng, n=128) for _ in range(4)]
        kp0 = jnp.asarray(np.stack([p[1] for p in problems]))
        kp1 = jnp.asarray(np.stack([p[2] for p in problems]))
        valid = jnp.ones(kp0.shape[:2], bool)
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        fn = jax.jit(
            jax.vmap(lambda a, b, v, k: ransac_homography(a, b, v, k, th=3.0))
        )
        res = fn(kp0, kp1, valid, keys)
        assert res.model.shape == (4, 3, 3)
        for i, (H, *_rest) in enumerate(problems):
            err = homography_corner_error(
                res.model[i][None], jnp.asarray(H[None], jnp.float32),
                jnp.asarray([[640.0, 480.0]]),
            )
            assert float(err[0]) < 3.0

    def test_degenerate_input_no_nan(self, rng):
        # all points identical -> degenerate; must not produce NaN or crash
        kp = np.ones((32, 2), np.float32) * 100
        res = ransac_homography(
            jnp.asarray(kp), jnp.asarray(kp), jnp.ones(32, bool),
            jax.random.PRNGKey(0), th=3.0,
        )
        assert np.all(np.isfinite(np.asarray(res.model)))


class TestRelativePoseRansac:
    def test_recovers_pose_with_outliers(self, rng):
        cam, T, kp0, kp1, ok = make_pose_problem(rng)
        p0n = np.asarray(cam.normalize(jnp.asarray(kp0[None])))[0]
        p1n = np.asarray(cam.normalize(jnp.asarray(kp1[None])))[0]
        res = ransac_relative_pose(
            jnp.asarray(p0n), jnp.asarray(p1n), jnp.asarray(ok),
            jax.random.PRNGKey(0), th=2.0 / 600.0,
        )
        assert bool(res.success)
        t_err, r_err = relative_pose_error(T, res.R, res.t)
        assert float(r_err) < 1.5, float(r_err)
        assert float(t_err) < 3.0, float(t_err)

    def test_estimator_interface(self, rng):
        cam, T, kp0, kp1, ok = make_pose_problem(rng)
        est = load_estimator("relative_pose", "jax_ransac")({"ransac_th": 2.0})
        out = est(
            {"m_kpts0": kp0, "m_kpts1": kp1, "camera0": cam, "camera1": cam,
             "match_mask": ok}
        )
        assert bool(out["success"])
        t_err, r_err = relative_pose_error(T, out["M_0to1"].R, out["M_0to1"].t)
        assert float(r_err) < 1.5 and float(t_err) < 3.0

    def test_against_opencv(self, rng):
        cam, T, kp0, kp1, ok = make_pose_problem(rng, outlier_frac=0.3)
        data = {"m_kpts0": kp0, "m_kpts1": kp1, "camera0": cam, "camera1": cam,
                "match_mask": ok}
        ours = load_estimator("relative_pose", "jax_ransac")({"ransac_th": 1.0})(data)
        cv = load_estimator("relative_pose", "opencv")({"ransac_th": 1.0})(data)
        t_o, r_o = relative_pose_error(T, ours["M_0to1"].R, ours["M_0to1"].t)
        t_c, r_c = relative_pose_error(T, cv["M_0to1"].R, cv["M_0to1"].t)
        # ours should be in the same accuracy class as OpenCV
        assert float(r_o) < max(1.5, 2 * float(r_c) + 0.5)
        assert float(t_o) < max(3.0, 2 * float(t_c) + 1.0)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])


class TestHybridPointLineRansac:
    def test_lines_improve_sparse_points(self, rng):
        from gluefactory_tpu.estimators.ransac import ransac_homography_point_line
        from gluefactory_tpu.geometry.homography import warp_points_np

        H, kp0, kp1, n_out = make_h_problem(rng, n=24, outlier_frac=0.5)
        # line segments consistent with the same homography
        L = 16
        l0 = rng.uniform(60, 400, (L, 2, 2)).astype(np.float32)
        l1 = warp_points_np(l0.reshape(-1, 2), H).reshape(L, 2, 2).astype(np.float32)
        res, line_inl = jax.jit(
            ransac_homography_point_line,
            static_argnames=("num_hypotheses", "refine_iters"),
        )(
            jnp.asarray(kp0), jnp.asarray(kp1), jnp.ones(len(kp0), bool),
            jnp.asarray(l0), jnp.asarray(l1), jnp.ones(L, bool),
            jax.random.PRNGKey(0), th=jnp.float32(3.0), line_th=jnp.float32(3.0),
        )
        err = homography_corner_error(
            res.model[None], jnp.asarray(H[None], jnp.float32),
            jnp.asarray([[640.0, 480.0]]),
        )
        assert bool(res.success)
        assert float(err[0]) < 2.0, float(err[0])
        assert np.asarray(line_inl).mean() > 0.9

    def test_estimator_interface(self, rng):
        from gluefactory_tpu.estimators import load_estimator
        from gluefactory_tpu.geometry.homography import warp_points_np

        H, kp0, kp1, n_out = make_h_problem(rng)
        L = 12
        l0 = rng.uniform(60, 400, (L, 2, 2)).astype(np.float32)
        l1 = warp_points_np(l0.reshape(-1, 2), H).reshape(L, 2, 2).astype(np.float32)
        est = load_estimator("homography", "hybrid_pl")({"ransac_th": 3.0})
        out = est({"m_kpts0": kp0, "m_kpts1": kp1, "m_lines0": l0, "m_lines1": l1})
        err = homography_corner_error(
            jnp.asarray(out["M_0to1"][None]), jnp.asarray(H[None], jnp.float32),
            jnp.asarray([[640.0, 480.0]]),
        )
        assert float(err[0]) < 2.0
        assert out["line_inliers"].shape == (12,)


class TestEstimatorAliases:
    def test_reference_names_resolve(self):
        from gluefactory_tpu.estimators.base_estimator import load_estimator
        from gluefactory_tpu.estimators.homography.hybrid_pl import (
            HybridPointLineHomography,
        )
        from gluefactory_tpu.estimators.homography.jax_ransac import (
            JaxRansacHomography,
        )
        from gluefactory_tpu.estimators.relative_pose.jax_ransac import (
            JaxRansacRelativePose,
        )

        # reference config estimator names work unchanged
        assert load_estimator("homography", "poselib") is JaxRansacHomography
        assert (
            load_estimator("homography", "homography_est")
            is HybridPointLineHomography
        )
        assert load_estimator("relative_pose", "poselib") is JaxRansacRelativePose
        assert load_estimator("relative_pose", "pycolmap") is JaxRansacRelativePose


class TestRansacOutlierSweep:
    """VERDICT r1 #8: pin jax_ransac's accuracy across outlier rates to the
    levels recorded in docs/ransac_comparison.md (medians over seeds; the
    guided second round carries the >=60% regimes)."""

    def _h_problem(self, rng, n=512, outlier_rate=0.3, noise=1.0, size=(640, 480)):
        w, h = size
        H = np.eye(3) + rng.randn(3, 3) * np.array(
            [[0.1, 0.05, 20.0], [0.05, 0.1, 20.0], [2e-4, 2e-4, 0.0]]
        )
        p0 = rng.uniform([40, 40], [w - 40, h - 40], (n, 2))
        p1h = np.c_[p0, np.ones(n)] @ H.T
        p1 = p1h[:, :2] / p1h[:, 2:]
        p1 += rng.randn(n, 2) * noise
        n_out = int(n * outlier_rate)
        idx = rng.permutation(n)[:n_out]
        p1[idx] = rng.uniform([0, 0], [w, h], (n_out, 2))
        return p0.astype(np.float32), p1.astype(np.float32), H

    def _corner_error(self, H_est, H_gt, size=(640, 480)):
        w, h = size
        c = np.array([[0, 0, 1], [w, 0, 1], [w, h, 1], [0, h, 1]], float)
        pe = c @ np.asarray(H_est, float).T
        pg = c @ H_gt.T
        pe = pe[:, :2] / pe[:, 2:]
        pg = pg[:, :2] / pg[:, 2:]
        return float(np.mean(np.linalg.norm(pe - pg, axis=-1)))

    @pytest.mark.parametrize("rate,max_med_px", [(0.0, 0.5), (0.4, 0.7), (0.7, 1.0)])
    def test_homography_accuracy_vs_outlier_rate(self, rate, max_med_px):
        est = load_estimator("homography", "jax_ransac")({"ransac_th": 3.0})
        errs = []
        for tr in range(5):
            rng = np.random.RandomState(1000 + tr)
            p0, p1, H = self._h_problem(rng, outlier_rate=rate)
            out = est({"m_kpts0": p0, "m_kpts1": p1})
            errs.append(self._corner_error(np.asarray(out["M_0to1"]), H))
        assert np.median(errs) < max_med_px, (rate, errs)

    def test_relpose_guided_round_recovers_high_outliers(self):
        """At 70% outliers the uniform 8-point round alone is hopeless
        (inlier_rate^8); the guided round must bring the median pose error
        under 3 deg (measured ~1.5; OpenCV ~4.7)."""
        from gluefactory_tpu.geometry.wrappers import Camera

        w, h, f = 640, 480, 600.0
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        est = load_estimator("relative_pose", "jax_ransac")(
            {"ransac_th": 2.0, "options": {"guided_rounds": 1}}
        )
        errs = []
        for tr in range(4):
            rng = np.random.RandomState(2000 + tr)
            ang = rng.uniform(-0.15, 0.15, 3)
            Rx = lambda a: np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
            Ry = lambda a: np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
            R = Rx(ang[0]) @ Ry(ang[1])
            t = rng.randn(3)
            t /= np.linalg.norm(t)
            n = 512
            X = np.c_[rng.uniform(-3, 3, (n, 2)), rng.uniform(4, 12, n)]
            p0 = (K @ X.T).T
            p0 = p0[:, :2] / p0[:, 2:]
            X1 = (R @ X.T).T + t
            p1 = (K @ X1.T).T
            p1 = p1[:, :2] / p1[:, 2:]
            p0 += rng.randn(n, 2)
            p1 += rng.randn(n, 2)
            n_out = int(n * 0.7)
            idx = rng.permutation(n)[:n_out]
            p1[idx] = rng.uniform([0, 0], [w, h], (n_out, 2))
            cam = Camera.from_calibration_matrix(K.astype(np.float32))
            out = est(
                {
                    "m_kpts0": p0.astype(np.float32),
                    "m_kpts1": p1.astype(np.float32),
                    "camera0": cam,
                    "camera1": cam,
                }
            )
            M = out["M_0to1"]
            R_e, t_e = np.asarray(M.R, float), np.asarray(M.t, float).reshape(3)
            cosr = (np.trace(R_e.T @ R) - 1) / 2
            r_err = np.degrees(np.arccos(np.clip(cosr, -1, 1)))
            cost = abs(t_e @ t) / (np.linalg.norm(t_e) * np.linalg.norm(t) + 1e-12)
            t_err = np.degrees(np.arccos(np.clip(cost, 0, 1)))
            errs.append(max(r_err, t_err))
        assert np.median(errs) < 3.0, errs
