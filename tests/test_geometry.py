"""Unit tests for the geometry core: synthetic-transform tests in the style of
the reference's tests/test_eval_utils.py (construct a known GT transform,
synthesize correspondences, assert exact metric values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry import (
    Camera,
    Pose,
    decompose_essential_matrix,
    gt_matches_from_homography,
    gt_matches_from_pose_depth,
    homography_corner_error,
    relative_pose_error,
    sample_depth,
    sample_homography_corners,
    solve_homography_dlt,
    so3exp_map,
    sym_epipolar_distance,
    sym_epipolar_distance_all,
    sym_homography_error,
    T_to_E,
    T_to_F,
    warp_points,
    warp_points_np,
)

jax.config.update("jax_enable_x64", False)


def random_pose(rng, angle=0.3, tnorm=1.0):
    aa = rng.randn(3) * angle
    t = rng.randn(3)
    t = t / np.linalg.norm(t) * tnorm
    return Pose.from_Rt(np.asarray(so3exp_map(jnp.asarray(aa))), t)


class TestPose:
    def test_compose_inverse(self, rng):
        T1, T2 = random_pose(rng), random_pose(rng)
        p = jnp.asarray(rng.randn(1, 10, 3), jnp.float32)
        T = T2 @ T1
        np.testing.assert_allclose(
            T.transform(p), T2.transform(T1.transform(p)), rtol=1e-5, atol=1e-5
        )
        back = T.inv().transform(T.transform(p))
        np.testing.assert_allclose(back, p, rtol=1e-4, atol=1e-4)

    def test_matrix_roundtrip(self, rng):
        T = random_pose(rng)
        T2 = Pose.from_4x4mat(T.matrix())
        np.testing.assert_allclose(T.R, T2.R, atol=1e-6)
        np.testing.assert_allclose(T.t, T2.t, atol=1e-6)

    def test_magnitude(self):
        aa = np.array([0.0, 0.0, np.pi / 4])
        T = Pose.from_aa(aa, np.array([3.0, 4.0, 0.0]))
        dr, dt = T.magnitude()
        np.testing.assert_allclose(dr, 45.0, rtol=1e-5)
        np.testing.assert_allclose(dt, 5.0, rtol=1e-6)

    def test_pytree(self, rng):
        T = random_pose(rng)
        T2 = jax.jit(lambda T: T.inv().inv())(T)
        np.testing.assert_allclose(T.R, T2.R, atol=1e-6)


class TestCamera:
    def make(self):
        return Camera.from_params(640, 480, 500.0, 500.0, 320.0, 240.0)

    def test_project_roundtrip(self, rng):
        cam = self.make()
        p2d = jnp.asarray(rng.uniform([0, 0], [639, 479], (1, 20, 2)), jnp.float32)
        rays = cam.image2cam(p2d)
        p3d = rays * rng.uniform(1, 10, (1, 20, 1)).astype(np.float32)
        p2d_back, valid = cam.cam2image(p3d)
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(p2d_back, p2d, rtol=1e-4, atol=1e-2)

    def test_calibration_matrix(self):
        K = self.make().calibration_matrix()
        np.testing.assert_allclose(
            K, [[500, 0, 320], [0, 500, 240], [0, 0, 1]], atol=1e-6
        )

    def test_scale_crop(self):
        cam = self.make().scale(0.5)
        np.testing.assert_allclose(cam.f, [250, 250], atol=1e-5)
        np.testing.assert_allclose(cam.size, [320, 240], atol=1e-5)
        cam2 = self.make().crop((100, 50), (320, 240))
        np.testing.assert_allclose(cam2.c, [220, 190], atol=1e-5)


class TestHomography:
    def test_sampled_homography_maps_corners(self, rng):
        H, corners, warped, _ = sample_homography_corners(
            (640, 480), (320, 240), difficulty=0.5, rng=rng
        )
        w2 = warp_points_np(corners, H)
        np.testing.assert_allclose(w2, warped, atol=1e-6)
        # H maps the sampled in-image quad onto the patch corners; verify the
        # inverse warp of the patch corners lands inside the source image.
        patch_corners = np.array([[0, 0], [0, 240], [320, 240], [320, 0]], float)
        back = warp_points_np(patch_corners, H, inverse=True)
        assert np.all(back >= -1e-3) and np.all(back <= [640.001, 480.001])

    def test_warp_points_inverse(self, rng):
        H, *_ = sample_homography_corners((640, 480), (640, 480), 0.3, rng=rng)
        pts = jnp.asarray(rng.uniform(0, 400, (2, 50, 2)), jnp.float32)
        Hj = jnp.asarray(np.stack([H, H]), jnp.float32)
        back = warp_points(warp_points(pts, Hj), Hj, inverse=True)
        np.testing.assert_allclose(back, pts, rtol=1e-3, atol=1e-2)

    def test_dlt_recovers_homography(self, rng):
        H, *_ = sample_homography_corners((640, 480), (640, 480), 0.4, rng=rng)
        pts0 = rng.uniform(50, 400, (1, 32, 2)).astype(np.float32)
        pts1 = warp_points_np(pts0[0], H)[None].astype(np.float32)
        H_est = solve_homography_dlt(jnp.asarray(pts0), jnp.asarray(pts1))[0]
        H_norm = H / H[2, 2]
        np.testing.assert_allclose(H_est, H_norm, rtol=5e-3, atol=5e-3)
        err = sym_homography_error(jnp.asarray(pts0), jnp.asarray(pts1), H_est[None])
        assert float(err.max()) < 0.1

    def test_weighted_dlt_ignores_outliers(self, rng):
        H, *_ = sample_homography_corners((640, 480), (640, 480), 0.4, rng=rng)
        pts0 = rng.uniform(50, 400, (40, 2)).astype(np.float32)
        pts1 = warp_points_np(pts0, H).astype(np.float32)
        pts1[:8] += rng.uniform(50, 100, (8, 2))  # gross outliers
        w = np.ones(40, np.float32)
        w[:8] = 0.0
        H_est = solve_homography_dlt(
            jnp.asarray(pts0[None]), jnp.asarray(pts1[None]), jnp.asarray(w[None])
        )[0]
        err = sym_homography_error(
            jnp.asarray(pts0[None, 8:]), jnp.asarray(pts1[None, 8:]), H_est[None]
        )
        assert float(err.max()) < 0.5

    def test_corner_error_identity(self):
        H = jnp.eye(3)[None]
        err = homography_corner_error(H, H, jnp.asarray([[640.0, 480.0]]))
        np.testing.assert_allclose(err, 0.0, atol=1e-6)


class TestEpipolar:
    def test_epipolar_distance_zero_for_true_matches(self, rng):
        T = random_pose(rng)
        cam = Camera.from_params(640, 480, 500.0, 500.0, 320.0, 240.0)
        # synthesize 3D points and project into both views
        p3d_0 = rng.uniform([-2, -2, 4], [2, 2, 10], (1, 30, 3)).astype(np.float32)
        p0, _ = cam.cam2image(jnp.asarray(p3d_0))
        p1, _ = cam.cam2image(T.transform(jnp.asarray(p3d_0)))
        F = T_to_F(cam, cam, T)
        d = sym_epipolar_distance(p0, p1, F, squared=False)
        assert float(jnp.abs(d).max()) < 1e-2
        d_all = sym_epipolar_distance_all(p0, p1, F)
        diag = jnp.diagonal(d_all, axis1=-2, axis2=-1)
        assert float(diag.max()) < 1e-2
        # [n, m] convention: row n ~ p0[n], col m ~ p1[m]
        assert d_all.shape == (1, 30, 30)

    def test_decompose_essential(self, rng):
        T = random_pose(rng)
        E = T_to_E(T)
        R1, R2, t = decompose_essential_matrix(E)
        t_dir = T.t / jnp.linalg.norm(T.t)
        ok_R = min(
            float(jnp.abs(R1 - T.R).max()), float(jnp.abs(R2 - T.R).max())
        )
        ok_t = min(
            float(jnp.abs(t - t_dir).max()), float(jnp.abs(t + t_dir).max())
        )
        assert ok_R < 1e-4 and ok_t < 1e-4

    def test_relative_pose_error_zero(self, rng):
        T = random_pose(rng)
        t_err, r_err = relative_pose_error(T, T.R, T.t)
        assert float(t_err) < 0.1 and float(r_err) < 0.1


class TestDepth:
    def test_sample_depth_bilinear(self):
        depth = jnp.ones((1, 10, 12)) * 2.0
        pts = jnp.asarray([[[3.5, 4.5], [0.1, 0.1], [11.9, 9.9]]])
        d, valid = sample_depth(pts, depth)
        np.testing.assert_allclose(d[0, 0], 2.0, atol=1e-6)
        assert bool(valid[0, 0])
        # near-border samples touch out-of-image neighbors -> invalid
        assert not bool(valid[0, 1]) and not bool(valid[0, 2])

    def test_sample_depth_invalid_region(self):
        depth = jnp.ones((1, 16, 16)).at[:, :8].set(0.0)
        pts = jnp.asarray([[[8.0, 4.0], [8.0, 12.0]]])
        d, valid = sample_depth(pts, depth)
        assert not bool(valid[0, 0]) and bool(valid[0, 1])


class TestGTGeneration:
    def test_homography_gt_identity(self, rng):
        kp = rng.uniform(10, 400, (1, 64, 2)).astype(np.float32)
        out = gt_matches_from_homography(
            jnp.asarray(kp), jnp.asarray(kp), jnp.eye(3)[None]
        )
        np.testing.assert_array_equal(out["matches0"][0], np.arange(64))
        np.testing.assert_array_equal(out["matches1"][0], np.arange(64))

    def test_homography_gt_with_padding_and_outliers(self, rng):
        H, *_ = sample_homography_corners((640, 480), (640, 480), 0.3, rng=rng)
        kp0 = rng.uniform(100, 380, (48, 2)).astype(np.float32)
        kp1 = warp_points_np(kp0, H).astype(np.float32)
        # displace last 8 of kp1 far away -> kp0 partners become unmatched
        kp1[40:] += 500.0
        valid0 = np.ones(48, bool)
        valid0[44:] = False  # padding on side 0
        out = gt_matches_from_homography(
            jnp.asarray(kp0[None]),
            jnp.asarray(kp1[None]),
            jnp.asarray(H[None], jnp.float32),
            valid0=jnp.asarray(valid0[None]),
        )
        m0 = np.asarray(out["matches0"][0])
        np.testing.assert_array_equal(m0[:40], np.arange(40))
        assert np.all(m0[40:44] == -1)  # true point moved far -> unmatched
        assert np.all(m0[44:] == -2)  # padded -> ignore

    def test_pose_depth_gt(self, rng):
        cam = Camera.from_params(64, 48, 60.0, 60.0, 32.0, 24.0)
        T = Pose.from_aa(np.array([0.0, 0.02, 0.0]), np.array([0.1, 0.0, 0.0]))
        depth_val = 5.0
        depth0 = jnp.full((1, 48, 64), depth_val)
        # keypoints in view0 with known depth -> project to view1
        kp0 = jnp.asarray(rng.uniform(12, 40, (1, 16, 2)), jnp.float32)
        p3d = cam.image2cam(kp0) * depth_val
        kp1, vis = cam.cam2image(T.transform(p3d))
        assert bool(jnp.all(vis))
        # view1 depth = z of transformed points, but approximate with const map
        z1 = T.transform(p3d)[..., 2]
        depth1 = jnp.full((1, 48, 64), float(z1.mean()))
        data = {
            "view0": {"camera": cam, "depth": depth0},
            "view1": {"camera": cam, "depth": depth1},
            "T_0to1": T,
            "T_1to0": T.inv(),
        }
        out = gt_matches_from_pose_depth(kp0, kp1, data, pos_th=3, neg_th=5)
        m0 = np.asarray(out["matches0"][0])
        # most points should be matched to their counterpart
        assert (m0 == np.arange(16)).mean() > 0.75


class TestJitVmap:
    def test_gt_generation_jit_vmap(self, rng):
        kp0 = jnp.asarray(rng.uniform(0, 400, (4, 32, 2)), jnp.float32)
        H = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        fn = jax.jit(gt_matches_from_homography)
        out = fn(kp0, kp0, H)
        assert out["matches0"].shape == (4, 32)
        out_v = jax.vmap(lambda a, b, h: gt_matches_from_homography(a[None], b[None], h[None]))(
            kp0, kp0, H
        )
        np.testing.assert_array_equal(
            np.asarray(out_v["matches0"])[:, 0], np.asarray(out["matches0"])
        )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
