"""SfM layer tests: triangulation, bundle adjustment (single and multi-chip
Schur reduction), pose-graph optimization, ATE metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.utils import so3exp_map
from gluefactory_tpu.sfm.ba import (
    BAProblem,
    ba_cost,
    bundle_adjust,
    make_distributed_ba_step,
)
from gluefactory_tpu.sfm.metrics import (
    absolute_trajectory_error,
    camera_centers,
)
from gluefactory_tpu.sfm.pose_graph import (
    PoseGraph,
    optimize_pose_graph,
    pg_cost,
    so3_log,
)
from gluefactory_tpu.sfm.triangulation import triangulate_dlt


def make_ba_problem(rng, n_cams=6, n_pts=64, k_obs=4, noise=0.5,
                    perturb_cam=0.02, perturb_pt=0.05):
    """Synthetic BA problem: cameras on an arc observing a point cloud."""
    f, cx, cy = 500.0, 320.0, 240.0
    K_mat = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    Rs, ts = [], []
    for i in range(n_cams):
        aa = np.array([0.0, 0.25 * (i / n_cams - 0.5), 0.0]) + rng.randn(3) * 0.01
        R = np.asarray(so3exp_map(jnp.asarray(aa, jnp.float32)))
        t = np.array([0.8 * (i / n_cams - 0.5), 0.0, 0.0]) + rng.randn(3) * 0.01
        Rs.append(R)
        ts.append(t)
    R_gt = np.stack(Rs).astype(np.float32)
    t_gt = np.stack(ts).astype(np.float32)
    X_gt = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (n_pts, 3)).astype(np.float32)

    cam_idx = np.stack(
        [rng.choice(n_cams, k_obs, replace=False) for _ in range(n_pts)]
    ).astype(np.int32)
    p_cam = np.einsum("pkij,pj->pki", R_gt[cam_idx], X_gt) + t_gt[cam_idx]
    uv = (p_cam[..., :2] / p_cam[..., 2:]) * f + np.array([cx, cy])
    uv = (uv + rng.randn(*uv.shape) * noise).astype(np.float32)
    valid = np.ones(cam_idx.shape, bool)

    # perturbed initialization
    R0 = np.einsum(
        "cij,cjk->cik",
        np.asarray(so3exp_map(jnp.asarray(rng.randn(n_cams, 3) * perturb_cam, jnp.float32))),
        R_gt,
    ).astype(np.float32)
    t0 = (t_gt + rng.randn(n_cams, 3) * perturb_cam * 2).astype(np.float32)
    # keep the gauge anchor at its true pose (camera 0 is clamped in BA)
    R0[0], t0[0] = R_gt[0], t_gt[0]
    X0 = (X_gt + rng.randn(n_pts, 3) * perturb_pt).astype(np.float32)

    problem = BAProblem(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0),
        jnp.asarray(cam_idx), jnp.asarray(uv), jnp.asarray(valid),
        jnp.asarray(K_mat, jnp.float32),
    )
    return problem, (R_gt, t_gt, X_gt)


class TestTriangulation:
    def test_exact_recovery(self, rng):
        f = 500.0
        Rs = np.stack([np.asarray(so3exp_map(jnp.asarray(rng.randn(3) * 0.1, jnp.float32))) for _ in range(4)])
        ts = rng.randn(4, 3).astype(np.float32) * 0.5
        X = np.array([0.5, -0.3, 6.0], np.float32)
        p_cam = np.einsum("kij,j->ki", Rs, X) + ts
        rays = p_cam[:, :2] / p_cam[:, 2:]
        X_est = triangulate_dlt(
            jnp.asarray(rays[None]), jnp.asarray(Rs[None]), jnp.asarray(ts[None]),
            jnp.ones((1, 4), bool),
        )[0]
        np.testing.assert_allclose(X_est, X, atol=1e-3)


class TestBundleAdjustment:
    def test_ba_reduces_cost_and_errors(self, rng):
        problem, (R_gt, t_gt, X_gt) = make_ba_problem(rng)
        cost0 = float(ba_cost(problem))
        refined, cost, lam = bundle_adjust(problem, iterations=10)
        cost = float(cost)
        assert cost < cost0 * 0.1, (cost0, cost)
        # camera centers close to GT: monocular BA leaves the scale gauge
        # free, so compare after similarity alignment (and loosely without)
        c_est = camera_centers(np.asarray(refined.R), np.asarray(refined.t))
        c_gt = camera_centers(R_gt, t_gt)
        ate_aligned = absolute_trajectory_error(c_est, c_gt, align=True)
        assert ate_aligned["ate_rmse"] < 0.02, ate_aligned
        ate_raw = absolute_trajectory_error(c_est, c_gt, align=False)
        assert ate_raw["ate_rmse"] < 0.1, ate_raw

    def test_noise_floor(self, rng):
        """With zero pixel noise BA should converge to ~exact GT."""
        problem, (R_gt, t_gt, X_gt) = make_ba_problem(rng, noise=0.0)
        refined, cost, _ = bundle_adjust(problem, iterations=12)
        assert float(cost) < 1e-2
        np.testing.assert_allclose(np.asarray(refined.X), X_gt, atol=2e-2)  # free scale gauge

    def test_distributed_matches_single(self, rng):
        from gluefactory_tpu.parallel.mesh import make_mesh

        problem, _ = make_ba_problem(rng, n_pts=64)
        mesh = make_mesh()
        step = make_distributed_ba_step(mesh)
        lam = jnp.asarray(1e-3)
        R_d, t_d, X_d = step(
            problem.R, problem.t, problem.X, problem.cam_idx, problem.uv,
            problem.valid, problem.K_mat, lam,
        )
        from gluefactory_tpu.sfm.ba import ba_gn_step

        ref = ba_gn_step(problem, lam)
        # fp32 reduction order differs between the psum tree and the single
        # sum; agreement to ~1e-3 is exact up to that noise
        np.testing.assert_allclose(np.asarray(R_d), np.asarray(ref.R), atol=1e-3)
        np.testing.assert_allclose(np.asarray(t_d), np.asarray(ref.t), atol=1e-3)
        np.testing.assert_allclose(np.asarray(X_d), np.asarray(ref.X), atol=2e-3)


class TestPoseGraph:
    def test_so3_log_roundtrip(self, rng):
        aa = rng.randn(8, 3).astype(np.float32) * 0.5
        R = so3exp_map(jnp.asarray(aa))
        np.testing.assert_allclose(so3_log(R), aa, atol=1e-4)

    def test_optimization_closes_loop(self, rng):
        """Chain of noisy odometry + exact loop closure -> optimization pulls
        poses toward consistency."""
        n = 8
        # GT: cameras on a circle
        R_gt, t_gt = [], []
        for i in range(n):
            aa = np.array([0, 2 * np.pi * i / n, 0], np.float32)
            R = np.asarray(so3exp_map(jnp.asarray(aa)))
            t = np.array([np.cos(2 * np.pi * i / n), 0, np.sin(2 * np.pi * i / n)],
                         np.float32)
            R_gt.append(R)
            t_gt.append(t)
        R_gt = np.stack(R_gt)
        t_gt = np.stack(t_gt)

        def rel(i, j, Rs, ts):
            R_ij = Rs[j] @ Rs[i].T
            t_ij = ts[j] - R_ij @ ts[i]
            return R_ij, t_ij

        edges, R_ij, t_ij = [], [], []
        for i in range(n):  # odometry chain + loop closure (n-1 -> 0)
            j = (i + 1) % n
            Rm, tm = rel(i, j, R_gt, t_gt)
            edges.append((i, j))
            R_ij.append(Rm)
            t_ij.append(tm)

        # noisy init: accumulate odometry with drift
        R0 = [R_gt[0]]
        t0 = [t_gt[0]]
        for i in range(1, n):
            dR = np.asarray(so3exp_map(jnp.asarray(rng.randn(3) * 0.03, jnp.float32)))
            R0.append(dR @ R_gt[i])
            t0.append(t_gt[i] + rng.randn(3) * 0.05)
        graph = PoseGraph(
            jnp.asarray(np.stack(R0), jnp.float32),
            jnp.asarray(np.stack(t0), jnp.float32),
            jnp.asarray(np.array(edges), jnp.int32),
            jnp.asarray(np.stack(R_ij), jnp.float32),
            jnp.asarray(np.stack(t_ij), jnp.float32),
            jnp.ones(len(edges)),
        )
        cost0 = float(pg_cost(graph))
        refined, cost = optimize_pose_graph(graph, iterations=10)
        assert float(cost) < cost0 * 0.05, (cost0, float(cost))
        c_est = camera_centers(np.asarray(refined.R), np.asarray(refined.t))
        c_gt = camera_centers(R_gt, t_gt)
        ate = absolute_trajectory_error(c_est, c_gt)
        assert ate["ate_rmse"] < 0.05, ate


class TestATE:
    def test_alignment_invariance(self, rng):
        traj = rng.randn(20, 3)
        s, ang = 2.0, 0.3
        R = np.asarray(so3exp_map(jnp.asarray([0, ang, 0], jnp.float32)))
        transformed = (s * (R @ traj.T)).T + np.array([1, 2, 3])
        ate = absolute_trajectory_error(transformed, traj)
        assert ate["ate_rmse"] < 1e-6


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
