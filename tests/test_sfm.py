"""SfM layer tests: triangulation, bundle adjustment (single and multi-chip
Schur reduction), pose-graph optimization, ATE metrics."""

from pathlib import Path

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


class TestDistributedBATwoProcess:
    def test_two_process_ba_matches_single(self, tmp_path):
        """VERDICT r4 next #9: the shard_map BA step under a REAL 2-process
        jax.distributed (gloo) mesh — the DCN-analogue configuration of
        SURVEY §2.10/§7 step 7 — not just the virtual 8-device mesh. Each
        rank feeds its landmark shard via make_array_from_process_local_data,
        the camera Schur system psum-reduces across the process boundary, and
        the result must match the single-process ba_gn_step."""
        import os
        import socket
        import subprocess
        import sys
        import textwrap

        repo = str(Path(__file__).resolve().parent.parent)
        worker = tmp_path / "ba_worker.py"
        worker.write_text(textwrap.dedent(
            """
            import sys
            import jax
            jax.config.update("jax_platforms", "cpu")
            import numpy as np

            pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
            sys.path.insert(0, repo)
            sys.path.insert(0, repo + "/tests")

            from gluefactory_tpu.parallel.distributed import init_distributed

            ok = init_distributed(
                coordinator_address=f"localhost:{port}",
                num_processes=2, process_id=pid,
            )
            assert ok and jax.process_count() == 2
            assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

            import jax.numpy as jnp
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P
            from jax.experimental import multihost_utils

            from gluefactory_tpu.sfm.ba import ba_gn_step, make_distributed_ba_step
            from test_sfm import make_ba_problem

            # identical full problem on both ranks (same seed)
            problem, _ = make_ba_problem(np.random.RandomState(0), n_pts=64)
            mesh = Mesh(np.asarray(jax.devices()), ("data",))

            def sharded(x):
                x = np.asarray(x)
                half = x.shape[0] // 2
                local = x[pid * half:(pid + 1) * half]
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P("data")), local, x.shape
                )

            def repl(x):
                x = np.asarray(x)
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P()), x, x.shape
                )

            step = make_distributed_ba_step(mesh)
            lam_v = np.float32(1e-3)
            R_d, t_d, X_d = step(
                repl(problem.R), repl(problem.t), sharded(problem.X),
                sharded(problem.cam_idx), sharded(problem.uv),
                sharded(problem.valid), repl(problem.K_mat), repl(lam_v),
            )
            # replicated outputs are fully addressable on every rank;
            # the landmark shard needs an allgather
            R_g = np.asarray(R_d)
            t_g = np.asarray(t_d)
            X_g = np.asarray(multihost_utils.process_allgather(X_d, tiled=True))

            # single-device reference on this rank's local CPU device
            ref = ba_gn_step(problem, jnp.asarray(lam_v))
            np.testing.assert_allclose(R_g, np.asarray(ref.R), atol=1e-3)
            np.testing.assert_allclose(t_g, np.asarray(ref.t), atol=1e-3)
            # X carries the raw scene scale (|X| up to ~8), so the fp32
            # psum-vs-single-sum reduction-order noise needs a relative term
            np.testing.assert_allclose(X_g, np.asarray(ref.X),
                                       rtol=2e-3, atol=2e-3)

            multihost_utils.sync_global_devices("ba_done")
            jax.distributed.shutdown()
            print("BA_OK", pid)
            """
        ))

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env.pop("JAX_COMPILATION_CACHE_DIR", None)  # see test_parallel.py note
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), str(port), repo],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), "\n".join(outs)
        assert "BA_OK 0" in outs[0] and "BA_OK 1" in outs[1]
