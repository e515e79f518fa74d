"""Batched bundle adjustment with Schur complement, TPU-native.

The distributed-BA core of the SfM/SLAM layer (SURVEY §7 step 7; BASELINE
north star). Design:

  - Fixed-shape track layout: every landmark carries up to K observations
    (camera index, pixel, validity) — the BA normal equations become dense
    batched einsums over (P, K) with scatter-adds into camera blocks; no
    sparse matrices, no host solver.
  - Landmark marginalization (the V^-1 Schur step) is landmark-local and
    embarrassingly parallel; the camera-block reduced system S (6C x 6C,
    C = cameras in the active window, typically <= 64) is accumulated by
    scatter-add and solved densely with Cholesky on one chip.
  - Multi-chip: `shard_map` over the LANDMARK axis — each device reduces the
    Schur contributions of its landmark shard and a `psum` over the mesh
    yields the global camera system (the SURVEY §2.10 "psum of
    landmark-marginalized camera Hessians"); camera updates are replicated,
    landmark back-substitution stays shard-local.
  - Levenberg-Marquardt with multiplicative damping and accept/reject inside
    jit (fixed iteration count, jnp.where acceptance).

Gauge: camera 0 is clamped by a large diagonal prior (soft gauge fix).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.utils import skew_symmetric, so3exp_map
from ..geometry.wrappers import Camera

_HI = "highest"


class BAProblem(NamedTuple):
    R: jnp.ndarray  # (C, 3, 3) world->cam
    t: jnp.ndarray  # (C, 3)
    X: jnp.ndarray  # (P, 3) world points
    cam_idx: jnp.ndarray  # (P, K) int32
    uv: jnp.ndarray  # (P, K, 2) pixel observations
    valid: jnp.ndarray  # (P, K) bool
    K_mat: jnp.ndarray  # (3, 3) shared intrinsics


def _project(K_mat, p_cam):
    """Pinhole projection of (..., 3) camera points -> (..., 2) pixels,
    with the Jacobian-friendly explicit form."""
    z = jnp.maximum(p_cam[..., 2], 1e-6)
    x = p_cam[..., 0] / z
    y = p_cam[..., 1] / z
    fx, fy = K_mat[0, 0], K_mat[1, 1]
    cx, cy = K_mat[0, 2], K_mat[1, 2]
    return jnp.stack([fx * x + cx, fy * y + cy], axis=-1), z


def residuals_and_jacobians(problem: BAProblem):
    """Per-observation residuals (P, K, 2) and Jacobians wrt camera deltas
    (P, K, 2, 6: [omega, tau], left-multiplicative) and landmarks (P, K, 2, 3)."""
    R = problem.R[problem.cam_idx]  # (P, K, 3, 3)
    t = problem.t[problem.cam_idx]  # (P, K, 3)
    X = problem.X[:, None, :]  # (P, 1, 3)
    RX = jnp.einsum("pkij,pkj->pki", R, jnp.broadcast_to(X, R.shape[:2] + (3,)),
                    precision=_HI)
    p_cam = RX + t
    proj, z = _project(problem.K_mat, p_cam)
    r = proj - problem.uv  # (P, K, 2)

    fx, fy = problem.K_mat[0, 0], problem.K_mat[1, 1]
    x, y = p_cam[..., 0], p_cam[..., 1]
    inv_z = 1.0 / z
    # d proj / d p_cam: (P, K, 2, 3)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * x * inv_z**2], -1),
            jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * y * inv_z**2], -1),
        ],
        axis=-2,
    )
    # camera: p_cam' = exp(w) R X + t + tau => d/dw = -[RX]x, d/dtau = I
    J_w = -jnp.einsum("pkab,pkbc->pkac", J_proj, skew_symmetric(RX), precision=_HI)
    J_tau = J_proj
    J_cam = jnp.concatenate([J_w, J_tau], axis=-1)  # (P, K, 2, 6)
    J_pt = jnp.einsum("pkab,pkbc->pkac", J_proj, R, precision=_HI)  # (P, K, 2, 3)

    w = problem.valid.astype(r.dtype)[..., None]
    return r * w, J_cam * w[..., None], J_pt * w[..., None]


def _schur_reduce(r, J_cam, J_pt, cam_idx, n_cams: int, lm_lambda):
    """Build the landmark-marginalized camera system.

    Returns S (C, C, 6, 6), rhs (C, 6), V_inv (P, 3, 3), b_p (P, 3),
    W (P, K, 6, 3). Everything except the final scatter target shapes is
    landmark-local — this function is the shard_map body for multi-chip BA
    (psum S and rhs afterwards).
    """
    # landmark blocks
    V = jnp.einsum("pkai,pkaj->pij", J_pt, J_pt, precision=_HI)
    V = V + lm_lambda * jnp.eye(3)
    V_inv = jnp.linalg.inv(V)
    b_p = -jnp.einsum("pkai,pka->pi", J_pt, r, precision=_HI)

    # camera blocks
    U_obs = jnp.einsum("pkai,pkaj->pkij", J_cam, J_cam, precision=_HI)
    b_obs = -jnp.einsum("pkai,pka->pki", J_cam, r, precision=_HI)
    W = jnp.einsum("pkai,pkaj->pkij", J_cam, J_pt, precision=_HI)  # (P, K, 6, 3)

    C = n_cams
    U = jnp.zeros((C, 6, 6)).at[cam_idx].add(U_obs)
    b_c = jnp.zeros((C, 6)).at[cam_idx].add(b_obs)

    # Schur cross terms: for each landmark, all (k, k') camera pairs
    WVi = jnp.einsum("pkij,pjl->pkil", W, V_inv, precision=_HI)  # (P, K, 6, 3)
    cross = jnp.einsum("pkil,pmjl->pkmij", WVi, W, precision=_HI)  # (P,K,K,6,6)
    S = jnp.zeros((C, C, 6, 6))
    P, K = cam_idx.shape
    ci = cam_idx[:, :, None]  # (P, K, 1)
    cj = cam_idx[:, None, :]  # (P, 1, K)
    S = S.at[jnp.broadcast_to(ci, (P, K, K)), jnp.broadcast_to(cj, (P, K, K))].add(
        -cross
    )
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U)

    rhs = b_c + jnp.zeros((C, 6)).at[cam_idx].add(
        -jnp.einsum("pkil,pl->pki", WVi, b_p, precision=_HI)
    )
    return S, rhs, V_inv, b_p, W


def _solve_cameras(S, rhs, cam_lambda, gauge_weight: float = 1e9):
    C = S.shape[0]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(cam_lambda * jnp.eye(6))
    S = S.at[0, 0].add(gauge_weight * jnp.eye(6))  # clamp camera 0
    S_dense = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    delta = jax.scipy.linalg.solve(
        S_dense + 1e-9 * jnp.eye(C * 6), rhs.reshape(-1), assume_a="pos"
    )
    return delta.reshape(C, 6)


def _apply_deltas(problem: BAProblem, d_cam, d_pts):
    dR = so3exp_map(d_cam[:, :3])
    R_new = jnp.einsum("cij,cjk->cik", dR, problem.R, precision=_HI)
    t_new = problem.t + d_cam[:, 3:]
    X_new = problem.X + d_pts
    return problem._replace(R=R_new, t=t_new, X=X_new)


def ba_cost(problem: BAProblem) -> jnp.ndarray:
    r, _, _ = residuals_and_jacobians(problem)
    return 0.5 * jnp.sum(r**2)


def ba_gn_step(problem: BAProblem, lm_lambda):
    """One damped Gauss-Newton (LM) step. Returns the updated problem."""
    r, J_cam, J_pt = residuals_and_jacobians(problem)
    C = problem.R.shape[0]
    S, rhs, V_inv, b_p, W = _schur_reduce(
        r, J_cam, J_pt, problem.cam_idx, C, lm_lambda
    )
    d_cam = _solve_cameras(S, rhs, lm_lambda)
    # back-substitute landmarks: dX = V^-1 (b_p - sum_k W^T d_cam[c_k])
    Wt_dc = jnp.einsum(
        "pkij,pki->pkj", W, d_cam[problem.cam_idx], precision=_HI
    ).sum(1)
    d_pts = jnp.einsum("pij,pj->pi", V_inv, b_p - Wt_dc, precision=_HI)
    return _apply_deltas(problem, d_cam, d_pts)


@partial(jax.jit, static_argnames=("iterations",))
def bundle_adjust(problem: BAProblem, iterations: int = 10,
                  init_lambda: float = 1e-3):
    """LM loop with accept/reject, fully inside jit.

    Returns (problem, final_cost, lambda)."""

    def body(state, _):
        prob, lam, cost = state
        new_prob = ba_gn_step(prob, lam)
        new_cost = ba_cost(new_prob)
        accept = new_cost < cost
        prob = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_prob, prob
        )
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e4)
        return (prob, lam, cost), cost

    cost0 = ba_cost(problem)
    (problem, lam, cost), _ = jax.lax.scan(
        body, (problem, jnp.asarray(init_lambda), cost0), None, length=iterations
    )
    return problem, cost, lam


def make_distributed_ba_step(mesh, axis: str = "data"):
    """Build a shard_map'd LM step: landmarks sharded over `axis`, the camera
    Schur system psum-reduced across devices, landmark updates shard-local.

    The caller shards X/cam_idx/uv/valid along the landmark axis and
    replicates cameras; the landmark count must divide the mesh size.
    """
    from jax.sharding import PartitionSpec as P

    def step(R, t, X, cam_idx, uv, valid, K_mat, lm_lambda):
        problem = BAProblem(R, t, X, cam_idx, uv, valid, K_mat)
        r, J_cam, J_pt = residuals_and_jacobians(problem)
        C = R.shape[0]
        S, rhs, V_inv, b_p, W = _schur_reduce(r, J_cam, J_pt, cam_idx, C, lm_lambda)
        S = jax.lax.psum(S, axis)  # camera Hessian reduction over ICI
        rhs = jax.lax.psum(rhs, axis)
        d_cam = _solve_cameras(S, rhs, lm_lambda)  # replicated solve
        Wt_dc = jnp.einsum("pkij,pki->pkj", W, d_cam[cam_idx], precision=_HI).sum(1)
        d_pts = jnp.einsum("pij,pj->pi", V_inv, b_p - Wt_dc, precision=_HI)
        dR = so3exp_map(d_cam[:, :3])
        R_new = jnp.einsum("cij,cjk->cik", dR, R, precision=_HI)
        return R_new, t + d_cam[:, 3:], X + d_pts

    # jax.shard_map (stable API; jax.experimental.shard_map is deprecated)
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P(),
        ),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )


__all__ = [
    "BAProblem", "bundle_adjust", "ba_gn_step", "ba_cost",
    "residuals_and_jacobians", "make_distributed_ba_step",
]
