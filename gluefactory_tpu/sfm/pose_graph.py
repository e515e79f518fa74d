"""Pose-graph optimization over SE(3).

SLAM backend (SURVEY §7 step 7): given relative-pose constraints between
keyframes, refine absolute poses by damped Gauss-Newton on the residual
log(T_ij_meas^-1 T_i T_j^-1) — batched over edges, dense solve over the
(small) keyframe set, fully inside jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.utils import so3exp_map

_HI = "highest"


def so3_log(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    trace = jnp.clip((jnp.einsum("...ii->...", R) - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    theta = jnp.arccos(trace)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    scale = jnp.where(theta < eps, 0.5, theta / (2 * jnp.sin(theta) + eps))
    return w * scale[..., None]


class PoseGraph(NamedTuple):
    R: jnp.ndarray  # (N, 3, 3) world->cam
    t: jnp.ndarray  # (N, 3)
    edges: jnp.ndarray  # (E, 2) int32 (i, j)
    R_ij: jnp.ndarray  # (E, 3, 3) measured i->j
    t_ij: jnp.ndarray  # (E, 3)
    weight: jnp.ndarray  # (E,)


def edge_residuals(graph: PoseGraph) -> jnp.ndarray:
    """6D residual per edge: [log(R_err), t_err] with
    T_err = T_meas_ij^-1 (T_j T_i^-1)."""
    i = graph.edges[:, 0]
    j = graph.edges[:, 1]
    Ri, ti = graph.R[i], graph.t[i]
    Rj, tj = graph.R[j], graph.t[j]
    # relative i->j from absolute world->cam: T_ij = T_j T_i^-1
    R_rel = jnp.einsum("eij,ekj->eik", Rj, Ri, precision=_HI)  # Rj Ri^T
    t_rel = tj - jnp.einsum("eij,ej->ei", R_rel, ti, precision=_HI)
    R_err = jnp.einsum("eji,ejk->eik", graph.R_ij, R_rel, precision=_HI)
    t_err = t_rel - graph.t_ij
    return jnp.concatenate([so3_log(R_err), t_err], axis=-1) * graph.weight[:, None]


def pg_cost(graph: PoseGraph) -> jnp.ndarray:
    r = edge_residuals(graph)
    return 0.5 * jnp.sum(r**2)


def _pg_step(graph: PoseGraph, lam):
    """Damped GN step with numerically-evaluated Jacobians wrt the 6N pose
    deltas (left-multiplicative [omega, tau] per node). N is small (keyframe
    graph), so autodiff of the full residual vector is cheap and exact."""
    N = graph.R.shape[0]

    def residual_of_deltas(deltas):
        dR = so3exp_map(deltas[:, :3])
        R = jnp.einsum("nij,njk->nik", dR, graph.R, precision=_HI)
        t = graph.t + deltas[:, 3:]
        return edge_residuals(graph._replace(R=R, t=t)).reshape(-1)

    deltas0 = jnp.zeros((N, 6))
    r0 = residual_of_deltas(deltas0)
    J = jax.jacfwd(residual_of_deltas)(deltas0).reshape(len(r0), N * 6)
    H = jnp.matmul(J.T, J, precision=_HI) + lam * jnp.eye(N * 6)
    # gauge: clamp node 0
    H = H.at[:6, :6].add(1e9 * jnp.eye(6))
    g = -jnp.matmul(J.T, r0, precision=_HI)
    delta = jax.scipy.linalg.solve(H, g, assume_a="pos").reshape(N, 6)
    dR = so3exp_map(delta[:, :3])
    R = jnp.einsum("nij,njk->nik", dR, graph.R, precision=_HI)
    t = graph.t + delta[:, 3:]
    return graph._replace(R=R, t=t)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(graph: PoseGraph, iterations: int = 10,
                        init_lambda: float = 1e-4):
    """LM loop; returns (graph, cost)."""

    def body(state, _):
        g, lam, cost = state
        g_new = _pg_step(g, lam)
        c_new = pg_cost(g_new)
        accept = c_new < cost
        g = jax.tree.map(lambda a, b: jnp.where(accept, a, b), g_new, g)
        cost = jnp.where(accept, c_new, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e4)
        return (g, lam, cost), cost

    (graph, _, cost), _ = jax.lax.scan(
        body, (graph, jnp.asarray(init_lambda), pg_cost(graph)), None,
        length=iterations,
    )
    return graph, cost


__all__ = ["PoseGraph", "optimize_pose_graph", "pg_cost", "edge_residuals", "so3_log"]
