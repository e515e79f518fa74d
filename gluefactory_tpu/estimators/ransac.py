"""Batched RANSAC primitives on TPU.

TPU-native replacement for the reference's C++ RANSAC backends (PoseLib /
OpenCV / pycolmap, SURVEY §2.7): instead of sequential hypothesize-and-verify
with adaptive termination, we draw a FIXED budget of K minimal samples, solve
all minimal problems in one vmapped batch (tiny eigenproblems on the MXU/VPU),
score all K x N residuals with one matmul-shaped pass, pick the best model and
locally optimize it with a few IRLS steps (LO-RANSAC). Fixed shapes, no host
sync, trivially vmappable over image pairs — the threshold sweep of the evals
(reference eval/hpatches.py:118-124 loops thresholds sequentially) becomes one
extra batch axis.

Solvers:
  - homography: 4-point normalized DLT (shared with geometry.solve_homography_dlt)
  - essential matrix: 8-point algorithm + rank-2/equal-singular projection,
    cheirality-checked decomposition into (R, t)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.epipolar import decompose_essential_matrix
from ..geometry.homography import solve_homography_dlt, warp_points
from ..geometry.utils import to_homogeneous

_HI = "highest"


def sample_minimal_indices(key, valid, num_hypotheses: int, sample_size: int):
    """Sample `num_hypotheses` index sets of `sample_size` distinct valid
    correspondences via the Gumbel-top-k trick (vectorized, no rejection)."""
    n = valid.shape[-1]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    scores = g + jnp.where(valid, 0.0, -1e9)[None, :]
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx  # (K, S)


def homography_residuals(kpts0, kpts1, H):
    """Symmetric transfer error per correspondence: H (..., 3, 3),
    kpts (..., N, 2) -> (..., N)."""
    d01 = jnp.sum((warp_points(kpts0, H) - kpts1) ** 2, axis=-1)
    d10 = jnp.sum((warp_points(kpts1, H, inverse=True) - kpts0) ** 2, axis=-1)
    err = 0.5 * (jnp.sqrt(jnp.maximum(d01, 0)) + jnp.sqrt(jnp.maximum(d10, 0)))
    return jnp.where(jnp.isfinite(err), err, 1e9)


class RansacResult(NamedTuple):
    model: jnp.ndarray  # (3, 3) H or E
    inliers: jnp.ndarray  # (N,) bool
    score: jnp.ndarray  # scalar inlier count (MSAC score)
    success: jnp.ndarray  # bool


def _msac_score(err, th, valid):
    """Truncated-quadratic (MSAC) score: sum over valid of max(0, 1-(e/th)^2)."""
    w = jnp.maximum(0.0, 1.0 - (err / th) ** 2) * valid
    return jnp.sum(w, axis=-1)


def ransac_homography(
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    th: float = 3.0,
    num_hypotheses: int = 1024,
    refine_iters: int = 3,
    guided_rounds: int = 1,
) -> RansacResult:
    """Single-pair batched RANSAC for a homography. All args unbatched
    (N, 2) / (N,); vmap for pairs.

    `guided_rounds`: like the E estimator — after the uniform round, re-draw
    hypotheses weighted by the current best model's soft-inlier weights. A
    4-point all-inlier draw has probability inlier_rate^4, so the uniform
    round degrades past ~60% outliers at fixed K; the enriched second round
    restores it (r2 gap vs OpenCV at 60-70% outliers, docs/ransac_comparison.md)."""
    valid_f = valid.astype(jnp.float32)
    n_cand = 12
    # annealed LO thresholds: coarse-to-fine then polish at 1x (the E
    # estimator's scheme; a fixed tight threshold locks onto overfit minimal
    # models at high outlier rates)
    multipliers = [4.0, 2.0] + [1.0] * max(refine_iters, 2)

    def candidates_from(idx):
        Hs = solve_homography_dlt(kpts0[idx], kpts1[idx])  # (K, 3, 3)
        errs = homography_residuals(kpts0[None], kpts1[None], Hs)  # (K, N)
        # multi-candidate LO: top-4 per selection scale, batched IRLS
        cand_parts = []
        for mult in (1.0, 2.0, 4.0):
            cand_parts.append(
                jax.lax.top_k(_msac_score(errs, th * mult, valid_f[None]), 4)[1]
            )
        H_cand = Hs[jnp.concatenate(cand_parts)]  # (C, 3, 3)

        def refine(H, mult):
            t = th * mult
            err = homography_residuals(kpts0[None], kpts1[None], H)  # (C, N)
            w = jnp.maximum(0.0, 1.0 - (err / t) ** 2) * valid_f[None]
            H_new = solve_homography_dlt(
                jnp.broadcast_to(kpts0[None], (n_cand,) + kpts0.shape),
                jnp.broadcast_to(kpts1[None], (n_cand,) + kpts1.shape),
                w,
            )
            old = _msac_score(err, t, valid_f[None])
            new = _msac_score(
                homography_residuals(kpts0[None], kpts1[None], H_new), t, valid_f[None]
            )
            ok = (new >= old) & jnp.all(jnp.isfinite(H_new), axis=(-1, -2))
            return jnp.where(ok[:, None, None], H_new, H), None

        H_cand, _ = jax.lax.scan(refine, H_cand, jnp.asarray(multipliers))
        return H_cand

    key, k0 = jax.random.split(key)
    idx = sample_minimal_indices(k0, valid, num_hypotheses, 4)  # (K, 4)
    H_all = candidates_from(idx)

    for _ in range(guided_rounds):
        errs_all = homography_residuals(kpts0[None], kpts1[None], H_all)
        scores_all = _msac_score(errs_all, th, valid_f[None])
        err_best = errs_all[jnp.argmax(scores_all)]
        # soft inlier log-weights at a relaxed threshold; floor keeps the
        # distribution proper when the first round found nothing
        w_guide = jnp.maximum(0.0, 1.0 - (err_best / (2.0 * th)) ** 2) * valid_f
        logw = jnp.log(w_guide + 1e-4) + jnp.where(valid, 0.0, -1e9)
        key, kg = jax.random.split(key)
        idx_g = sample_weighted_indices(kg, logw, num_hypotheses, 4)
        H_all = jnp.concatenate([H_all, candidates_from(idx_g)], axis=0)

    final_errs = homography_residuals(kpts0[None], kpts1[None], H_all)
    best = jnp.argmax(_msac_score(final_errs, th, valid_f[None]))
    H = H_all[best]
    err = final_errs[best]
    inliers = (err < th) & valid
    success = jnp.sum(inliers) >= 4
    return RansacResult(H, inliers, jnp.sum(inliers.astype(jnp.float32)), success)


# --------------------------------------------------------------------------
# essential matrix / relative pose
# --------------------------------------------------------------------------


def _hartley_transform(p, weights=None):
    """Hartley conditioning: zero-(weighted-)mean, mean distance sqrt(2).
    Returns (p_normalized, T) with T the 3x3 transform in homogeneous coords.
    Essential for fp32 eigensolves on TPU, whose iterative eigh loses the
    smallest-eigenvector direction on ill-conditioned A^T A."""
    if weights is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    else:
        w = weights
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    mean = jnp.sum(p * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    d = jnp.linalg.norm(p - mean, axis=-1)
    scale = jnp.sum(d * w, axis=-1, keepdims=True) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(scale, 1e-8)  # (..., 1)
    pn = (p - mean) * s[..., None]
    z = jnp.zeros_like(s[..., 0])
    o = jnp.ones_like(z)
    T = jnp.stack(
        [
            s[..., 0], z, -s[..., 0] * mean[..., 0, 0],
            z, s[..., 0], -s[..., 0] * mean[..., 0, 1],
            z, z, o,
        ],
        axis=-1,
    ).reshape(p.shape[:-2] + (3, 3))
    return pn, T


def _eight_point(p0n, p1n, weights=None):
    """(Weighted) 8-point algorithm on normalized image coords.

    p0n, p1n: (..., N, 2). Hartley-conditioned solve of the epipolar
    constraint, denormalized, then projected onto the essential manifold
    (equal singular values, rank 2). Returns (..., 3, 3).
    """
    p0c, T0 = _hartley_transform(p0n, weights)
    p1c, T1 = _hartley_transform(p1n, weights)
    x0, y0 = p0c[..., 0], p0c[..., 1]
    x1, y1 = p1c[..., 0], p1c[..., 1]
    one = jnp.ones_like(x0)
    # rows of A: x1 F x0 = 0 with F row-major
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one], axis=-1
    )  # (..., N, 9)
    if weights is not None:
        A = A * weights[..., None]
    from ..ops.linalg import smallest_eigenvector

    AtA = jnp.matmul(jnp.swapaxes(A, -1, -2), A, precision=_HI)
    F = smallest_eigenvector(AtA).reshape(AtA.shape[:-2] + (3, 3))
    # denormalize: x1c = T1 x1 => x1^T (T1^T F T0) x0 = 0
    E = jnp.matmul(
        jnp.matmul(jnp.swapaxes(T1, -1, -2), F, precision=_HI), T0, precision=_HI
    )
    # project to essential manifold (batched Jacobi 3x3 SVD, ops/linalg.py)
    from ..ops.linalg import svd3x3

    U, s, Vt = svd3x3(E)
    sigma = (s[..., 0] + s[..., 1]) / 2.0
    S = jnp.stack([sigma, sigma, jnp.zeros_like(sigma)], axis=-1)
    E = jnp.matmul(U * S[..., None, :], Vt, precision=_HI)
    return E


def sampson_distance(p0n, p1n, E):
    """First-order geometric (Sampson) distance in normalized coords:
    (..., N) for E (..., 3, 3), points (..., N, 2)."""
    p0h = to_homogeneous(p0n)
    p1h = to_homogeneous(p1n)
    Ep0 = jnp.einsum("...ij,...nj->...ni", E, p0h, precision=_HI)
    Etp1 = jnp.einsum("...ji,...nj->...ni", E, p1h, precision=_HI)
    num = jnp.einsum("...ni,...ni->...n", p1h, Ep0, precision=_HI) ** 2
    den = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    d = num / jnp.maximum(den, 1e-12)
    return jnp.where(jnp.isfinite(d), d, 1e9)


def _triangulate_depths(p0n, p1n, R, t):
    """Depths of points for pose (R, t): x1 ~ R x0 z0 + t. Returns (z0, z1)."""
    x0 = to_homogeneous(p0n)  # (..., N, 3)
    x1 = to_homogeneous(p1n)
    Rx0 = jnp.einsum("...ij,...nj->...ni", R, x0, precision=_HI)
    # z0 minimizes || [x1]x (z0 Rx0 + t) ||^2
    c = jnp.cross(x1, Rx0)  # [x1]x Rx0
    d = jnp.cross(x1, jnp.broadcast_to(t[..., None, :], x1.shape))
    z0 = -jnp.sum(c * d, axis=-1) / jnp.maximum(jnp.sum(c * c, axis=-1), 1e-12)
    p3d1 = Rx0 * z0[..., None] + t[..., None, :]
    z1 = p3d1[..., 2]
    return z0, z1


def decompose_and_choose(E, p0n, p1n, valid):
    """All 4 (R, t) candidates of E; pick the one with max cheirality count
    (reference uses cv2.recoverPose / poselib internally; here it's batched)."""
    R1, R2, t = decompose_essential_matrix(E)
    candidates = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts, results = [], []
    for R, tc in candidates:
        z0, z1 = _triangulate_depths(p0n, p1n, R, tc)
        good = (z0 > 0) & (z1 > 0) & valid
        counts.append(jnp.sum(good.astype(jnp.int32), axis=-1))
        results.append((R, tc, good))
    counts = jnp.stack(counts, axis=-1)  # (..., 4)
    best = jnp.argmax(counts, axis=-1)
    Rs = jnp.stack([r for r, _, _ in results], axis=-3)
    ts = jnp.stack([t_ for _, t_, _ in results], axis=-2)
    cheis = jnp.stack([g for _, _, g in results], axis=-2)
    R = jnp.take_along_axis(Rs, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t_best = jnp.take_along_axis(ts, best[..., None, None], axis=-2)[..., 0, :]
    chei = jnp.take_along_axis(cheis, best[..., None, None], axis=-2)[..., 0, :]
    return R, t_best, chei


class RelPoseResult(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    E: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) bool
    score: jnp.ndarray
    success: jnp.ndarray


def sample_weighted_indices(key, logw: jnp.ndarray, num_hypotheses: int, m: int):
    """Weighted minimal-sample draw via Gumbel-top-k: each hypothesis picks m
    indices with probability proportional to exp(logw) without replacement."""
    g = jax.random.gumbel(key, (num_hypotheses, logw.shape[0]))
    return jax.lax.top_k(logw[None] + g, m)[1]


def ransac_relative_pose(
    p0n: jnp.ndarray,
    p1n: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    th: float = 1e-3,
    num_hypotheses: int = 1024,
    refine_iters: int = 3,
    guided_rounds: int = 1,
) -> RelPoseResult:
    """Batched RANSAC for the essential matrix on NORMALIZED image coords.

    th is in normalized units (pixel_th / mean_focal, like the reference
    opencv backend, robust_estimators/relative_pose/opencv.py:30-43).
    Single pair; vmap over pairs.

    `guided_rounds`: after the uniform round, re-draw hypotheses with
    sampling weighted by the current best model's soft-inlier weights
    (inner/guided RANSAC). The 8-point minimal sample needs all-inlier draws
    with probability inlier_rate^8 — hopeless beyond ~60% outliers at fixed
    K — but even a mediocre first-round model's inlier set is strongly
    enriched, so one guided round restores the high-outlier regime
    (measured: 70%-outlier median pose error 25deg -> ~1deg, see
    docs/ransac_comparison.md).
    """
    valid_f = valid.astype(jnp.float32)
    th2 = th * th
    n_cand = 12
    # annealed threshold multipliers: coarse-to-fine, then polish at 1x
    multipliers = [16.0, 8.0, 4.0, 2.0] + [1.0] * max(refine_iters, 2)

    def candidates_from(idx):
        """Minimal solves + multi-scale candidate selection + annealed LO.

        Hypothesis selection happens at RELAXED thresholds: minimal 8-point
        estimates are noisy, so a tight threshold locks onto models that
        overfit few points; the top-4 at each of three scales are refined in
        parallel (LO from a single seed occasionally converges to a local
        optimum — seed-variance robustness)."""
        Es = _eight_point(p0n[idx], p1n[idx])  # (K, 3, 3)
        errs = sampson_distance(p0n[None], p1n[None], Es)  # (K, N)
        cand_parts = []
        for mult in (1.0, 4.0, 16.0):
            w = jnp.maximum(0.0, 1.0 - errs / (mult * th2)) * valid_f[None]
            cand_parts.append(jax.lax.top_k(jnp.sum(w, axis=-1), 4)[1])
        E_cand = Es[jnp.concatenate(cand_parts)]  # (C, 3, 3)

        def refine(E, mult):
            # E: (C, 3, 3); all candidates refined in one batched solve
            t2 = th2 * mult
            err = sampson_distance(p0n[None], p1n[None], E)  # (C, N)
            w = jnp.maximum(0.0, 1.0 - err / t2) * valid_f[None]
            E_new = _eight_point(
                jnp.broadcast_to(p0n[None], (n_cand,) + p0n.shape),
                jnp.broadcast_to(p1n[None], (n_cand,) + p1n.shape),
                w,
            )
            old = jnp.sum(w, axis=-1)
            new_err = sampson_distance(p0n[None], p1n[None], E_new)
            new = jnp.sum(
                jnp.maximum(0.0, 1.0 - new_err / t2) * valid_f[None], axis=-1
            )
            ok = (new >= old) & jnp.all(jnp.isfinite(E_new), axis=(-1, -2))
            return jnp.where(ok[:, None, None], E_new, E), None

        E_cand, _ = jax.lax.scan(refine, E_cand, jnp.asarray(multipliers))
        return E_cand

    key, k0 = jax.random.split(key)
    idx = sample_minimal_indices(k0, valid, num_hypotheses, 8)
    E_all = candidates_from(idx)

    for _ in range(guided_rounds):
        errs_all = sampson_distance(p0n[None], p1n[None], E_all)
        scores_all = jnp.sum(
            jnp.maximum(0.0, 1.0 - errs_all / th2) * valid_f[None], axis=-1
        )
        err_best = errs_all[jnp.argmax(scores_all)]
        # soft inlier log-weights at a relaxed threshold; floor keeps the
        # distribution proper when the first round found nothing
        w_guide = jnp.maximum(0.0, 1.0 - err_best / (4.0 * th2)) * valid_f
        logw = jnp.log(w_guide + 1e-4) + jnp.where(valid, 0.0, -1e9)
        key, kg = jax.random.split(key)
        idx_g = sample_weighted_indices(kg, logw, num_hypotheses, 8)
        E_all = jnp.concatenate([E_all, candidates_from(idx_g)], axis=0)

    # final selection at the true threshold over every refined candidate
    final_errs = sampson_distance(p0n[None], p1n[None], E_all)
    final_scores = jnp.sum(
        jnp.maximum(0.0, 1.0 - final_errs / th2) * valid_f[None], axis=-1
    )
    best = jnp.argmax(final_scores)
    E_cand = E_all
    E = E_cand[best]
    err = final_errs[best]
    inliers = (err < th2) & valid
    R, t, chei = decompose_and_choose(E, p0n, p1n, inliers)
    inliers = inliers & chei
    success = jnp.sum(inliers) >= 8
    return RelPoseResult(
        R, t, E, inliers, jnp.sum(inliers.astype(jnp.float32)), success
    )


# jitted entries: th is traced (threshold sweeps reuse one program),
# hypothesis counts / refine iters are static.
ransac_homography_jit = jax.jit(
    ransac_homography,
    static_argnames=("num_hypotheses", "refine_iters", "guided_rounds")
)
ransac_relative_pose_jit = jax.jit(
    ransac_relative_pose,
    static_argnames=("num_hypotheses", "refine_iters", "guided_rounds")
)


__all__ = [
    "ransac_homography",
    "ransac_homography_jit",
    "ransac_relative_pose_jit",
    "ransac_relative_pose",
    "sample_minimal_indices",
    "homography_residuals",
    "sampson_distance",
    "RansacResult",
    "RelPoseResult",
]


# --------------------------------------------------------------------------
# hybrid point + line homography (counterpart of the reference's C++
# homography_est backend used for GlueStick eval, SURVEY §2.7)
# --------------------------------------------------------------------------


def line_homography_residuals(lines0, lines1, H):
    """Perpendicular line-transfer error: warp the endpoints of l0 by H and
    measure their distance to the infinite line of l1 (symmetrized by the
    reverse direction). lines: (..., L, 2, 2); H: (..., 3, 3) -> (..., L)."""

    def endpoint_to_line_dist(segs_w, segs_ref):
        # segs_w endpoints vs the line equation of segs_ref
        p0 = segs_ref[..., 0, :]
        p1 = segs_ref[..., 1, :]
        d = p1 - p0
        norm = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-8)
        nvec = jnp.stack([-d[..., 1], d[..., 0]], -1) / norm[..., None]
        off0 = jnp.sum((segs_w[..., 0, :] - p0) * nvec, axis=-1)
        off1 = jnp.sum((segs_w[..., 1, :] - p0) * nvec, axis=-1)
        return (jnp.abs(off0) + jnp.abs(off1)) / 2

    L = lines0.shape[-3]
    flat0 = lines0.reshape(lines0.shape[:-3] + (2 * L, 2))
    flat1 = lines1.reshape(lines1.shape[:-3] + (2 * L, 2))
    w01 = warp_points(flat0, H)
    w01 = w01.reshape(w01.shape[:-2] + (L, 2, 2))
    w10 = warp_points(flat1, H, inverse=True)
    w10 = w10.reshape(w10.shape[:-2] + (L, 2, 2))
    err = 0.5 * (
        endpoint_to_line_dist(w01, lines1) + endpoint_to_line_dist(w10, lines0)
    )
    return jnp.where(jnp.isfinite(err), err, 1e9)


def ransac_homography_point_line(
    kpts0, kpts1, valid_pts,
    lines0, lines1, valid_lines,
    key, th: float = 3.0, line_th: float | None = None,
    num_hypotheses: int = 1024, refine_iters: int = 3,
):
    """Hybrid RANSAC: hypotheses from 4-point samples augmented with
    line-endpoint correspondences as virtual points; MSAC scoring sums point
    and line support; LO refits on point inliers + line endpoints of line
    inliers. Single pair; vmap over pairs. Returns (RansacResult,
    line_inliers)."""
    line_th = th if line_th is None else line_th
    L = lines0.shape[0]
    # endpoints as virtual correspondences (direction-resolved by nearest
    # pairing under the current best model during LO; for sampling we use
    # the given endpoint order)
    ep0 = lines0.reshape(2 * L, 2)
    ep1 = lines1.reshape(2 * L, 2)
    ep_valid = jnp.repeat(valid_lines, 2)
    all0 = jnp.concatenate([kpts0, ep0], 0)
    all1 = jnp.concatenate([kpts1, ep1], 0)
    all_valid = jnp.concatenate([valid_pts, ep_valid], 0)

    idx = sample_minimal_indices(key, all_valid, num_hypotheses, 4)
    Hs = solve_homography_dlt(all0[idx], all1[idx])

    pt_errs = homography_residuals(kpts0[None], kpts1[None], Hs)
    ln_errs = line_homography_residuals(lines0[None], lines1[None], Hs)
    scores = _msac_score(pt_errs, th, valid_pts.astype(jnp.float32)[None])
    scores = scores + _msac_score(
        ln_errs, line_th, valid_lines.astype(jnp.float32)[None]
    )
    best = jnp.argmax(scores)
    H = Hs[best]

    def refine(H, _):
        perr = homography_residuals(kpts0, kpts1, H[None])[0]
        lerr = line_homography_residuals(lines0, lines1, H[None])[0]
        wp = jnp.maximum(0.0, 1.0 - (perr / th) ** 2) * valid_pts
        wl = jnp.maximum(0.0, 1.0 - (lerr / line_th) ** 2) * valid_lines
        w_all = jnp.concatenate([wp, jnp.repeat(wl, 2)], 0)
        H_new = solve_homography_dlt(all0[None], all1[None], w_all[None])[0]
        old = _msac_score(perr[None], th, valid_pts[None].astype(jnp.float32))[0] + \
            _msac_score(lerr[None], line_th, valid_lines[None].astype(jnp.float32))[0]
        p2 = homography_residuals(kpts0, kpts1, H_new[None])[0]
        l2 = line_homography_residuals(lines0, lines1, H_new[None])[0]
        new = _msac_score(p2[None], th, valid_pts[None].astype(jnp.float32))[0] + \
            _msac_score(l2[None], line_th, valid_lines[None].astype(jnp.float32))[0]
        H = jnp.where((new >= old) & jnp.all(jnp.isfinite(H_new)), H_new, H)
        return H, None

    H, _ = jax.lax.scan(refine, H, None, length=refine_iters)

    perr = homography_residuals(kpts0, kpts1, H[None])[0]
    lerr = line_homography_residuals(lines0, lines1, H[None])[0]
    pt_inl = (perr < th) & valid_pts
    ln_inl = (lerr < line_th) & valid_lines
    success = (jnp.sum(pt_inl) + 2 * jnp.sum(ln_inl)) >= 4
    result = RansacResult(
        H, pt_inl, jnp.sum(pt_inl.astype(jnp.float32)) + jnp.sum(ln_inl), success
    )
    return result, ln_inl
