"""Ground-truth match generation for supervision.

Counterpart of reference gluefactory/geometry/gt_generation.py:14-161.
Labels per keypoint: index of its match, UNMATCHED (-1), or IGNORE (-2)
(gt_generation.py:9-10). TPU adaptation: every function takes optional
`valid0/valid1` padding masks (static-shape keypoint sets); padded entries are
labeled IGNORE and removed from the distance matrices, which is the
fixed-shape equivalent of the reference's variable-length batches.

The reference's Hungarian-based *line* GT (gt_generation.py:207-558, scipy
linear_sum_assignment on CPU) is intentionally replaced by the same
mutual-nearest scheme used for points when line support is added — see
models/matchers docs.
"""

from __future__ import annotations

import jax.numpy as jnp

from .depth import project, sample_depth
from .epipolar import T_to_F, sym_epipolar_distance_all
from .homography import warp_points

IGNORE_FEATURE = -2
UNMATCHED_FEATURE = -1

_INF = 1e12


def _mutual_assignment(dist, pos_th):
    """Mutual-minimum positives below threshold from a squared-distance matrix."""
    m, n = dist.shape[-2:]
    min0 = jnp.argmin(dist, axis=-1)  # (..., M)
    min1 = jnp.argmin(dist, axis=-2)  # (..., N)
    ismin0 = jnp.arange(n)[None, :] == min0[..., :, None]  # col j is row i's argmin
    ismin1 = jnp.arange(m)[:, None] == min1[..., None, :]  # row i is col j's argmin
    positive = ismin0 & ismin1 & (dist < pos_th**2)
    return positive, min0, min1


def _pack_matches(positive, min0, min1, negative0, negative1, valid0, valid1):
    m0 = jnp.where(jnp.any(positive, axis=-1), min0, IGNORE_FEATURE)
    m1 = jnp.where(jnp.any(positive, axis=-2), min1, IGNORE_FEATURE)
    m0 = jnp.where(negative0, UNMATCHED_FEATURE, m0)
    m1 = jnp.where(negative1, UNMATCHED_FEATURE, m1)
    if valid0 is not None:
        m0 = jnp.where(valid0, m0, IGNORE_FEATURE)
    if valid1 is not None:
        m1 = jnp.where(valid1, m1, IGNORE_FEATURE)
    return m0.astype(jnp.int32), m1.astype(jnp.int32)


def gt_matches_from_homography(
    kp0, kp1, H, pos_th: float = 3.0, neg_th: float = 6.0,
    valid0=None, valid1=None, **kw
):
    """GT matches by warping keypoints with the pair homography
    (gt_generation.py:110-161 semantics)."""
    kp0_1 = warp_points(kp0, H)
    kp1_0 = warp_points(kp1, H, inverse=True)

    dist0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, axis=-1)
    dist1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, axis=-1)
    dist = jnp.maximum(dist0, dist1)

    if valid0 is not None:
        dist = jnp.where(valid0[..., :, None], dist, _INF)
        dist0 = jnp.where(valid0[..., :, None], dist0, _INF)
    if valid1 is not None:
        dist = jnp.where(valid1[..., None, :], dist, _INF)
        dist1 = jnp.where(valid1[..., None, :], dist1, _INF)

    reward = (dist < pos_th**2).astype(jnp.float32) - (dist > neg_th**2).astype(
        jnp.float32
    )

    positive, min0, min1 = _mutual_assignment(dist, pos_th)
    negative0 = jnp.min(dist0, axis=-1) > neg_th**2
    negative1 = jnp.min(dist1, axis=-2) > neg_th**2
    m0, m1 = _pack_matches(positive, min0, min1, negative0, negative1, valid0, valid1)

    return {
        "assignment": positive,
        "reward": reward,
        "matches0": m0,
        "matches1": m1,
        "matching_scores0": (m0 > -1).astype(jnp.float32),
        "matching_scores1": (m1 > -1).astype(jnp.float32),
        "proj_0to1": kp0_1,
        "proj_1to0": kp1_0,
    }


def gt_matches_from_pose_depth(
    kp0, kp1, data, pos_th: float = 3.0, neg_th: float = 5.0,
    epi_th: float | None = None, cc_th: float | None = None,
    valid0=None, valid1=None, **kw
):
    """GT matches by reprojecting keypoints through depth + relative pose
    (gt_generation.py:14-106 semantics): mutual-min positives under the max of
    forward/backward reprojection distance, UNMATCHED for far points with
    valid depth, IGNORE otherwise; optional epipolar extra negatives for
    points without valid depth.

    `data` needs: view0/view1 cameras, T_0to1, T_1to0, and either dense depth
    maps (view0/view1 "depth") or precomputed keypoint depths in `kw`
    (depth_keypoints0/1 + valid_depth_keypoints0/1, the feature-cache path).
    """
    camera0, camera1 = data["view0"]["camera"], data["view1"]["camera"]
    T_0to1, T_1to0 = data["T_0to1"], data["T_1to0"]
    depth0 = data["view0"].get("depth")
    depth1 = data["view1"].get("depth")

    if "depth_keypoints0" in kw and "depth_keypoints1" in kw:
        d0, valid_d0 = kw["depth_keypoints0"], kw["valid_depth_keypoints0"]
        d1, valid_d1 = kw["depth_keypoints1"], kw["valid_depth_keypoints1"]
    else:
        d0, valid_d0 = sample_depth(kp0, depth0)
        d1, valid_d1 = sample_depth(kp1, depth1)

    if valid0 is not None:
        valid_d0 = valid_d0 & valid0
    if valid1 is not None:
        valid_d1 = valid_d1 & valid1

    kp0_1, visible0 = project(kp0, d0, depth1, camera0, camera1, T_0to1, valid_d0, ccth=cc_th)
    kp1_0, visible1 = project(kp1, d1, depth0, camera1, camera0, T_1to0, valid_d1, ccth=cc_th)
    mask_visible = visible0[..., :, None] & visible1[..., None, :]

    dist0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, axis=-1)
    dist1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, axis=-1)
    dist = jnp.maximum(dist0, dist1)
    dist = jnp.where(mask_visible, dist, _INF)

    positive, min0, min1 = _mutual_assignment(dist, pos_th)
    negative0 = (jnp.min(dist0, axis=-1) > neg_th**2) & valid_d0
    negative1 = (jnp.min(dist1, axis=-2) > neg_th**2) & valid_d1
    m0, m1 = _pack_matches(positive, min0, min1, negative0, negative1, valid0, valid1)

    F = T_to_F(camera0, camera1, T_0to1)
    epi_dist = sym_epipolar_distance_all(kp0, kp1, F)

    if epi_th is not None:
        # points without depth that are far from all epipolar lines are
        # confidently unmatched (gt_generation.py:85-91)
        mask_ignore = (m0[..., :, None] == IGNORE_FEATURE) & (
            m1[..., None, :] == IGNORE_FEATURE
        )
        epi_masked = jnp.where(mask_ignore, epi_dist, _INF)
        exclude0 = jnp.min(epi_masked, axis=-1) > neg_th
        exclude1 = jnp.min(epi_masked, axis=-2) > neg_th
        m0 = jnp.where((~valid_d0) & exclude0, UNMATCHED_FEATURE, m0)
        m1 = jnp.where((~valid_d1) & exclude1, UNMATCHED_FEATURE, m1)
        if valid0 is not None:
            m0 = jnp.where(valid0, m0, IGNORE_FEATURE)
        if valid1 is not None:
            m1 = jnp.where(valid1, m1, IGNORE_FEATURE)

    return {
        "assignment": positive,
        "reward": (dist < pos_th**2).astype(jnp.float32)
        - (epi_dist > neg_th).astype(jnp.float32),
        "matches0": m0,
        "matches1": m1,
        "matching_scores0": (m0 > -1).astype(jnp.float32),
        "matching_scores1": (m1 > -1).astype(jnp.float32),
        "depth_keypoints0": d0,
        "depth_keypoints1": d1,
        "proj_0to1": kp0_1,
        "proj_1to0": kp1_0,
        "visible0": visible0,
        "visible1": visible1,
    }


def _line_dist(a, bl):
    """Direction-min mean endpoint distance between line sets.

    a: (..., La, 2, 2), bl: (..., Lb, 2, 2) -> (..., La, Lb)."""
    d_same = (
        jnp.linalg.norm(a[..., :, None, 0, :] - bl[..., None, :, 0, :], axis=-1)
        + jnp.linalg.norm(a[..., :, None, 1, :] - bl[..., None, :, 1, :], axis=-1)
    ) / 2
    d_flip = (
        jnp.linalg.norm(a[..., :, None, 0, :] - bl[..., None, :, 1, :], axis=-1)
        + jnp.linalg.norm(a[..., :, None, 1, :] - bl[..., None, :, 0, :], axis=-1)
    ) / 2
    return jnp.minimum(d_same, d_flip)


def gt_line_matches_from_homography(
    lines0, lines1, H, pos_th: float = 5.0, neg_th: float = 10.0,
    valid0=None, valid1=None,
):
    """GT line matches by endpoint warping.

    The reference labels lines with sampled points + Hungarian assignment on
    CPU (gt_generation.py:207-406, scipy linear_sum_assignment). TPU
    re-design: the line-to-line distance is the direction-min mean endpoint
    symmetric transfer distance, and assignment is mutual-min + threshold —
    the same scheme as points, fully batched and jit-able. lines: (B, L, 2, 2).
    """
    b, L0 = lines0.shape[:2]
    L1 = lines1.shape[1]
    ep0_1 = warp_points(lines0.reshape(b, -1, 2), H).reshape(b, L0, 2, 2)
    ep1_0 = warp_points(lines1.reshape(b, -1, 2), H, inverse=True).reshape(b, L1, 2, 2)

    dist0 = _line_dist(ep0_1, lines1)
    dist1 = _line_dist(lines0, ep1_0)
    dist = jnp.maximum(dist0, dist1)
    if valid0 is not None:
        dist = jnp.where(valid0[..., :, None], dist, _INF)
    if valid1 is not None:
        dist = jnp.where(valid1[..., None, :], dist, _INF)

    positive, min0, min1 = _mutual_assignment(dist**2, pos_th)
    negative0 = jnp.min(dist0, axis=-1) > neg_th
    negative1 = jnp.min(dist1, axis=-2) > neg_th
    m0, m1 = _pack_matches(positive, min0, min1, negative0, negative1, valid0, valid1)
    return {
        "line_assignment": positive,
        "line_matches0": m0,
        "line_matches1": m1,
        "line_matching_scores0": (m0 > -1).astype(jnp.float32),
        "line_matching_scores1": (m1 > -1).astype(jnp.float32),
    }


def gt_line_matches_from_pose_depth(
    lines0, lines1, data, pos_th: float = 5.0, neg_th: float = 10.0,
    valid0=None, valid1=None,
):
    """GT line matches by reprojecting endpoints through depth + pose.

    The reference samples points along each line, reprojects them, and solves
    a Hungarian assignment on CPU (gt_generation.py:410-558). TPU re-design:
    reproject the two endpoints (depth-sampled, cycle-checked like point GT),
    score candidate pairs with the direction-min mean endpoint distance, and
    assign by mutual-min + threshold — fixed-shape and jit-able. A line is
    labeled only if both endpoints have valid depth and survive the
    visibility check; otherwise it is IGNORE unless confidently far
    (UNMATCHED). lines: (B, L, 2, 2) in image coordinates.
    """
    camera0, camera1 = data["view0"]["camera"], data["view1"]["camera"]
    T_0to1, T_1to0 = data["T_0to1"], data["T_1to0"]
    depth0 = data["view0"]["depth"]
    depth1 = data["view1"]["depth"]

    b, L0 = lines0.shape[:2]
    L1 = lines1.shape[1]
    ep0 = lines0.reshape(b, -1, 2)
    ep1 = lines1.reshape(b, -1, 2)
    d0, valid_d0 = sample_depth(ep0, depth0)
    d1, valid_d1 = sample_depth(ep1, depth1)
    ep0_1, vis0 = project(ep0, d0, depth1, camera0, camera1, T_0to1, valid_d0)
    ep1_0, vis1 = project(ep1, d1, depth0, camera1, camera0, T_1to0, valid_d1)
    ep0_1 = ep0_1.reshape(b, L0, 2, 2)
    ep1_0 = ep1_0.reshape(b, L1, 2, 2)
    # a line participates only if both endpoints reproject
    lvis0 = jnp.all(vis0.reshape(b, L0, 2), axis=-1)
    lvis1 = jnp.all(vis1.reshape(b, L1, 2), axis=-1)
    ldep0 = jnp.all(valid_d0.reshape(b, L0, 2), axis=-1)
    ldep1 = jnp.all(valid_d1.reshape(b, L1, 2), axis=-1)
    if valid0 is not None:
        lvis0, ldep0 = lvis0 & valid0, ldep0 & valid0
    if valid1 is not None:
        lvis1, ldep1 = lvis1 & valid1, ldep1 & valid1

    dist0 = _line_dist(ep0_1, lines1)
    dist1 = _line_dist(lines0, ep1_0)
    dist = jnp.maximum(dist0, dist1)
    mask = lvis0[..., :, None] & lvis1[..., None, :]
    dist = jnp.where(mask, dist, _INF)

    positive, min0, min1 = _mutual_assignment(dist**2, pos_th)
    negative0 = (jnp.min(dist0, axis=-1) > neg_th) & ldep0
    negative1 = (jnp.min(dist1, axis=-2) > neg_th) & ldep1
    m0, m1 = _pack_matches(positive, min0, min1, negative0, negative1, valid0, valid1)
    return {
        "line_assignment": positive,
        "line_matches0": m0,
        "line_matches1": m1,
        "line_matching_scores0": (m0 > -1).astype(jnp.float32),
        "line_matching_scores1": (m1 > -1).astype(jnp.float32),
    }


__all__ = [
    "IGNORE_FEATURE",
    "UNMATCHED_FEATURE",
    "gt_matches_from_homography",
    "gt_matches_from_pose_depth",
    "gt_line_matches_from_homography",
    "gt_line_matches_from_pose_depth",
]
