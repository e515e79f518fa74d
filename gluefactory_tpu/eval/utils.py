"""Per-pair evaluation functions.

Counterpart of reference gluefactory/eval/utils.py:40-272: match precision
metrics, robust-estimator evaluation, weighted-DLT homography, pose AUC
summaries. These run per pair on host (numpy control flow) and call the
jitted TPU estimators for the heavy lifting; the reference's sequential
per-threshold RANSAC loop (eval/hpatches.py:118-124) maps to repeated calls
of the same compiled program with a different threshold scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..estimators.base_estimator import load_estimator
from ..geometry.epipolar import generalized_epi_dist, relative_pose_error
from ..geometry.homography import (
    homography_corner_error,
    solve_homography_dlt,
    sym_homography_error,
)
from ..utils.tools import AUCMetric


def get_matches_scores(kpts0, kpts1, matches0, mscores0):
    """Select matched keypoint pairs (host-side dynamic shapes, eval only)
    (reference eval/utils.py:21-27)."""
    kpts0 = np.asarray(kpts0)
    kpts1 = np.asarray(kpts1)
    matches0 = np.asarray(matches0)
    mscores0 = np.asarray(mscores0)
    m0 = matches0 > -1
    pts0 = kpts0[m0]
    pts1 = kpts1[matches0[m0]]
    scores = mscores0[m0]
    return pts0, pts1, scores


def eval_matches_homography(data: dict, pred: dict) -> dict:
    """Match precision vs GT homography (reference eval/utils.py:72-91)."""
    H_gt = np.asarray(data["H_0to1"])
    kp0, kp1 = pred["keypoints0"], pred["keypoints1"]
    pts0, pts1, scores = get_matches_scores(
        kp0, kp1, pred["matches0"], pred["matching_scores0"]
    )
    results = {}
    if len(pts0) == 0:
        err = np.zeros(0)
    else:
        err = np.asarray(
            sym_homography_error(
                jnp.asarray(pts0[None]), jnp.asarray(pts1[None]),
                jnp.asarray(H_gt[None], jnp.float32),
            )
        )[0]
    results["prec@1px"] = float(np.nan_to_num((err < 1).mean() if len(err) else 0.0))
    results["prec@3px"] = float(np.nan_to_num((err < 3).mean() if len(err) else 0.0))
    results["num_matches"] = int(len(pts0))
    results["num_keypoints"] = (np.asarray(kp0).shape[-2] + np.asarray(kp1).shape[-2]) / 2
    return results


def eval_matches_epipolar(data: dict, pred: dict) -> dict:
    """Epipolar precision of matches (reference eval/utils.py:40-69)."""
    kp0, kp1 = pred["keypoints0"], pred["keypoints1"]
    pts0, pts1, _ = get_matches_scores(
        kp0, kp1, pred["matches0"], pred["matching_scores0"]
    )
    results = {}
    if len(pts0) == 0:
        for th in ("1e-4", "5e-4", "1e-3"):
            results[f"epi_prec@{th}"] = 0.0
    else:
        n_epi_err = np.asarray(
            generalized_epi_dist(
                jnp.asarray(pts0[None]),
                jnp.asarray(pts1[None]),
                data["view0"]["camera"],
                data["view1"]["camera"],
                data["T_0to1"],
                all_pairs=False,
                essential=True,
            )
        )[0]
        results["epi_prec@1e-4"] = float((n_epi_err < 1e-4).mean())
        results["epi_prec@5e-4"] = float((n_epi_err < 5e-4).mean())
        results["epi_prec@1e-3"] = float((n_epi_err < 1e-3).mean())
    results["num_matches"] = int(len(pts0))
    results["num_keypoints"] = (np.asarray(kp0).shape[-2] + np.asarray(kp1).shape[-2]) / 2
    return results


def eval_homography_robust(data: dict, pred: dict, conf: dict) -> dict:
    """RANSAC homography + corner error (reference eval/utils.py:132-173)."""
    H_gt = np.asarray(data["H_0to1"])
    estimator = load_estimator("homography", conf.get("estimator", "jax_ransac"))(conf)
    pts0, pts1, _ = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"],
        pred["matches0"], pred["matching_scores0"],
    )
    results = {}
    if len(pts0) < 4:
        results["H_error_ransac"] = float("inf")
        results["ransac_inl"] = 0
        results["ransac_inl%"] = 0.0
        return results
    est = estimator({"m_kpts0": pts0, "m_kpts1": pts1})
    if bool(est["success"]):
        M = jnp.asarray(est["M_0to1"], jnp.float32)
        size = np.asarray(data["view0"]["image_size"]).reshape(-1)[:2]
        err = homography_corner_error(
            M[None], jnp.asarray(H_gt[None], jnp.float32),
            jnp.asarray(size[None], jnp.float32),
        )
        results["H_error_ransac"] = float(err[0])
        inl = np.asarray(est["inliers"], bool)
        results["ransac_inl"] = int(inl.sum())
        results["ransac_inl%"] = float(inl.mean()) if len(inl) else 0.0
    else:
        results["H_error_ransac"] = float("inf")
        results["ransac_inl"] = 0
        results["ransac_inl%"] = 0.0
    return results


def eval_homography_dlt(data: dict, pred: dict) -> dict:
    """Score-weighted DLT homography + corner error
    (reference eval/utils.py:176-196, kornia find_homography_dlt -> our
    TPU-native weighted DLT)."""
    H_gt = np.asarray(data["H_0to1"])
    pts0, pts1, scores = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"],
        pred["matches0"], pred["matching_scores0"],
    )
    results = {}
    if len(pts0) < 4:
        results["H_error_dlt"] = float("inf")
        return results
    H_dlt = solve_homography_dlt(
        jnp.asarray(pts0[None]), jnp.asarray(pts1[None]),
        jnp.asarray(scores[None], jnp.float32),
    )[0]
    size = np.asarray(data["view0"]["image_size"]).reshape(-1)[:2]
    err = homography_corner_error(
        H_dlt[None], jnp.asarray(H_gt[None], jnp.float32),
        jnp.asarray(size[None], jnp.float32),
    )
    e = float(err[0])
    results["H_error_dlt"] = e if np.isfinite(e) else float("inf")
    return results


def eval_relative_pose_robust(data: dict, pred: dict, conf: dict) -> dict:
    """RANSAC relative pose + angular error (reference eval/utils.py:94-129)."""
    T_gt = data["T_0to1"]
    pts0, pts1, _ = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"],
        pred["matches0"], pred["matching_scores0"],
    )
    results = {}
    if len(pts0) < 8:
        return {"rel_pose_error": float("inf"), "ransac_inl": 0, "ransac_inl%": 0.0}
    estimator = load_estimator("relative_pose", conf.get("estimator", "jax_ransac"))(conf)
    est = estimator(
        {
            "m_kpts0": pts0,
            "m_kpts1": pts1,
            "camera0": data["view0"]["camera"],
            "camera1": data["view1"]["camera"],
        }
    )
    if not bool(est["success"]):
        return {"rel_pose_error": float("inf"), "ransac_inl": 0, "ransac_inl%": 0.0}
    M = est["M_0to1"]
    t_error, r_error = relative_pose_error(T_gt, M.R, M.t)
    inl = np.asarray(est["inliers"], bool)
    results["rel_pose_error"] = float(max(float(r_error), float(t_error)))
    results["ransac_inl"] = int(inl.sum())
    results["ransac_inl%"] = float(inl.mean()) if len(inl) else 0.0
    return results


def eval_poses(pose_results: dict, auc_ths: list, key: str, unit: str = "°"):
    """Summarize a {threshold: {key: [per-pair errors]}} sweep: AUC at each
    auc_th for the best RANSAC threshold by mean AA (reference
    eval/utils.py:199-224)."""
    pose_aucs = {
        th: AUCMetric(auc_ths, results_i[key]).compute()
        for th, results_i in pose_results.items()
    }
    mAAs = {k: float(np.mean(v)) for k, v in pose_aucs.items()}
    best_th = max(mAAs, key=mAAs.get)

    summaries = {}
    for i, ath in enumerate(auc_ths):
        summaries[f"{key}@{ath}{unit}"] = pose_aucs[best_th][i]
    summaries[f"{key}_mAA"] = mAAs[best_th]
    for k, v in pose_results[best_th].items():
        arr = np.array(v)
        if not np.issubdtype(arr.dtype, np.number):
            continue
        summaries[f"m{k}"] = round(float(np.median(arr)), 3)
    return summaries, best_th


__all__ = [
    "get_matches_scores",
    "eval_matches_homography",
    "eval_matches_epipolar",
    "eval_homography_robust",
    "eval_homography_dlt",
    "eval_relative_pose_robust",
    "eval_poses",
]


# ---------------------------------------------------------------------------
# PR / AP for GT-labeled matching (ETH3D protocol, reference eval/utils.py:227-272)
# ---------------------------------------------------------------------------


def get_tp_fp_pts(pred_matches, gt_matches, pred_scores, ignore_label=-2):
    """TP/FP flags + scores + positive count for one pair
    (reference eval/utils.py:227-245)."""
    pred_matches = np.asarray(pred_matches)
    gt_matches = np.asarray(gt_matches)
    pred_scores = np.asarray(pred_scores)
    ignore_mask = gt_matches != ignore_label
    pred_matches, gt_matches, pred_scores = (
        pred_matches[ignore_mask],
        gt_matches[ignore_mask],
        pred_scores[ignore_mask],
    )
    num_pos = int(np.sum(gt_matches != -1))
    pred_positives = pred_matches != -1
    tp = pred_matches[pred_positives] == gt_matches[pred_positives]
    fp = pred_matches[pred_positives] != gt_matches[pred_positives]
    scores = pred_scores[pred_positives]
    return tp, fp, scores, num_pos


def AP(tp, fp):
    """Area under the interpolated PR curve (reference eval/utils.py:248-257)."""
    recall = tp
    precision = tp / np.maximum(tp + fp, 1e-9)
    recall = np.concatenate(([0.0], recall, [1.0]))
    precision = np.concatenate(([0.0], precision, [0.0]))
    for i in range(precision.size - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    i = np.where(recall[1:] != recall[:-1])[0]
    return float(np.sum((recall[i + 1] - recall[i]) * precision[i + 1]))


def aggregate_pr_results(results, suffix=""):
    """Merge per-pair TP/FP into one global PR curve + AP
    (reference eval/utils.py:260-272)."""
    tp_list = np.concatenate(results["tp" + suffix], axis=0)
    fp_list = np.concatenate(results["fp" + suffix], axis=0)
    scores_list = np.concatenate(results["scores" + suffix], axis=0)
    n_gt = max(results["num_pos" + suffix], 1)

    out = {}
    idx = np.argsort(scores_list)[::-1]
    tp_vals = np.cumsum(tp_list[idx]) / n_gt
    fp_vals = np.cumsum(fp_list[idx]) / n_gt
    out["curve_recall" + suffix] = tp_vals
    out["curve_precision" + suffix] = tp_vals / np.maximum(tp_vals + fp_vals, 1e-9)
    out["AP" + suffix] = AP(tp_vals, fp_vals) * 100
    return out
