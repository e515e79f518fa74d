"""Outlier-rate sweep: TPU-native jax_ransac vs the OpenCV host baseline.

VERDICT r1 #8: quantify batched fixed-iteration LO-RANSAC (estimators/
ransac.py) against OpenCV's adaptive RANSAC on synthetic homography and
relative-pose problems across outlier rates, and record the table in
docs/ransac_comparison.md. Run with JAX_PLATFORMS=cpu for an apples-to-apples
host comparison, or on TPU for deployment numbers.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def make_h_problem(rng, n=512, outlier_rate=0.3, noise=1.0, size=(640, 480)):
    w, h = size
    H = np.eye(3) + rng.randn(3, 3) * np.array(
        [[0.1, 0.05, 20.0], [0.05, 0.1, 20.0], [2e-4, 2e-4, 0.0]]
    )
    p0 = rng.uniform([40, 40], [w - 40, h - 40], (n, 2))
    p1h = (np.c_[p0, np.ones(n)] @ H.T)
    p1 = p1h[:, :2] / p1h[:, 2:]
    p1 += rng.randn(n, 2) * noise
    n_out = int(n * outlier_rate)
    idx = rng.permutation(n)[:n_out]
    p1[idx] = rng.uniform([0, 0], [w, h], (n_out, 2))
    return p0.astype(np.float32), p1.astype(np.float32), H


def make_e_problem(rng, n=512, outlier_rate=0.3, noise=1.0, size=(640, 480)):
    w, h = size
    f = 600.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    ang = rng.uniform(-0.15, 0.15, 3)
    Rx = lambda a: np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    Ry = lambda a: np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    Rz = lambda a: np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    R = Rx(ang[0]) @ Ry(ang[1]) @ Rz(ang[2])
    t = rng.randn(3)
    t /= np.linalg.norm(t)
    X = np.c_[rng.uniform(-3, 3, (n, 2)), rng.uniform(4, 12, n)]
    p0h = (K @ X.T).T
    p0 = p0h[:, :2] / p0h[:, 2:]
    X1 = (R @ X.T).T + t
    p1h = (K @ X1.T).T
    p1 = p1h[:, :2] / p1h[:, 2:]
    p0 += rng.randn(n, 2) * noise
    p1 += rng.randn(n, 2) * noise
    n_out = int(n * outlier_rate)
    idx = rng.permutation(n)[:n_out]
    p1[idx] = rng.uniform([0, 0], [w, h], (n_out, 2))
    return p0.astype(np.float32), p1.astype(np.float32), K, R, t


def corner_error(H_est, H_gt, size=(640, 480)):
    w, h = size
    c = np.array([[0, 0, 1], [w, 0, 1], [w, h, 1], [0, h, 1]], float)
    pe = (c @ np.asarray(H_est, float).T)
    pg = (c @ H_gt.T)
    pe = pe[:, :2] / pe[:, 2:]
    pg = pg[:, :2] / pg[:, 2:]
    return float(np.mean(np.linalg.norm(pe - pg, axis=-1)))


def pose_error(R_est, t_est, R_gt, t_gt):
    cosr = (np.trace(np.asarray(R_est, float).T @ R_gt) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cosr, -1, 1)))
    t_e = np.asarray(t_est, float).reshape(3)
    cost = abs(t_e @ t_gt) / (np.linalg.norm(t_e) * np.linalg.norm(t_gt) + 1e-12)
    t_err = np.degrees(np.arccos(np.clip(cost, 0, 1)))
    return float(max(r_err, t_err))


def run_sweep(trials=8, rates=(0.0, 0.2, 0.4, 0.6, 0.7)):
    import jax

    from gluefactory_tpu.estimators import load_estimator
    from gluefactory_tpu.geometry.wrappers import Camera

    rows_h, rows_e = [], []
    jx_h = load_estimator("homography", "jax_ransac")({"ransac_th": 3.0})
    cv_h = load_estimator("homography", "opencv")({"ransac_th": 3.0})
    jx_e = load_estimator("relative_pose", "jax_ransac")({"ransac_th": 2.0})
    cv_e = load_estimator("relative_pose", "opencv")({"ransac_th": 2.0})

    for rate in rates:
        errs = {"jax": [], "cv": []}
        times = {"jax": [], "cv": []}
        for tr in range(trials):
            rng = np.random.RandomState(1000 + tr)
            p0, p1, H = make_h_problem(rng, outlier_rate=rate)
            data = {"m_kpts0": p0, "m_kpts1": p1}
            for nm, est in (("jax", jx_h), ("cv", cv_h)):
                t0 = time.perf_counter()
                out = est(data)
                err = corner_error(np.asarray(out["M_0to1"]), H)
                times[nm].append(time.perf_counter() - t0)
                errs[nm].append(err)
        rows_h.append((rate, errs, times))
        print(f"H  rate={rate:.1f}  jax {np.median(errs['jax']):7.3f} px "
              f"({np.median(times['jax'])*1e3:6.1f} ms)   "
              f"cv {np.median(errs['cv']):7.3f} px "
              f"({np.median(times['cv'])*1e3:6.1f} ms)", flush=True)

    for rate in rates:
        errs = {"jax": [], "cv": []}
        times = {"jax": [], "cv": []}
        for tr in range(trials):
            rng = np.random.RandomState(2000 + tr)
            p0, p1, K, R, t = make_e_problem(rng, outlier_rate=rate)
            cam = Camera.from_calibration_matrix(K.astype(np.float32))
            data = {"m_kpts0": p0, "m_kpts1": p1, "camera0": cam, "camera1": cam}
            for nm, est in (("jax", jx_e), ("cv", cv_e)):
                t0 = time.perf_counter()
                out = est(data)
                M = out["M_0to1"]
                R_est, t_est = np.asarray(M.R), np.asarray(M.t)
                times[nm].append(time.perf_counter() - t0)
                errs[nm].append(pose_error(R_est, t_est, R, t))
        rows_e.append((rate, errs, times))
        print(f"E  rate={rate:.1f}  jax {np.median(errs['jax']):7.3f} deg "
              f"({np.median(times['jax'])*1e3:6.1f} ms)   "
              f"cv {np.median(errs['cv']):7.3f} deg "
              f"({np.median(times['cv'])*1e3:6.1f} ms)", flush=True)
    return rows_h, rows_e


def write_doc(rows_h, rows_e, path):
    import jax

    lines = [
        "# Batched LO-RANSAC vs OpenCV: outlier-rate sweep",
        "",
        f"Backend: `{jax.default_backend()}`. Synthetic problems, 512"
        " correspondences, 1 px noise, 8 trials/rate (medians reported).",
        "Generator: `scripts/ransac_sweep.py` (re-run to refresh).",
        "",
        "jax_ransac is a fixed-budget batched design built for TPU (8192"
        " hypotheses scored as one matmul-shaped pass + guided second round);"
        " its CPU-backend wall times here are NOT its deployment speed — on"
        " the v5e chip the E estimator runs ~17-35 ms/pair and the sweep's"
        " extra thresholds batch into the same program (NOTES.md).",
        "",
        "## Homography (corner error, px)",
        "",
        "| outliers | jax_ransac err | jax ms | opencv err | opencv ms |",
        "|---|---|---|---|---|",
    ]
    for rate, errs, times in rows_h:
        lines.append(
            f"| {rate:.0%} | {np.median(errs['jax']):.3f} | "
            f"{np.median(times['jax'])*1e3:.1f} | {np.median(errs['cv']):.3f} | "
            f"{np.median(times['cv'])*1e3:.1f} |"
        )
    lines += [
        "",
        "## Relative pose (max of R/t angular error, deg)",
        "",
        "| outliers | jax_ransac err | jax ms | opencv err | opencv ms |",
        "|---|---|---|---|---|",
    ]
    for rate, errs, times in rows_e:
        lines.append(
            f"| {rate:.0%} | {np.median(errs['jax']):.3f} | "
            f"{np.median(times['jax'])*1e3:.1f} | {np.median(errs['cv']):.3f} | "
            f"{np.median(times['cv'])*1e3:.1f} |"
        )
    lines += [
        "",
        "The regression test `tests/test_estimators.py::"
        "TestRansacOutlierSweep` pins jax_ransac's accuracy to these levels.",
        "",
    ]
    Path(path).write_text("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    if "--cpu" in sys.argv:  # the axon boot hook ignores JAX_PLATFORMS env
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rows_h, rows_e = run_sweep()
    write_doc(rows_h, rows_e, Path(__file__).parent.parent / "docs" / "ransac_comparison.md")
