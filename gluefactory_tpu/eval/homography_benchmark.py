"""Shared core of homography-GT benchmarks (HPatches + hermetic synthetic).

Counterpart of reference gluefactory/eval/hpatches.py:29-169: phase 1 exports
matcher predictions per pair to HDF5; phase 2 evaluates match precision,
weighted-DLT homography and a RANSAC threshold sweep, summarized as
H-AUC@1/3/5px with best-threshold mAA (eval/utils.py:199-224 semantics).

TPU notes: export jits ONE pipeline program (images padded to a static box by
the dataset preprocessor); the RANSAC sweep reuses one compiled estimator
program per threshold.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import h5py
import jax
import numpy as np
from tqdm import tqdm

from .. import logger
from ..models import get_model
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor
from .eval_pipeline import EvalPipeline
from .utils import (
    eval_homography_dlt,
    eval_homography_robust,
    eval_matches_homography,
    eval_poses,
)


class HomographyBenchmarkPipeline(EvalPipeline):
    default_conf = {
        "data": {},
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "superpoint_open", "max_num_keypoints": 1024,
                          "detection_threshold": 0.0},
            "matcher": {"name": "lightglue", "filter_threshold": 0.1},
        },
        "eval": {
            "estimator": "jax_ransac",
            "ransac_th": 1.0,  # -1 sweeps [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
        },
    }
    export_keys = [
        "keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1",
        "matches0", "matches1", "matching_scores0", "matching_scores1",
    ]

    def _init(self, conf):
        self._variables = None

    def make_dataset(self, data_conf=None):
        raise NotImplementedError

    def get_dataloader(self, data_conf=None):
        dataset = self.make_dataset(dict(data_conf or self.conf.data))
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir, model=None, overwrite=False):
        pred_file = Path(experiment_dir) / "predictions.h5"
        if pred_file.exists() and not overwrite:
            return pred_file
        loader = self.get_dataloader()
        from .export_helper import make_export_apply_fn

        apply_fn, state = make_export_apply_fn(dict(self.conf.model), live_params=model)
        if self._variables is not None:
            state["variables"] = self._variables

        export_predictions(
            tqdm(loader), apply_fn, pred_file, keys=self.export_keys, as_half=False
        )
        self._variables = state["variables"]
        return pred_file

    def run_eval(self, loader, pred_file):
        conf = self.conf.eval
        results = defaultdict(list)
        test_thresholds = (
            [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
            if conf.ransac_th == -1
            else [conf.ransac_th]
        )
        pose_results = defaultdict(lambda: defaultdict(list))
        from ..utils.tensor import index_batch

        with h5py.File(str(pred_file), "r") as hfile:
            for batch in tqdm(loader):
                names = batch["name"]
                if isinstance(names, (str, bytes)):
                    names = [names]
                for i, data_i in enumerate(index_batch(batch)):
                    name = names[i]
                    grp = hfile[str(name)]
                    pred = {k: np.asarray(grp[k]) for k in grp.keys()}

                    results_i = eval_matches_homography(data_i, pred)
                    results_i.update(eval_homography_dlt(data_i, pred))
                    for th in test_thresholds:
                        pose_results_i = eval_homography_robust(
                            data_i, pred,
                            {"estimator": conf.estimator, "ransac_th": th},
                        )
                        for k, v in pose_results_i.items():
                            pose_results[th][k].append(v)
                    results_i["name"] = str(name)
                    for k, v in results_i.items():
                        results[k].append(v)

        summaries = {}
        for k, v in results.items():
            arr = np.array(v)
            if not np.issubdtype(arr.dtype, np.number):
                continue
            summaries[f"m{k}"] = round(float(np.median(arr)), 3)

        auc_ths = [1, 3, 5]
        best_s, best_th = eval_poses(
            pose_results, auc_ths=auc_ths, key="H_error_ransac", unit="px"
        )
        results = {**results, **{f"{k}_{best_th}": v for k, v in pose_results[best_th].items()}}
        summaries = {**summaries, **best_s}

        # DLT AUC (reference hpatches.py:146-151)
        dlt_errs = np.array(results["H_error_dlt"], dtype=float)
        from ..utils.tools import cal_error_auc

        dlt_aucs = cal_error_auc(np.nan_to_num(dlt_errs, nan=1e6, posinf=1e6), auc_ths)
        for i, ath in enumerate(auc_ths):
            summaries[f"H_error_dlt@{ath}px"] = dlt_aucs[i]

        figures = {}
        return summaries, figures, dict(results)


__all__ = ["HomographyBenchmarkPipeline"]
