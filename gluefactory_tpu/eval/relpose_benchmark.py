"""Shared core of relative-pose benchmarks (MegaDepth-1500 + hermetic
synthetic 3D).

Counterpart of reference gluefactory/eval/megadepth1500.py:26-189: phase 1
exports matches per pair; phase 2 computes epipolar precision and a RANSAC
threshold sweep of relative-pose errors, summarized as pose AUC@5/10/20deg
with best-threshold mAA.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import h5py
import jax
import numpy as np
from tqdm import tqdm

from ..models import get_model
from ..utils.export_predictions import export_predictions
from ..utils.tensor import index_batch
from .eval_pipeline import EvalPipeline
from .utils import eval_matches_epipolar, eval_poses, eval_relative_pose_robust


class RelPoseBenchmarkPipeline(EvalPipeline):
    default_conf = {
        "data": {},
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "superpoint_open", "max_num_keypoints": 2048,
                          "detection_threshold": 0.0},
            "matcher": {"name": "lightglue", "filter_threshold": 0.1},
        },
        "eval": {
            "estimator": "jax_ransac",
            "ransac_th": 2.0,  # -1 sweeps [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
        },
    }
    export_keys = [
        "keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1",
        "matches0", "matches1", "matching_scores0", "matching_scores1",
    ]

    def _init(self, conf):
        self._variables = None

    def make_dataset(self, data_conf):
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
        with h5py.File(str(pred_file), "r") as hfile:
            for batch in tqdm(loader):
                names = batch["name"]
                if isinstance(names, (str, bytes)):
                    names = [names]
                for i, data_i in enumerate(index_batch(batch)):
                    name = names[i]
                    grp = hfile[str(name)]
                    pred = {k: np.asarray(grp[k]) for k in grp.keys()}
                    results_i = eval_matches_epipolar(data_i, pred)
                    for th in test_thresholds:
                        pose_results_i = eval_relative_pose_robust(
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

        best_s, best_th = eval_poses(
            pose_results, auc_ths=[5, 10, 20], key="rel_pose_error"
        )
        results = {
            **results,
            **{f"{k}_{best_th}": v for k, v in pose_results[best_th].items()},
        }
        summaries = {**summaries, **best_s}
        return summaries, {}, dict(results)


__all__ = ["RelPoseBenchmarkPipeline"]
