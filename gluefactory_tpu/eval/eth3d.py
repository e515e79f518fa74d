"""ETH3D matching-AP benchmark.

Counterpart of reference gluefactory/eval/eth3d.py:18-106: run the pipeline
with depth/pose GT IN the forward pass (run_gt_in_forward), export
matches + GT labels, and aggregate a global PR curve / AP over all pairs.
A hermetic variant (`--conf synthetic`) applies the identical protocol to the
synthetic 3D dataset.
    python -m gluefactory_tpu.eval.eth3d [--conf ...]
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import h5py
import numpy as np
from tqdm import tqdm

from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, parse_eval_args
from .utils import aggregate_pr_results, get_tp_fp_pts


def eval_dataset_pr(pred_file, suffix=""):
    """Aggregate PR/AP over all exported pairs (reference eth3d.py:18-46)."""
    results = defaultdict(list)
    results["num_pos" + suffix] = 0
    key_m = f"{'line_' if suffix else ''}matches0"
    key_s = f"{'line_' if suffix else ''}matching_scores0"
    key_gt = f"gt_{'line_' if suffix else ''}matches0"
    with h5py.File(str(pred_file), "r") as hfile:
        def visit(name, obj):
            if not isinstance(obj, h5py.Group) or key_m not in obj:
                return
            scores = np.asarray(obj[key_s])
            order = np.argsort(scores)[::-1]
            tp, fp, sc, num_pos = get_tp_fp_pts(
                np.asarray(obj[key_m])[order], np.asarray(obj[key_gt])[order],
                scores[order],
            )
            results["tp" + suffix].append(tp)
            results["fp" + suffix].append(fp)
            results["scores" + suffix].append(sc)
            results["num_pos" + suffix] += num_pos

        hfile.visititems(visit)
    return aggregate_pr_results(results, suffix=suffix)


class ETH3DPipeline(EvalPipeline):
    default_conf = {
        "data": {"name": "eth3d", "test_batch_size": 1},
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "superpoint_open", "max_num_keypoints": 1024,
                          "detection_threshold": 0.0},
            "matcher": {"name": "lightglue", "filter_threshold": 0.1},
            "ground_truth": {"name": "depth_matcher", "th_positive": 3.0},
            "run_gt_in_forward": True,
        },
        "eval": {"eval_lines": False},
    }
    export_keys = ["gt_matches0", "matches0", "matching_scores0"]
    optional_export_keys = [
        "gt_line_matches0", "line_matches0", "line_matching_scores0",
    ]

    def _init(self, conf):
        self._variables = None

    def make_dataset(self, data_conf):
        from ..datasets import get_dataset

        return get_dataset(data_conf.get("name", "eth3d"))(data_conf)

    def get_dataloader(self, data_conf=None):
        dataset = self.make_dataset(dict(data_conf or self.conf.data))
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir, model=None, overwrite=False):
        pred_file = Path(experiment_dir) / "predictions.h5"
        if pred_file.exists() and not overwrite:
            return pred_file
        from .export_helper import make_export_apply_fn

        apply_fn, state = make_export_apply_fn(dict(self.conf.model), live_params=model)
        export_predictions(
            tqdm(self.get_dataloader()), apply_fn, pred_file,
            keys=self.export_keys, optional_keys=self.optional_export_keys,
        )
        self._variables = state["variables"]
        return pred_file

    def run_eval(self, loader, pred_file):
        r = eval_dataset_pr(pred_file)
        if self.conf.eval.eval_lines:
            r.update(eval_dataset_pr(pred_file, suffix="_lines"))
        s = {"AP": r["AP"]}
        if "AP_lines" in r:
            s["AP_lines"] = r["AP_lines"]
        return s, {}, r


class SyntheticETH3DPipeline(ETH3DPipeline):
    """Identical protocol on hermetic synthetic 3D pairs."""

    default_conf = {
        "data": {"name": "synthetic_two_view", "test_size": 10,
                  "image_size": [400, 300], "test_batch_size": 1},
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "sift", "max_num_keypoints": 512},
            "matcher": {"name": "nearest_neighbor_matcher", "ratio_thresh": 0.9},
            "ground_truth": {"name": "depth_matcher", "th_positive": 3.0},
            "run_gt_in_forward": True,
        },
        "eval": {"eval_lines": False},
    }


if __name__ == "__main__":
    from .. import logger

    parser = get_eval_parser()
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_intermixed_args()
    cls = SyntheticETH3DPipeline if args.synthetic else ETH3DPipeline
    tag, conf = parse_eval_args("eth3d", args, cls.default_conf)
    experiment_dir = Path(EVAL_PATH) / "eth3d" / tag
    pipeline = cls(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    logger.info("Summaries: %s", s)
