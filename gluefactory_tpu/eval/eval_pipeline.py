"""Two-phase evaluation pipeline: export predictions, then eval from cache.

Counterpart of reference gluefactory/eval/eval_pipeline.py:8-109: the
export->eval split keeps published numbers reproducible (predictions are
cached to HDF5 and re-evaluated without re-running the model,
docs/evaluation.md:3-6). Conf changes against a cached run require
--overwrite, mirroring the reference guard (:94-109).
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

from .. import logger
from ..utils.config import FrozenConfig, load_yaml, merge, save_yaml


def load_eval(dir_: Path):
    """Load saved results.h5 + summaries.json (reference :8-22)."""
    summaries, results = {}, {}
    with h5py.File(str(dir_ / "results.h5"), "r") as hfile:
        for k in hfile.keys():
            results[k] = np.array(hfile[k])
        for k, v in hfile.attrs.items():
            summaries[k] = v
    with open(dir_ / "summaries.json", "r") as f:
        summaries = json.load(f)
    return summaries, results


def save_eval(dir_: Path, summaries: dict, figures: dict, results: dict):
    """Save results + summaries (+ figures) (reference :25-43)."""
    dir_.mkdir(parents=True, exist_ok=True)
    with h5py.File(str(dir_ / "results.h5"), "w") as hfile:
        for k, v in results.items():
            arr = np.array(v)
            if not np.issubdtype(arr.dtype, np.number):
                arr = arr.astype("S")
            hfile.create_dataset(k, data=arr)
    s = {
        k: float(v) if np.isscalar(v) and not isinstance(v, str) else v
        for k, v in summaries.items()
    }
    with open(dir_ / "summaries.json", "w") as f:
        json.dump(s, f, indent=4, default=float)
    for fig_name, fig in figures.items():
        fig.savefig(dir_ / f"{fig_name}.png")


def exists_eval(dir_: Path):
    return (dir_ / "results.h5").exists() and (dir_ / "summaries.json").exists()


class EvalPipeline:
    """Subclasses define default_conf, export_keys, and the two phases:
    `_init(conf)`, `get_predictions(experiment_dir, model, overwrite)`,
    `run_eval(loader, pred_file)`."""

    default_conf = {}
    export_keys: list = []
    optional_export_keys: list = []

    def __init__(self, conf=None):
        self.conf = FrozenConfig(
            merge({"data": {}, "model": {}, "eval": {}}, self.default_conf, conf or {})
        )
        self._init(self.conf)

    def _init(self, conf):
        pass

    def get_dataloader(self, data_conf=None):
        raise NotImplementedError

    def get_predictions(self, experiment_dir, model=None, overwrite=False):
        raise NotImplementedError

    def run_eval(self, loader, pred_file):
        raise NotImplementedError

    def save_conf(self, experiment_dir: Path, overwrite=False, overwrite_eval=False):
        """Conf-change guard (reference :94-109)."""
        conf_output_path = experiment_dir / "conf.yaml"
        conf = merge({}, self.conf)
        if conf_output_path.exists():
            saved_conf = load_yaml(conf_output_path)
            if merge({}, saved_conf.get("data", {})) != conf["data"] or merge(
                {}, saved_conf.get("model", {})
            ) != conf["model"]:
                assert overwrite, (
                    "Model or data conf changed vs cached predictions; "
                    "pass overwrite=True"
                )
            if merge({}, saved_conf.get("eval", {})) != conf["eval"]:
                assert overwrite or overwrite_eval, (
                    "Eval conf changed; pass overwrite_eval=True"
                )
        experiment_dir.mkdir(parents=True, exist_ok=True)
        save_yaml(conf, conf_output_path)

    def run(self, experiment_dir: Path, model=None, overwrite=False, overwrite_eval=False):
        """Export -> eval (reference :78-92)."""
        experiment_dir = Path(experiment_dir)
        self.save_conf(
            experiment_dir, overwrite=overwrite, overwrite_eval=overwrite_eval
        )
        pred_file = self.get_predictions(
            experiment_dir, model=model, overwrite=overwrite
        )
        f = {}
        if not exists_eval(experiment_dir) or overwrite_eval or overwrite:
            # The eval phase is many tiny dynamic-shape programs (per-pair
            # metrics + RANSAC on variable match counts). On a remote-compile
            # TPU each unique shape costs a multi-second compile round-trip,
            # so pin the phase to the host CPU backend — export (the heavy,
            # static-shape model forward) stays on the accelerator.
            import jax

            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                summaries, f, results = self.run_eval(
                    self.get_dataloader(), pred_file
                )
            save_eval(experiment_dir, summaries, f, results)
        summaries, results = load_eval(experiment_dir)
        return summaries, f, results


__all__ = ["EvalPipeline", "load_eval", "save_eval", "exists_eval"]
