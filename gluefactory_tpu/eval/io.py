"""Eval CLI plumbing: named-config resolution, conf layering, model loading.

Counterpart of reference gluefactory/eval/io.py:14-97.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from ..models import get_model
from ..settings import TRAINING_PATH
from ..utils.config import load_yaml, merge, parse_dotlist


def parse_config_path(name_or_path: str | None) -> Path | None:
    """Resolve a config name against gluefactory_tpu/configs
    (reference io.py:14-32)."""
    if name_or_path is None:
        return None
    default_configs = Path(__file__).parent.parent / "configs"
    for path in (Path(name_or_path), default_configs / name_or_path,
                 default_configs / f"{name_or_path}.yaml"):
        if path.exists() and path.is_file():
            return path
    raise FileNotFoundError(f"Cannot find config {name_or_path}")


def extract_benchmark_conf(conf: dict, benchmark: str) -> dict:
    """Overlay conf.benchmarks.<benchmark> onto the model conf
    (reference io.py:35-44)."""
    conf = dict(conf)
    benchmarks = conf.pop("benchmarks", {})
    return merge({"model": conf.get("model", {})}, benchmarks.get(benchmark, {}))


def parse_eval_args(benchmark: str, args, default_conf: dict):
    """default < named/yaml conf < CLI dotlist (reference io.py:47-84).
    Returns (experiment_tag, conf)."""
    conf = {"data": {}, "model": {}, "eval": {}}
    if args.conf:
        conf_path = parse_config_path(args.conf)
        custom = load_yaml(conf_path)
        conf = merge(conf, extract_benchmark_conf(custom, benchmark))
        tag = args.tag or conf_path.stem
    else:
        tag = args.tag or "default"
    ckpt_conf = {}
    if args.checkpoint:
        conf["model"]["checkpoint"] = args.checkpoint
        tag = args.tag or (f"{tag}_" if args.conf else "") + Path(args.checkpoint).name
        # fold the model conf stored with the experiment so the evaluated
        # architecture matches the trained one (reference io.py:59-65)
        exp_conf_path = Path(TRAINING_PATH) / args.checkpoint / "config.yaml"
        if exp_conf_path.exists():
            model_conf = dict(load_yaml(exp_conf_path).get("model", {}))
            # sanitize training-only knobs for the eval pipeline
            model_conf.pop("ground_truth", None)
            for comp in model_conf.values():
                if isinstance(comp, dict):
                    comp.pop("is_training", None)
            ckpt_conf = {"model": model_conf}
            # the checkpoint defines the architecture: don't let the
            # benchmark's default model conf leak under it
            default_conf = {**default_conf, "model": {}}
    conf = merge(default_conf, ckpt_conf, conf, parse_dotlist(args.dotlist))
    return tag, conf


def load_model(model_conf: dict, checkpoint: str | None = None):
    """Build pipeline (+ params from a checkpoint or random init)
    (reference io.py:87-97). Returns (model, init_variables_fn) where params
    must be created by the caller with example data (flax lazy init)."""
    if checkpoint:
        from ..utils.experiments import load_experiment

        model, state, meta = load_experiment(checkpoint, get_last=False)
        return model, {"params": state["params"], **(
            {"batch_stats": state["batch_stats"]} if state.get("batch_stats") else {}
        )}
    model = get_model(model_conf.get("name", "two_view_pipeline")).from_conf(model_conf)
    return model, None


def get_eval_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--overwrite_eval", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    return parser


__all__ = [
    "parse_config_path", "extract_benchmark_conf", "parse_eval_args",
    "load_model", "get_eval_parser",
]
