"""Experiment / checkpoint management.

Counterpart of reference gluefactory/utils/experiments.py:22-134: checkpoints
carry the resolved config; helpers list/load last/best checkpoints, prune old
ones, and rebuild a model from a checkpoint's stored conf. Storage is Orbax
(sharding-aware, async-safe) + a yaml sidecar for the conf.

Layout: TRAINING_PATH/<experiment>/
    checkpoint_<epoch>_<iter>/   (orbax pytree dir)
    checkpoint_best/             (copy of the best)
    conf.yaml, log.txt
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..settings import TRAINING_PATH
from .config import load_yaml, merge, save_yaml


def experiment_dir(experiment: str) -> Path:
    return Path(TRAINING_PATH) / experiment


def list_checkpoints(dir_: Path):
    """Sorted (epoch, iter, path) of all checkpoints (experiments.py:24-31)."""
    checkpoints = []
    for p in dir_.glob("checkpoint_*_*"):
        m = re.match(r"checkpoint_(\d+)_(\d+)$", p.name)
        if m and p.is_dir():
            checkpoints.append(((int(m.group(1)), int(m.group(2))), p))
    return sorted(checkpoints)


def get_last_checkpoint(experiment: str) -> Path:
    cps = list_checkpoints(experiment_dir(experiment))
    if not cps:
        raise FileNotFoundError(f"No checkpoints in {experiment}")
    return cps[-1][1]


def get_best_checkpoint(experiment: str) -> Path:
    p = experiment_dir(experiment) / "checkpoint_best"
    if not p.exists():
        raise FileNotFoundError(f"No best checkpoint in {experiment}")
    return p


def delete_old_checkpoints(dir_: Path, num_keep: int):
    cps = list_checkpoints(dir_)
    for _, p in cps[: max(len(cps) - num_keep, 0)]:
        shutil.rmtree(p)


def save_experiment(
    experiment: str,
    state,
    conf,
    epoch: int,
    iter_i: int,
    results: dict | None = None,
    best_eval: float | None = None,
    is_best: bool = False,
    num_keep: int = 5,
    interrupted: bool = False,
    is_main: bool = True,
) -> Path:
    """Write checkpoint_<epoch>_<iter> (+ checkpoint_best copy when is_best),
    prune old ones (reference save_experiment, experiments.py:95-134).

    `interrupted` checkpoints (SIGINT mid-epoch, reference experiments.py:124)
    get an `_interrupted` suffix: list_checkpoints' pattern excludes them, so
    `--restore` resumes from the last CLEAN checkpoint like the reference."""
    dir_ = experiment_dir(experiment)
    dir_.mkdir(parents=True, exist_ok=True)
    suffix = "_interrupted" if interrupted else ""
    path = dir_ / f"checkpoint_{epoch}_{iter_i}{suffix}"
    # the orbax write is a COLLECTIVE under jax.distributed (each process
    # contributes its ocdbt shard and the finalize rendezvous needs everyone);
    # only the metadata/best-copy/pruning below are rank-0 work
    ckptr = ocp.StandardCheckpointer()
    state_np = jax.tree.map(np.asarray, state)
    ckptr.save(path.absolute() / "state", state_np, force=True)
    ckptr.wait_until_finished()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_{epoch}_{iter_i}")
    if is_main:
        meta = {
            "conf": merge({}, conf),
            "epoch": epoch,
            "iter": iter_i,
            "eval": {
                k: float(v) for k, v in (results or {}).items() if _is_num(v)
            },
            "best_eval": None if best_eval is None else float(best_eval),
        }
        save_yaml(meta, path / "meta.yaml")
        save_yaml(merge({}, conf), dir_ / "conf.yaml")
        if is_best:
            best = dir_ / "checkpoint_best"
            if best.exists():
                shutil.rmtree(best, ignore_errors=True)
            # dirs_exist_ok: two best-saves can target the same checkpoint
            # path (eval-triggered + end-of-epoch with identical epoch/iter)
            shutil.copytree(path, best, dirs_exist_ok=True)
        delete_old_checkpoints(dir_, num_keep)
    if jax.process_count() > 1:
        # second barrier: without it a non-main rank can run ahead into the
        # NEXT collective save — whose force-overwrite deletes this very
        # checkpoint dir — while rank 0 is still copying checkpoint_best
        # from it (observed as a copytree ENOENT race in the 2-process
        # trainer test)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_done_{epoch}_{iter_i}")
    return path


def _is_num(v):
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def load_checkpoint(path: Path, target=None):
    """Load (state, meta) from a checkpoint dir. `target` is an example
    pytree for structure/dtype restoration."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        state = ckptr.restore(Path(path).absolute() / "state", target=target)
    else:
        state = ckptr.restore(Path(path).absolute() / "state")
    meta = load_yaml(Path(path) / "meta.yaml")
    return state, meta


def load_experiment(experiment: str, conf_overrides=None, get_last: bool = False):
    """Rebuild the model from the conf stored in a checkpoint
    (reference load_experiment, experiments.py:65-91).

    Returns (model, state, meta)."""
    from ..models import get_model

    path = (
        get_last_checkpoint(experiment) if get_last else get_best_checkpoint(experiment)
    )
    state, meta = load_checkpoint(path)
    conf = merge(meta["conf"], conf_overrides or {})
    model = get_model(conf["model"]["name"]).from_conf(conf["model"])
    return model, state, meta


__all__ = [
    "experiment_dir", "list_checkpoints", "get_last_checkpoint",
    "get_best_checkpoint", "delete_old_checkpoints", "save_experiment",
    "load_checkpoint", "load_experiment",
]
