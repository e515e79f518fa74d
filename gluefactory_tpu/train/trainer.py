"""Training runtime.

Counterpart of reference gluefactory/train.py:191-627 redesigned for
single-controller JAX SPMD:

  - ONE process drives the whole mesh (no torch.multiprocessing spawn /
    NCCL init, reference :241-246,691-700); the batch is sharded over the
    "data" axis and XLA handles gradient reduction.
  - The jitted train step folds in loss, backward, NaN veto, clipping and the
    optimizer update (train/step.py).
  - Validation with streaming mean/median metrics (reference :84-127), best
    checkpoint tracking by `train.best_key`, periodic + end-of-epoch + SIGINT
    checkpointing (reference :290-298,556-625).
"""

from __future__ import annotations

import signal
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..datasets import get_dataset
from ..models import get_model
from ..parallel.mesh import make_mesh, replicated, shard_batch
from ..utils.config import FrozenConfig, merge, save_yaml
from ..utils.experiments import (
    get_best_checkpoint,
    get_last_checkpoint,
    load_checkpoint,
    save_experiment,
)
from ..utils.summary import ExperimentWriter
from ..utils.tools import AverageMetric, MedianMetric, PRMetric, set_seed
from .step import TrainState, make_optimizer, make_train_step

default_train_conf = {
    "seed": 0,
    "epochs": 1,
    "optimizer": "adam",
    "lr": 1e-4,
    "lr_schedule": {"type": None, "start": 0, "exp_div_10": 1e5},
    "grad_clip": 10.0,
    "eval_every_iter": 1000,
    "save_every_iter": 5000,
    "log_every_iter": 100,
    # gradient observability (reference train.py:66,507-519): every N iters
    # log the pre-clip global grad norm, per-module norms, and a histogram of
    # the per-module norm distribution; None/0 disables (and removes the stats
    # from the compiled step entirely).
    "log_grad_every_iter": None,
    "keep_last_checkpoints": 5,
    "best_key": "loss/total",
    "overfit": False,
    "median_metrics": [],
    # validation PR curve over predicted matches (labels: match agrees with
    # gt_matches0; scores: matching_scores0) — figure + AP into the writer
    # (reference train.py:541-579 add_pr_curve path)
    "pr_curves": False,
    # profiling (counterpart of reference --profile, train.py:362-369):
    # trace iterations [profile_start, profile_end) with jax.profiler into
    # <output_dir>/profile (view with xprof/tensorboard)
    "profile": False,
    "profile_start": 10,
    "profile_end": 15,
    # {benchmark_name: benchmark_conf} run at the end of every epoch on the
    # just-saved checkpoint (reference train.py:376-393)
    "benchmarks": {},
    # [n_pairs, "import.path.fn"]: build match figures from the first
    # validation batch (reference `train.plot` conf + visualize_batch)
    "plot": None,
    # fine-tune initialization: name of an experiment whose BEST checkpoint
    # seeds the params (reference `train.load_experiment`, train.py:214-229);
    # tolerant grafting (strict=False counterpart): shape-matching leaves are
    # copied, the rest keep their fresh init with a warning.
    "load_experiment": None,
    # tree prefix for load_experiment when the checkpoint is a submodule of
    # this model (e.g. "extractor" seeds pipeline.extractor from a
    # bare-detector run)
    "load_experiment_prefix": None,
}


def _graft_params(fresh, loaded, path=""):
    """Copy shape-matching leaves of `loaded` into the `fresh` param tree;
    return (tree, n_copied, skipped_paths)."""
    if isinstance(fresh, dict):
        out, n, skipped = {}, 0, []
        loaded = loaded if isinstance(loaded, dict) else {}
        for k, v in fresh.items():
            sub, n_sub, sk = _graft_params(v, loaded.get(k), f"{path}/{k}")
            out[k] = sub
            n += n_sub
            skipped += sk
        return out, n, skipped
    if loaded is not None and np.shape(loaded) == np.shape(fresh):
        return jnp.asarray(loaded, jnp.asarray(fresh).dtype), 1, []
    return fresh, 0, [path]


def batch_to_device(batch):
    """numpy -> jnp leaves, dropping non-array fields (names, paths) that
    cannot cross the jit boundary."""

    def convert(x):
        if isinstance(x, np.ndarray):
            if x.dtype.kind in "OUS":  # strings/objects stay on host
                return None
            return jnp.asarray(x)
        if isinstance(x, (str, bytes)) or x is None:
            return None
        return x

    def prune(tree):
        if isinstance(tree, dict):
            out = {k: prune(v) for k, v in tree.items()}
            return {k: v for k, v in out.items() if v is not None}
        if isinstance(tree, (list, tuple)):
            vals = [prune(v) for v in tree]
            if any(v is None for v in vals):
                return None
            return type(tree)(vals)
        return convert(tree)

    return prune(batch)


class Trainer:
    def __init__(self, conf, experiment: str, output_dir: Path | None = None):
        self.conf = FrozenConfig(
            merge({"train": default_train_conf}, conf)
        )
        self.experiment = experiment
        self.output_dir = output_dir
        self.mesh = make_mesh()
        self.stop_requested = False

    # ------------------------------------------------------------------ setup
    def build(self, restore: bool = False):
        conf = self.conf
        set_seed(conf.train.seed)
        self.dataset = get_dataset(conf.data.name)(dict(conf.data))
        self.model = get_model(conf.model.name).from_conf(dict(conf.model))

        init_loader = self.dataset.get_data_loader("train", epoch=0)
        first_batch = batch_to_device(next(iter(init_loader)))
        variables = self.model.init(jax.random.PRNGKey(conf.train.seed), first_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if conf.train.get("load_experiment"):
            src = str(conf.train.load_experiment)
            loaded, _ = load_checkpoint(get_best_checkpoint(src))
            loaded_params = loaded.get("params", loaded)
            loaded_stats = loaded.get("batch_stats", {}) or {}
            # re-root the loaded tree when seeding a submodule of a bigger
            # model (e.g. a bare-detector checkpoint into pipeline.extractor)
            prefix = conf.train.get("load_experiment_prefix")
            if prefix:
                for part in reversed(str(prefix).split("/")):
                    loaded_params = {part: loaded_params}
                    loaded_stats = {part: loaded_stats}
            params, n_copied, skipped = _graft_params(params, loaded_params)
            if batch_stats and loaded_stats:
                batch_stats, n_bs, _ = _graft_params(batch_stats, loaded_stats)
                n_copied += n_bs
            logger.info(
                "Fine-tune init from '%s': %d tensors copied%s",
                src, n_copied,
                f", {len(skipped)} kept fresh (e.g. {skipped[:3]})" if skipped else "",
            )

        self.tx = make_optimizer(dict(conf.train))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        self.start_epoch = 0
        self.best_eval = None
        if restore:
            path = get_last_checkpoint(self.experiment)
            state_np = jax.tree.map(np.asarray, state)
            restored, meta = load_checkpoint(path, target=state_np)
            state = restored
            self.start_epoch = int(meta["epoch"]) + 1
            self.best_eval = meta.get("best_eval")
            logger.info("Restored checkpoint %s (epoch %d)", path, self.start_epoch)

        repl = replicated(self.mesh)
        self.state = jax.device_put(state, repl)
        grad_every = conf.train.get("log_grad_every_iter") or 0
        step_fn = make_train_step(self.model, self.tx, grad_stats=grad_every > 0)
        self.train_step = jax.jit(step_fn, out_shardings=(repl, repl), donate_argnums=0)

        # replicated outputs: under multi-process runs every host must be
        # able to fetch the metrics (sharded outputs span non-addressable
        # devices and cannot be np.asarray'd)
        repl = replicated(self.mesh)
        self.eval_fn = jax.jit(self._eval_step, out_shardings=repl)
        self.pred_fn = jax.jit(self._pred_step, out_shardings=repl)
        # non-zero ranks of a multi-process run neither log summaries nor
        # write checkpoints (reference: rank-0 guards, train.py:283-298)
        self.is_main = jax.process_index() == 0
        self.writer = (
            ExperimentWriter(self.output_dir)
            if (self.output_dir and self.is_main) else None
        )
        return first_batch

    def _pred_step(self, state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            # batch-mode BatchNorm (training confs) writes batch_stats even
            # in a forward pass; allow and DISCARD the update here
            pred, _ = self.model.apply(variables, batch, mutable=["batch_stats"])
            return pred
        return self.model.apply(variables, batch)

    def _eval_step(self, state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            pred, _ = self.model.apply(variables, batch, mutable=["batch_stats"])
        else:
            pred = self.model.apply(variables, batch)
        losses, metrics = self.model.apply(variables, pred, batch, method="loss")
        return losses, metrics

    # ------------------------------------------------------------- validation
    def do_evaluation(self, epoch: int, it: int) -> dict:
        conf = self.conf.train
        aggs = defaultdict(AverageMetric)
        medians = {k: MedianMetric() for k in conf.median_metrics}
        pr = PRMetric() if conf.get("pr_curves") else None
        loader = self.dataset.get_data_loader("val", epoch=epoch)
        count = 0
        for batch in loader:
            # small validation batches may not divide the mesh; replication is
            # acceptable here (metrics only), unlike the strict train path
            batch = shard_batch(batch_to_device(batch), self.mesh, strict=False)
            if count == 0 and conf.plot and self.writer is not None:
                self._plot_batch(batch, it)
            losses, metrics = self.eval_fn(self.state, batch)
            if pr is not None:
                p = self.pred_fn(self.state, batch)
                gt0 = batch.get("gt_matches0")
                if gt0 is None and "H_0to1" in batch and "keypoints0" in p:
                    from ..geometry.gt_generation import gt_matches_from_homography

                    gt0 = gt_matches_from_homography(
                        p["keypoints0"], p["keypoints1"], batch["H_0to1"],
                        pos_th=3.0,
                    )["matches0"]
                if gt0 is not None:
                    m0 = np.asarray(p["matches0"])
                    gt0_np = np.asarray(gt0)
                    # exclude predictions whose GT label is IGNORE (-2,
                    # ambiguous correspondence) — the reference convention
                    # drops ignored keypoints from metrics entirely
                    pr.update(
                        m0 == gt0_np,
                        np.asarray(p["matching_scores0"]),
                        mask=(m0 >= 0) & (gt0_np != -2),
                    )
            for k, v in {**losses, **metrics}.items():
                arr = np.asarray(v).reshape(-1)
                aggs[f"loss/{k}" if k in losses else k].update(arr)
                if k in medians:
                    medians[k].update(arr)
            count += 1
        results = {k: m.compute() for k, m in aggs.items()}
        results.update({f"{k}_median": m.compute() for k, m in medians.items()})
        if pr is not None:
            labels, scores = pr.compute()
            if len(labels) > 0:
                order = np.argsort(-scores)
                tp = np.cumsum(labels[order])
                precision = tp / (np.arange(len(tp)) + 1)
                recall = tp / max(labels.sum(), 1)
                results["match_AP"] = float(
                    np.sum(precision * labels[order]) / max(labels.sum(), 1)
                )
                if self.writer is not None:
                    import matplotlib

                    matplotlib.use("Agg")
                    import matplotlib.pyplot as plt

                    fig, ax = plt.subplots(figsize=(4, 4))
                    ax.plot(recall, precision)
                    ax.set_xlabel("recall")
                    ax.set_ylabel("precision")
                    ax.set_title(f"match PR (AP={results['match_AP']:.3f})")
                    self.writer.figure(it, "val/match_pr", fig)
        logger.info(
            "[Validation epoch %d iter %d] %s",
            epoch, it,
            {k: round(float(v), 4) for k, v in results.items() if _isnum(v)},
        )
        if self.writer is not None:
            self.writer.scalars(it, results, prefix="val/")
        return results

    def _plot_batch(self, batch, it: int) -> None:
        """Match-figure hook (reference train.plot conf, train.py:541-579)."""
        n_pairs, fn_path = self.conf.train.plot
        mod_path, fn_name = str(fn_path).rsplit(".", 1)
        fn = getattr(__import__(mod_path, fromlist=[""]), fn_name)
        try:
            pred = self.pred_fn(self.state, batch)
            figs = fn(pred, batch, n_pairs=int(n_pairs))
            for name, fig in figs.items():
                self.writer.figure(it, name, fig)
        except Exception as e:  # noqa: BLE001 - plotting must not kill training
            logger.warning("plot hook failed: %s", e)

    # ------------------------------------------------------------------ train
    def train(self):
        conf = self.conf.train
        if self.output_dir and not getattr(self, "is_main", True):
            self.output_dir = None  # rank>0: no artifacts
        if self.output_dir:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            save_yaml(merge({}, self.conf), self.output_dir / "config.yaml")
            # code-version pinning: snapshot the package source into the
            # experiment dir (reference train.py:686-689)
            src_dst = self.output_dir / "source" / "gluefactory_tpu"
            if not src_dst.exists():
                import shutil

                def _copy(src, dst, *, follow_symlinks=True):
                    # compiled caches can vanish between listdir and copy when
                    # other processes import the package concurrently (e.g.
                    # pytest-xdist workers); skip vanished files
                    try:
                        shutil.copy2(src, dst, follow_symlinks=follow_symlinks)
                    except FileNotFoundError:
                        pass

                try:
                    shutil.copytree(
                        Path(__file__).parent.parent, src_dst,
                        ignore=shutil.ignore_patterns(
                            "__pycache__", "*.pyc", ".jax_cache*", "outputs"
                        ),
                        copy_function=_copy, dirs_exist_ok=True,
                    )
                except shutil.Error as e:
                    # copytree copies everything it can and raises the
                    # collected per-entry errors at the END; races on
                    # vanished cache dirs leave the source snapshot intact
                    logger.warning("source snapshot: %d entries skipped", len(e.args[0]))

        def on_sigint(signum, frame):
            if self.stop_requested:
                raise KeyboardInterrupt
            logger.info("SIGINT: finishing iteration, saving, then exiting.")
            self.stop_requested = True

        old_handler = signal.signal(signal.SIGINT, on_sigint)
        it_total = int(self.state.step)
        try:
            for epoch in range(self.start_epoch, conf.epochs):
                # per-epoch dataset resampling hook (reference train.py:407-419)
                if hasattr(self.dataset, "sample_new_items"):
                    self.dataset.sample_new_items(conf.seed + epoch)
                if conf.overfit:
                    loader = self.dataset.get_overfit_loader("train")
                else:
                    loader = self.dataset.get_data_loader(
                        "train", epoch=epoch, shuffle=True
                    )
                t_last = time.perf_counter()
                for batch in loader:
                    if conf.profile and it_total == conf.profile_start:
                        jax.profiler.start_trace(
                            str((self.output_dir or Path(".")) / "profile")
                        )
                    batch = shard_batch(batch_to_device(batch), self.mesh)
                    self.state, losses = self.train_step(self.state, batch)
                    it_total += 1
                    grad_stats = {k: v for k, v in losses.items() if k.startswith("grad/")}
                    losses = {k: v for k, v in losses.items() if not k.startswith("grad/")}
                    grad_every = conf.get("log_grad_every_iter") or 0
                    if grad_every and it_total % grad_every == 0:
                        if self.writer is not None:
                            self.writer.scalars(it_total, grad_stats, prefix="train/")
                            per_mod = [v for k, v in grad_stats.items()
                                       if k.startswith("grad/norm/")]
                            if per_mod:
                                self.writer.histogram(
                                    it_total, "train/grad/module_norms",
                                    np.asarray([float(v) for v in per_mod]),
                                )
                    if conf.profile and it_total == conf.profile_end:
                        jax.block_until_ready(losses["total"])
                        jax.profiler.stop_trace()
                        logger.info("Profile trace written to %s/profile",
                                    self.output_dir)

                    if it_total % conf.log_every_iter == 0:
                        total = float(losses["total"])
                        dt = time.perf_counter() - t_last
                        t_last = time.perf_counter()
                        logger.info(
                            "[E %d | it %d] loss %.4f (%.2f it/s) %s",
                            epoch, it_total, total,
                            conf.log_every_iter / max(dt, 1e-6),
                            {k: round(float(v), 3) for k, v in losses.items()
                             if k != "total"},
                        )
                        if self.writer is not None:
                            self.writer.scalars(
                                it_total,
                                {**{f"loss/{k}": v for k, v in losses.items()},
                                 "it_per_s": conf.log_every_iter / max(dt, 1e-6),
                                 "epoch": epoch},
                                prefix="train/",
                            )
                    if conf.eval_every_iter > 0 and it_total % conf.eval_every_iter == 0:
                        self._validate_and_save(epoch, it_total)
                    if conf.save_every_iter > 0 and it_total % conf.save_every_iter == 0:
                        self._save(epoch, it_total)
                    if self.stop_requested:
                        self._save(epoch, it_total, interrupted=True)
                        return self.state
                results = self._validate_and_save(epoch, it_total)
                self._save(epoch, it_total, results=results)
                self._run_benchmarks(epoch)
        finally:
            signal.signal(signal.SIGINT, old_handler)
            if self.writer is not None:
                self.writer.close()
        return self.state

    def _validate_and_save(self, epoch, it_total):
        results = self.do_evaluation(epoch, it_total)
        key = self.conf.train.best_key
        if key in results and _isnum(results[key]):
            val = float(results[key])
            if self.best_eval is None or val < self.best_eval:
                self.best_eval = val
                save_experiment(
                    self.experiment, self.state, merge({}, self.conf), epoch,
                    it_total, results=results, best_eval=self.best_eval,
                    is_best=True, num_keep=self.conf.train.keep_last_checkpoints,
                )
                logger.info("New best checkpoint (%s=%.4f)", key, val)
        return results

    def _run_benchmarks(self, epoch: int):
        bench_confs = self.conf.train.get("benchmarks") or {}
        for name, bconf in bench_confs.items():
            from ..eval import run_benchmark

            bconf = merge({}, bconf, {"model": {"checkpoint": self.experiment}})
            out = (self.output_dir or Path(".")) / "benchmarks" / name
            try:
                # pass the live params (reference passes the in-memory model,
                # train.py:381-393); the checkpoint stays as fallback
                summaries, _ = run_benchmark(name, bconf, out, model=self.state.params)
                logger.info("[Benchmark %s @ epoch %d] %s", name, epoch, summaries)
                if self.writer is not None:
                    self.writer.scalars(epoch, summaries, prefix=f"bench/{name}/")
            except Exception as e:  # noqa: BLE001 - benchmarks must not kill training
                logger.warning("Benchmark %s failed: %s", name, e)

    def _save(self, epoch, it_total, results=None, interrupted=False):
        # every rank participates (the orbax write is collective); metadata
        # and the best-copy happen on rank 0 only
        save_experiment(
            self.experiment, self.state, merge({}, self.conf), epoch, it_total,
            results=results, best_eval=self.best_eval,
            num_keep=self.conf.train.keep_last_checkpoints,
            interrupted=interrupted, is_main=getattr(self, "is_main", True),
        )


def _isnum(v):
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


__all__ = ["Trainer", "default_train_conf", "batch_to_device"]
