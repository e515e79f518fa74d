"""Inspect cached evaluation results.

Counterpart of reference gluefactory/eval/inspect.py:15-61 + the
visualization viewer stack (global_frame/two_view_frame, ~1455 LoC): browse
per-pair metrics of one or more eval experiments and render two-view match
figures from the cached predictions.

Headless-first (this environment has no display): by default it writes a
metric scatter + the N worst/best pair figures to PNG; pass --interactive to
get the clickable matplotlib browser when a display exists.

    python -m gluefactory_tpu.eval.inspect synthetic/default --metric H_error_ransac
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import numpy as np

from .. import logger
from ..settings import EVAL_PATH
from .eval_pipeline import load_eval


def plot_metric_scatter(results: dict, metric: str, out: Path, names=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vals = np.asarray(results[metric], dtype=float)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.scatter(np.arange(len(vals)), np.clip(vals, None, np.nanpercentile(vals, 98)))
    ax.set_xlabel("pair index")
    ax.set_ylabel(metric)
    ax.set_title(f"{metric}: median={np.nanmedian(vals):.3f}")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return vals


def render_pair(pred_file: Path, name: str, out: Path, data_loader=None):
    """Two-view match figure from cached predictions (requires keypoints in
    the cache; draws matches colored by score)."""
    from ..visualization.viz2d import plot_images, plot_matches, save_plot
    import matplotlib.pyplot as plt

    with h5py.File(str(pred_file), "r") as f:
        grp = f[name]
        kp0 = np.asarray(grp["keypoints0"])
        kp1 = np.asarray(grp["keypoints1"])
        m0 = np.asarray(grp["matches0"])
        ms0 = np.asarray(grp["matching_scores0"])
    valid = m0 > -1
    pts0 = kp0[valid]
    pts1 = kp1[np.clip(m0[valid], 0, None)]
    # no images in the cache: draw on blank canvases sized to the points
    w = int(max(kp0[:, 0].max(), kp1[:, 0].max())) + 16
    h = int(max(kp0[:, 1].max(), kp1[:, 1].max())) + 16
    blank = np.ones((h, w))
    fig, axes = plot_images([blank, blank], titles=[f"{name} (view0)", "(view1)"])
    import matplotlib.cm as cm

    color = cm.viridis(ms0[valid]).tolist() if valid.any() else "lime"
    if valid.any():
        plot_matches(pts0, pts1, color=color, axes=axes, a=0.5)
    save_plot(out)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "experiment",
        help="benchmark/tag (headless) or bare benchmark name with extra "
        "tags for the interactive multi-experiment browser",
    )
    parser.add_argument("extra_experiments", nargs="*",
                        help="more tags to compare (interactive mode)")
    parser.add_argument("--metric", default=None)
    parser.add_argument("--x", default=None)
    parser.add_argument("--y", default=None)
    parser.add_argument("--default_plot", default="matches")
    parser.add_argument("--n_extremes", type=int, default=3)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--interactive", action="store_true")
    parser.add_argument("--backend", type=str, default=None,
                        help="matplotlib backend for --interactive (e.g. TkAgg)")
    args = parser.parse_args()

    if args.interactive:
        return run_interactive(args)

    exp_dir = Path(EVAL_PATH) / args.experiment
    summaries, results = load_eval(exp_dir)
    logger.info("Summaries: %s", {k: v for k, v in summaries.items()})

    metrics = [
        k for k, v in results.items()
        if np.issubdtype(np.asarray(v).dtype, np.number) and np.asarray(v).ndim == 1
    ]
    metric = args.metric or (metrics[0] if metrics else None)
    if metric is not None and metric not in results:
        # threshold-suffixed keys (e.g. H_error_ransac_2.0): prefix match
        candidates = [k for k in metrics if k.startswith(metric)]
        metric = candidates[0] if candidates else metric
    if metric is None or metric not in results:
        logger.info("No numeric per-pair metrics found; keys: %s", list(results))
        return
    out_dir = Path(args.output) if args.output else exp_dir / "inspect"
    out_dir.mkdir(parents=True, exist_ok=True)

    vals = plot_metric_scatter(results, metric, out_dir / f"{metric}.png")
    logger.info("Wrote %s", out_dir / f"{metric}.png")

    names = [n.decode() if isinstance(n, bytes) else str(n) for n in results.get("name", [])]
    pred_file = exp_dir / "predictions.h5"
    if names and pred_file.exists():
        order = np.argsort(np.nan_to_num(vals, nan=np.inf))
        picks = [("best", i) for i in order[: args.n_extremes]] + [
            ("worst", i) for i in order[::-1][: args.n_extremes]
        ]
        for tag, i in picks:
            safe = names[i].replace("/", "_")
            try:
                render_pair(pred_file, names[i], out_dir / f"{tag}_{safe}.png")
            except KeyError:
                continue
        logger.info("Wrote %d pair figures to %s", len(picks), out_dir)

def run_interactive(args):  # pragma: no cover - needs display
    """Clickable multi-experiment browser: GlobalFrame metric scatter ->
    TwoViewFrame per-pair view (reference eval/inspect.py:15-61)."""
    import matplotlib

    if args.backend:
        matplotlib.use(args.backend)
    import matplotlib.pyplot as plt

    from . import get_benchmark
    from ..visualization.global_frame import GlobalFrame
    from ..visualization.two_view_frame import TwoViewFrame

    if "/" in args.experiment and not args.extra_experiments:
        benchmark, tag = args.experiment.split("/", 1)
        tags = [tag]
    else:
        benchmark, tags = args.experiment, list(args.extra_experiments)
        if not tags:
            tags = ["default"]
    output_dir = Path(EVAL_PATH) / benchmark
    pipeline = get_benchmark(benchmark)({})
    loader = pipeline.get_dataloader()

    results, predictions, summaries = {}, {}, {}
    for tag in tags:
        exp_dir = output_dir / tag
        s, results[tag] = load_eval(exp_dir)
        predictions[tag] = exp_dir / "predictions.h5"
        summaries[tag] = s
    logger.info("Summaries: %s", summaries)

    plt.close("all")
    frame = GlobalFrame(
        {"x": args.x, "y": args.y, "child": {"default": args.default_plot}},
        results, loader, predictions, child_frame=TwoViewFrame,
    )
    frame.draw()
    plt.show()


if __name__ == "__main__":
    main()
