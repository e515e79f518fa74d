"""Benchmark registry + in-training benchmark hook.

Counterpart of reference gluefactory/eval/__init__.py:11-20: `run_benchmark`
is called from the training loop (reference train.py:381-393) to track real
benchmark metrics per epoch.
"""

from __future__ import annotations

from pathlib import Path


def get_benchmark(name: str):
    if name == "hpatches":
        from .hpatches import HPatchesPipeline

        return HPatchesPipeline
    if name == "megadepth1500":
        from .megadepth1500 import MegaDepth1500Pipeline

        return MegaDepth1500Pipeline
    if name == "eth3d":
        from .eth3d import ETH3DPipeline

        return ETH3DPipeline
    if name == "MP":
        from .MP import MPPipeline

        return MPPipeline
    if name == "synthetic":
        from .synthetic import SyntheticHomographyPipeline

        return SyntheticHomographyPipeline
    if name == "synthetic_pose":
        from .synthetic_pose import SyntheticPosePipeline

        return SyntheticPosePipeline
    raise ValueError(f"Unknown benchmark {name}")


def run_benchmark(benchmark: str, conf, experiment_dir: Path, model=None):
    """Run a benchmark pipeline and return its summaries
    (reference eval/__init__.py:11-20)."""
    experiment_dir = Path(experiment_dir)
    experiment_dir.mkdir(parents=True, exist_ok=True)
    pipeline = get_benchmark(benchmark)(conf)
    summaries, figures, _ = pipeline.run(
        experiment_dir, model=model, overwrite=True, overwrite_eval=True
    )
    return summaries, figures


__all__ = ["get_benchmark", "run_benchmark"]
