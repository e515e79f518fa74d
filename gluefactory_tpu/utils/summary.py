"""Experiment summary writer (counterpart of the reference's TensorBoard
SummaryWriter usage, train.py:310,485-505,541-579).

Always writes an append-only `events.jsonl` (hermetic, greppable in tests);
additionally mirrors scalars/figures to TensorBoard when the package is
importable. Figures are also saved as PNGs under <dir>/figures/.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

__all__ = ["ExperimentWriter"]


class ExperimentWriter:
    def __init__(self, output_dir: Path | str):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._events = open(self.dir / "events.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.dir))
        except Exception:  # noqa: BLE001 - TB is best-effort
            pass

    def scalars(self, step: int, values: dict, prefix: str = "") -> None:
        clean = {}
        for k, v in values.items():
            try:
                clean[f"{prefix}{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        self._events.write(
            json.dumps({"step": int(step), "ts": time.time(), **clean}) + "\n"
        )
        self._events.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)

    def histogram(self, step: int, name: str, values) -> None:
        """Log a value distribution: bin counts into events.jsonl (hermetic)
        and a real histogram to TB when available (counterpart of the
        reference's add_histogram calls, train.py:507-519)."""
        import numpy as np

        vals = np.asarray(values, np.float64).reshape(-1)
        vals = vals[np.isfinite(vals)]
        if vals.size == 0:
            return
        counts, edges = np.histogram(vals, bins=min(16, max(1, vals.size)))
        self._events.write(
            json.dumps(
                {
                    "step": int(step),
                    "ts": time.time(),
                    f"{name}__hist": {
                        "counts": counts.tolist(),
                        "edges": np.round(edges, 6).tolist(),
                        "mean": float(vals.mean()),
                        "max": float(vals.max()),
                    },
                }
            )
            + "\n"
        )
        self._events.flush()
        if self._tb is not None:
            self._tb.add_histogram(name, vals, step)

    def figure(self, step: int, name: str, fig) -> Path:
        """Save a matplotlib figure as PNG (and to TB if available)."""
        fig_dir = self.dir / "figures"
        fig_dir.mkdir(exist_ok=True)
        path = fig_dir / f"{name.replace('/', '_')}_{step}.png"
        fig.savefig(path, bbox_inches="tight", dpi=100)
        if self._tb is not None:
            self._tb.add_figure(name, fig, step)
        import matplotlib.pyplot as plt

        plt.close(fig)
        return path

    def close(self) -> None:
        self._events.close()
        if self._tb is not None:
            self._tb.close()
