"""Model timing helper.

Counterpart of reference gluefactory/utils/benchmark.py:7-33 (CUDA-event /
perf_counter timing). On the axon TPU relay `block_until_ready` does not
block, so timings force a scalar fetch; one fetch after r dispatches times
the whole in-order queue (see bench.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def benchmark(apply_fn, data, r: int = 10, warmup: int = 3) -> dict:
    """Time apply_fn(data) over r repetitions. apply_fn should be jitted.

    Returns dict with mean/std per-call milliseconds and calls/s.
    """

    def scalarize(out):
        leaves = [x.sum() for x in jax.tree.leaves(out) if hasattr(x, "sum")]
        return sum(leaves) if leaves else jnp.zeros(())

    for _ in range(warmup):
        float(scalarize(apply_fn(data)))

    times = []
    for _ in range(r):
        t0 = time.perf_counter()
        float(scalarize(apply_fn(data)))
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    # amortized: r dispatches, one fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(r):
        out = apply_fn(data)
    float(scalarize(out))
    amortized_ms = (time.perf_counter() - t0) * 1e3 / r
    return {
        "mean_ms": float(times.mean()),
        "std_ms": float(times.std()),
        "amortized_ms": float(amortized_ms),
        "calls_per_s": float(1e3 / max(amortized_ms, 1e-9)),
    }


__all__ = ["benchmark"]
