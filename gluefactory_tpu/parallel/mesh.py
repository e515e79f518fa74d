"""Device mesh and sharding helpers.

The TPU-native counterpart of the reference's NCCL/DDP layer (SURVEY §2.10,
reference train.py:241-246, 691-698): a 1-D "data" mesh over all chips; the
batch (image pairs) is sharded over it, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI. TP/PP/SP axes are deliberately
absent: LightGlue is ~12M params and n<=4096 tokens — the scaling axis of
this workload is image PAIRS (reference has DP only as well).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, strict: bool = True):
    """Device-put a host batch with the leading (batch) axis sharded over the
    mesh; scalars and non-batch leaves are replicated.

    The batch size is taken from the first array leaf. `strict` (default)
    raises when that batch size is not divisible by the mesh size — silently
    replicating a mis-sized batch would hide a wrong-global-batch bug (each
    device would redo the full batch instead of its shard)."""
    n = mesh.devices.size
    data_s = batch_sharding(mesh)
    repl = replicated(mesh)

    leaves = [x for x in jax.tree.leaves(batch) if hasattr(x, "shape") and x.ndim >= 1]
    # the batch size is the most common leading dim across array leaves (a
    # lone non-batch-shaped leaf that happens to sort first must not win)
    if leaves:
        from collections import Counter

        bs = Counter(x.shape[0] for x in leaves).most_common(1)[0][0]
    else:
        bs = None
    if strict and bs is not None and bs % n != 0:
        raise ValueError(
            f"batch size {bs} is not divisible by the {n}-device mesh; pad the "
            f"batch or pass strict=False to replicate instead"
        )

    multiproc = jax.process_count() > 1
    if multiproc:
        # every process loads the IDENTICAL global batch (the datasets are
        # deterministic in the sample index); each contributes its slice of
        # the global array (reference counterpart: DistributedSampler +
        # per-rank loaders, train.py:257-270)
        rank = jax.process_index()
        n_proc = jax.process_count()

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == bs and bs % n == 0:
            if multiproc:
                x = np.asarray(x)
                per = bs // n_proc
                return jax.make_array_from_process_local_data(
                    data_s, x[rank * per : (rank + 1) * per]
                )
            return jax.device_put(x, data_s)
        if multiproc:
            return jax.make_array_from_process_local_data(repl, np.asarray(x))
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)


__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "DATA_AXIS"]
