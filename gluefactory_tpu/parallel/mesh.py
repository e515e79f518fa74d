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


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over the mesh.
    Scalars/objects without a leading divisible axis are replicated."""
    n = mesh.devices.size
    data_s = batch_sharding(mesh)
    repl = replicated(mesh)

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, data_s)
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)


__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "DATA_AXIS"]
