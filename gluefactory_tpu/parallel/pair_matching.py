"""Chip-parallel pairwise matching.

The workload's scaling axis is image PAIRS (SURVEY §2.10/§5.7): matching N
pairs across a mesh is a batch-sharded pjit of the matcher — each chip holds
a shard of the pair batch, no cross-chip traffic during matching (collectives
only appear in training grads / BA reductions). This helper builds that
sharded program for any matcher.
"""

from __future__ import annotations

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh, replicated


def make_pair_matcher(model, variables, mesh=None):
    """Returns match_pairs(batch) -> pred with the pair axis sharded over the
    mesh. `batch` leaves must have a leading pair axis divisible by the mesh
    size; params are replicated."""
    mesh = mesh or make_mesh()
    repl = replicated(mesh)
    data_s = batch_sharding(mesh)
    variables = jax.device_put(variables, repl)

    @jax.jit
    def _match(variables, batch):
        return model.apply(variables, batch)

    def match_pairs(batch):
        n = mesh.devices.size
        lead = jax.tree.leaves(batch)[0].shape[0]
        assert lead % n == 0, f"pair count {lead} not divisible by {n} chips"
        sharded = jax.tree.map(
            lambda x: jax.device_put(x, data_s)
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == lead
            else jax.device_put(x, repl),
            batch,
        )
        return _match(variables, sharded)

    return match_pairs


__all__ = ["make_pair_matcher"]
