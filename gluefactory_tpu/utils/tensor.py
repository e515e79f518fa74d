"""Nested dict/array helpers (counterpart of reference
gluefactory/utils/tensor.py:13-48)."""

from __future__ import annotations

import numpy as np


def map_tensor(tree, fn, prune_none: bool = False):
    """Apply fn to every array leaf of a nested dict/list/tuple, keeping
    structure. Strings and scalars pass through unchanged unless fn handles
    them. With prune_none, drop keys whose mapped value is None."""
    if isinstance(tree, dict):
        out = {k: map_tensor(v, fn, prune_none) for k, v in tree.items()}
        if prune_none:
            out = {k: v for k, v in out.items() if v is not None}
        return out
    if isinstance(tree, (list, tuple)) and not hasattr(tree, "shape"):
        vals = [map_tensor(v, fn, prune_none) for v in tree]
        return type(tree)(vals)
    if isinstance(tree, (str, bytes)) or tree is None:
        return tree
    return fn(tree)


def batch_to_numpy(batch):
    return map_tensor(batch, lambda x: np.asarray(x))


def rbd(data: dict) -> dict:
    """Remove batch dimension from every array leaf (reference tensor.py:38)."""
    return map_tensor(
        data, lambda x: x[0] if hasattr(x, "shape") and len(x.shape) > 0 else x
    )


def index_batch(batch):
    """Iterate the items of a batched dict (reference tensor.py:43-48)."""
    leaves = []

    def first_len(tree):
        if isinstance(tree, dict):
            for v in tree.values():
                n = first_len(v)
                if n is not None:
                    return n
            return None
        if hasattr(tree, "shape") and len(getattr(tree, "shape", ())) > 0:
            return tree.shape[0]
        if isinstance(tree, list):
            return len(tree)
        return None

    n = first_len(batch)
    for i in range(n):
        yield map_tensor(
            batch,
            lambda x: x[i] if hasattr(x, "shape") and len(x.shape) > 0 else x,
        )


__all__ = ["map_tensor", "batch_to_numpy", "rbd", "index_batch"]
