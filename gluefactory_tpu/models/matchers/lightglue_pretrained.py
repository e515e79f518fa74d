"""LightGlue with converted official weights.

Counterpart of reference models/matchers/lightglue_pretrained.py:7-36 and
lightglue_pretrained_MINE.py (wrappers around the pip `lightglue` package /
local fork checkpoints). Here the official .pth is converted once with
scripts/convert_weights.py into an .npz in OUR stacked layout; this model is
LightGlue with those parameters loaded at init time.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .lightglue import LightGlue


def load_npz_params(path: str | Path) -> dict:
    """Load a convert_weights.py .npz into a flax params tree
    ('params/name' flat keys -> nested dict)."""
    flat = np.load(str(path))
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree


class LightGluePretrained(LightGlue):
    default_conf = {
        "name": "lightglue_pretrained",
        "weights": None,  # path to converted .npz (REQUIRED)
        "filter_threshold": 0.1,
        "depth_confidence": 0.95,
        "width_confidence": 0.99,
    }

    def pretrained_variables(self) -> dict:
        """The converted parameter tree, ready for `model.apply`."""
        assert self.conf.weights, "lightglue_pretrained needs conf.weights (.npz)"
        return load_npz_params(self.conf.weights)


__main_model__ = LightGluePretrained
