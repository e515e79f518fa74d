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


def overlay_restored_variables(variables: dict, restored: dict) -> dict:
    """Overlay a restored {params, batch_stats?} tree onto freshly-
    initialized flax variables: top-level param components replaced by name,
    BatchNorm running stats carried with the checkpoint (a trained BN
    extractor is wrong without them). The single shared implementation for
    bench.py and the eval export path."""
    trained = restored.get("params", restored)
    params = dict(variables["params"])
    for k in params:
        if k in trained:
            params[k] = trained[k]
    out = {**variables, "params": params}
    t_stats = restored.get("batch_stats") or {}
    if t_stats:
        stats = dict(variables.get("batch_stats", {}))
        for k in set(stats) | set(t_stats):
            if k in t_stats:
                stats[k] = t_stats[k]
        out["batch_stats"] = stats
    return out


def overlay_npz_variables(variables: dict, path: str | Path) -> dict:
    """Overlay a flat f16 .npz artifact (hermetic_quality_loop
    --dump-weights format): f16 leaves upcast to f32, then
    overlay_restored_variables."""
    import jax

    restored = load_npz_params(path)
    restored = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float16 else x,
        restored,
    )
    return overlay_restored_variables(variables, restored)


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
