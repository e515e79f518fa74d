"""Robust estimator interface + registry.

Counterpart of reference gluefactory/robust_estimators/base_estimator.py:6-33
and __init__.py:6-15. Estimators are configured with `ransac_th` plus options
and called with a data dict of matched keypoints; unlike the reference's C++
backends they run batched on-device.
"""

from __future__ import annotations

import importlib.util
from typing import ClassVar

from ..utils.config import FrozenConfig, merge


class BaseEstimator:
    base_default_conf: ClassVar[dict] = {"name": None, "ransac_th": 3.0, "options": {}}
    default_conf: ClassVar[dict] = {}
    required_data_keys: ClassVar[list] = []

    def __init__(self, conf=None):
        merged = merge(self.base_default_conf, self.default_conf, conf or {})
        self.conf = FrozenConfig(merged)

    def __call__(self, data: dict) -> dict:
        for key in self.required_data_keys:
            assert key in data, f"Missing key {key} in data"
        return self._forward(data)

    def _forward(self, data: dict) -> dict:
        raise NotImplementedError


def load_estimator(type_: str, name: str):
    """load_estimator("homography", "jax_ransac") -> estimator class."""
    base = __name__.rsplit(".", 1)[0]
    for path in (f"{base}.{type_}.{name}", f"{base}.{name}"):
        if importlib.util.find_spec(path) is not None:
            mod = __import__(path, fromlist=[""])
            main = getattr(mod, "__main_estimator__", None)
            if main is not None:
                return main
    raise RuntimeError(f"Estimator {type_}/{name} not found")


__all__ = ["BaseEstimator", "load_estimator"]
