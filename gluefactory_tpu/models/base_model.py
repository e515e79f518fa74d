"""BaseModel: flax.linen counterpart of the reference's OmegaConf-merging
abstract nn.Module (gluefactory/models/base_model.py:13-157).

Key differences, by design:
  - Models are functional linen Modules; parameters live in pytrees outside
    the module, so `trainable`-freezing is enforced by the training runtime
    (optax masking / stop_gradient in the pipeline) rather than by mutating
    module state.
  - `default_conf` dictionaries are accumulated across the class hierarchy
    (the reference does this with a metaclass, base_model.py:13-22); the
    merged user conf is stored as a hashable FrozenConfig so modules remain
    jit-static.
  - `train`/`eval` mode is an explicit `is_training` conf/arg, not hidden
    module state.
"""

from __future__ import annotations

from typing import Any, ClassVar, Mapping

import flax.linen as nn

from ..utils.config import FrozenConfig, merge

__all__ = ["BaseModel"]


class BaseModel(nn.Module):
    """Base class for all models.

    Subclasses override:
      - ``default_conf`` (class attr dict) — merged over the MRO;
      - ``required_data_keys`` (class attr list) — checked at call time;
      - ``setup`` / ``__call__(data) -> pred`` — the forward pass;
      - ``loss(pred, data) -> (losses, metrics)`` — called through
        ``module.apply(variables, pred, data, method="loss")``.
    """

    conf: FrozenConfig

    base_default_conf: ClassVar[dict] = {
        "name": None,
        "trainable": True,  # enforced by the optimizer mask in train/trainer.py
        "timeit": False,
    }
    default_conf: ClassVar[dict] = {}
    required_data_keys: ClassVar[list] = []

    @classmethod
    def merged_default_conf(cls) -> dict:
        """Accumulate default_conf over the MRO, most-derived last (mirrors the
        reference MetaModel conf inheritance, base_model.py:13-22)."""
        confs = [BaseModel.base_default_conf]
        for klass in reversed(cls.__mro__):
            d = klass.__dict__.get("default_conf")
            if d:
                confs.append(d)
        return merge({}, *confs)

    @classmethod
    def from_conf(cls, conf: Mapping | None = None, **kwargs: Any) -> "BaseModel":
        """Build the module with user conf merged over the class defaults."""
        merged = merge(cls.merged_default_conf(), conf or {})
        return cls(conf=FrozenConfig(merged), **kwargs)

    def check_required_keys(self, data: Mapping) -> None:
        for key in self.required_data_keys:
            assert key in data, f"Missing key {key} in data"

    # subclass API -----------------------------------------------------------
    def __call__(self, data: Mapping) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

    def loss(self, pred: Mapping, data: Mapping):  # pragma: no cover - abstract
        raise NotImplementedError
