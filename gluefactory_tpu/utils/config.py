"""Layered configuration system.

The reference uses OmegaConf everywhere (SURVEY.md §5.6; reference
gluefactory/models/base_model.py:65-90, datasets/base_dataset.py:131-143).
We provide a small native equivalent with the same semantics:

  - recursive dict merge with override precedence (``merge``),
  - class-hierarchy ``default_conf`` accumulation (``merge_defaults``),
  - immutable, hashable view (``FrozenConfig``) so configs can be static
    attributes of flax modules and jit-safe,
  - YAML load/save and CLI ``key.path=value`` dotlist overrides,
  - struct-mode: merging a key unknown to the defaults raises, mirroring
    OmegaConf ``set_struct(True)`` (reference train.py:231).
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml

__all__ = [
    "FrozenConfig",
    "merge",
    "merge_checked",
    "load_yaml",
    "save_yaml",
    "parse_dotlist",
    "to_dict",
]


def to_dict(conf: Any) -> Any:
    """Recursively convert FrozenConfig/Mapping trees to plain dicts."""
    if isinstance(conf, FrozenConfig):
        return {k: to_dict(v) for k, v in conf._data.items()}
    if isinstance(conf, Mapping):
        return {k: to_dict(v) for k, v in conf.items()}
    if isinstance(conf, (list, tuple)):
        return [to_dict(v) for v in conf]
    return conf


def merge(base: Mapping | None, *overrides: Mapping | None) -> dict:
    """Recursive merge; later arguments win. Returns a new plain dict."""
    out = copy.deepcopy(to_dict(base)) if base else {}
    for override in overrides:
        if not override:
            continue
        _merge_into(out, to_dict(override), strict=False, path="")
    return out


def merge_checked(base: Mapping, *overrides: Mapping | None) -> dict:
    """Like merge, but raises KeyError on keys absent from ``base`` (struct mode)."""
    out = copy.deepcopy(to_dict(base))
    for override in overrides:
        if not override:
            continue
        _merge_into(out, to_dict(override), strict=True, path="")
    return out


def _merge_into(dst: dict, src: Mapping, strict: bool, path: str) -> None:
    for key, val in src.items():
        here = f"{path}.{key}" if path else str(key)
        if strict and key not in dst:
            raise KeyError(f"Unknown config key: {here!r}")
        if key in dst and isinstance(dst[key], dict) and isinstance(val, Mapping):
            _merge_into(dst[key], val, strict=strict, path=here)
        else:
            dst[key] = copy.deepcopy(to_dict(val))


class FrozenConfig(Mapping):
    """Immutable, hashable nested mapping with attribute access.

    Safe to use as a static attribute on flax.linen modules (hashable and
    comparable by value), and cheap to pass around the jit boundary.
    """

    __slots__ = ("_data", "_hash")

    def __init__(self, data: Mapping | None = None, **kw: Any):
        base = to_dict(data) if data else {}
        base.update(to_dict(kw))
        frozen = {
            k: FrozenConfig(v) if isinstance(v, Mapping) else _freeze_leaf(v)
            for k, v in base.items()
        }
        object.__setattr__(self, "_data", frozen)
        object.__setattr__(self, "_hash", None)

    # Mapping protocol
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    # Attribute access
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        raise TypeError("FrozenConfig is immutable")

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def __hash__(self) -> int:
        if self._hash is None:
            object.__setattr__(self, "_hash", hash(_hashable(self._data)))
        return self._hash

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, FrozenConfig):
            return self._data == other._data
        if isinstance(other, Mapping):
            return to_dict(self) == to_dict(other)
        return NotImplemented

    def __repr__(self) -> str:
        return f"FrozenConfig({to_dict(self)!r})"

    def update(self, *overrides: Mapping | None) -> "FrozenConfig":
        return FrozenConfig(merge(self, *overrides))


def _freeze_leaf(v: Any) -> Any:
    if isinstance(v, list):
        return tuple(_freeze_leaf(x) for x in v)
    return v


def _hashable(v: Any) -> Any:
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, FrozenConfig):
        return _hashable(v._data)
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    return v


def load_yaml(path: str | Path) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def save_yaml(conf: Mapping, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(conf), f, sort_keys=False)


def parse_dotlist(items: list[str]) -> dict:
    """Parse CLI overrides like ``model.matcher.n_layers=9`` into a nested dict."""
    out: dict = {}
    for item in items:
        if "=" not in item:
            raise ValueError(f"Expected key=value, got {item!r}")
        key, _, raw = item.partition("=")
        try:
            val = yaml.safe_load(raw)
        except yaml.YAMLError:
            val = raw
        node = out
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return out
