"""Model registry (counterpart of reference gluefactory/models/__init__.py:7-30).

`get_model(name)` resolves "matchers.lightglue", "lightglue", or a full import
path; modules may export `__main_model__` to pick the class.
"""

import importlib.util

from .base_model import BaseModel


def get_class(mod_path: str, base: type):
    """Import mod_path and return its unique BaseModel subclass or
    __main_model__ (reference utils/tools.py:193-205)."""
    mod = __import__(mod_path, fromlist=[""])
    main = getattr(mod, "__main_model__", None)
    if main is not None:
        return main
    classes = [
        v
        for v in mod.__dict__.values()
        if isinstance(v, type) and issubclass(v, base) and v.__module__ == mod_path
    ]
    if len(classes) != 1:
        raise ValueError(f"Expected one model class in {mod_path}, got {classes}")
    return classes[0]


def get_model(name: str):
    import_paths = [
        name,
        f"{__name__}.{name}",
        f"{__name__}.extractors.{name}",
        f"{__name__}.matchers.{name}",
        f"{__name__}.lines.{name}",
        f"{__name__}.backbones.{name}",
    ]
    for path in import_paths:
        try:
            found = importlib.util.find_spec(path) is not None
        except ModuleNotFoundError:  # nonexistent parent package
            found = False
        if found:
            return get_class(path, BaseModel)
    raise RuntimeError(f"Model {name} not found in any of [{' '.join(import_paths)}]")


__all__ = ["BaseModel", "get_model", "get_class"]
