"""Registry bridge: `get_dataset("synthetic_shapes")` -> the multipoint
SyntheticShapes generator (multipoint/datasets/synthetic_shapes.py), so
train/eval configs can use it like any other dataset (reference counterpart:
gluefactory/multipoint datasets are reachable through the same registry)."""

from ..multipoint.datasets.synthetic_shapes import SyntheticShapes

__main_dataset__ = SyntheticShapes

__all__ = ["SyntheticShapes"]
