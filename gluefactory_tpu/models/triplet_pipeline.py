"""Triplet (3-view) pipeline.

Counterpart of reference gluefactory/models/triplet_pipeline.py:23-99 +
utils/misc.py:14-44: runs the two-view pipeline on the three pairs
(0to1, 0to2, 1to2) by STACKING them along the batch axis — one compiled
two-view program serves all pairs — then unstacks per-pair predictions.
"""

from __future__ import annotations

import jax.numpy as jnp

from .two_view_pipeline import TwoViewPipeline


def stack_twoviews(data: dict) -> dict:
    """{view0, view1, view2, H_0to1, H_0to2, H_1to2} -> batched two-view data
    with batch axis ordered [0to1, 0to2, 1to2] (reference utils/misc.py:14-35)."""

    def cat(*xs):
        return jnp.concatenate(xs, axis=0)

    def cat_views(a, b):
        out = {}
        for k in a:
            if k in b and hasattr(a[k], "shape"):
                out[k] = cat(a[k], b[k])
        return out

    v0, v1, v2 = data["view0"], data["view1"], data["view2"]
    stacked = {
        "view0": {k: cat(v0[k], v0[k], v1[k]) for k in v0 if hasattr(v0[k], "shape")},
        "view1": {k: cat(v1[k], v2[k], v2[k]) for k in v1 if hasattr(v1[k], "shape")},
    }
    if "H_0to1" in data:
        stacked["H_0to1"] = cat(data["H_0to1"], data["H_0to2"], data["H_1to2"])
    if "T_0to1" in data:
        import jax

        stacked["T_0to1"] = jax.tree.map(
            lambda a, b, c: cat(a, b, c), data["T_0to1"], data["T_0to2"], data["T_1to2"]
        )
    return stacked


def unstack_twoviews(pred: dict, b: int) -> dict:
    """Split stacked predictions back into 0to1 / 0to2 / 1to2 groups
    (reference utils/misc.py:38-44)."""
    out = {}
    for suffix, i in (("0to1", 0), ("0to2", 1), ("1to2", 2)):
        out[suffix] = {
            k: v[i * b : (i + 1) * b] for k, v in pred.items() if hasattr(v, "shape")
        }
    return out


class TripletPipeline(TwoViewPipeline):
    default_conf = {
        "name": "triplet_pipeline",
        "batch_triplets": True,
    }
    required_data_keys = ["view0", "view1", "view2"]

    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        b = data["view0"]["image" if "image" in data["view0"] else "image_size"].shape[0]
        stacked = stack_twoviews(data)
        pred = super().__call__(stacked)
        per_pair = unstack_twoviews(pred, b)
        out = {"stacked": pred}
        for suffix, p in per_pair.items():
            out.update({f"{k}_{suffix}": v for k, v in p.items()})
        return out

    def loss(self, pred: dict, data: dict):
        stacked_pred = pred["stacked"]
        stacked_data = stack_twoviews(data)
        return super().loss(stacked_pred, stacked_data)


__main_model__ = TripletPipeline
