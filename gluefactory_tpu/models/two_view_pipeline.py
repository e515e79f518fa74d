"""Two-view sparse matching pipeline.

Counterpart of reference gluefactory/models/two_view_pipeline.py:21-121:
composes extractor -> matcher -> filter -> solver -> ground_truth; each step
is optional and cached features ("cache" in a view) can replace extraction.

Match convention (two_view_pipeline.py:9-11): matches0[i] = index in image 1
of the match of keypoint i in image 0, or -1 if unmatched (-2 = ignore in GT).

TPU adaptations: components with conf.trainable=False get their outputs passed
through `stop_gradient` (parameter freezing itself is handled by the optimizer
mask in train/trainer.py); all predictions are fixed-shape with keypoint
masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import get_model
from .base_model import BaseModel
from ..utils.config import to_dict


class TwoViewPipeline(BaseModel):
    default_conf = {
        "name": "two_view_pipeline",
        "extractor": {"name": None, "trainable": False},
        "matcher": {"name": None},
        "filter": {"name": None},
        "solver": {"name": None},
        "ground_truth": {"name": None},
        "allow_no_extract": False,
        "run_gt_in_forward": False,
        # TPU: run ONE extractor call on both views stacked along the batch
        # axis (2B) instead of two B-sized calls. Bit-identical (extraction is
        # per-sample). Measured on v5e: +3% at B=1 (launch-bound eval) but
        # -7% at B=8 (the wider conv tiles worse). "auto" (default) stacks
        # only when the traced batch is 1 — the single-pair/streaming case
        # the reference's early-exit design targets (lightglue.py:595-606);
        # True forces it, False disables.
        "batch_extraction": "auto",
    }
    required_data_keys = ["view0", "view1"]
    components = ["extractor", "matcher", "filter", "solver", "ground_truth"]

    def setup(self):
        for k in self.components:
            sub = self.conf.get(k)
            if sub and sub.get("name"):
                setattr(self, k, get_model(sub["name"]).from_conf(to_dict(sub)))

    def _has(self, k):
        sub = self.conf.get(k)
        return bool(sub and sub.get("name"))

    def extract_view(self, data, i: str):
        data_i = data[f"view{i}"]
        pred_i = dict(data_i.get("cache", {}))
        skip_extract = len(pred_i) > 0 and self.conf.allow_no_extract
        if self._has("extractor") and not skip_extract:
            pred_i = {**pred_i, **self.extractor({**data_i, **pred_i})}
        if not self.conf.extractor.get("trainable", False):
            pred_i = jax.tree.map(jax.lax.stop_gradient, pred_i)
        return pred_i

    def _can_batch_extract(self, data) -> bool:
        be = self.conf.batch_extraction
        if not (be and self._has("extractor")):
            return False
        v0, v1 = data["view0"], data["view1"]
        if "cache" in v0 or "cache" in v1:
            return False
        img0, img1 = v0.get("image"), v1.get("image")
        if img0 is None or img1 is None or img0.shape != img1.shape:
            return False
        # "auto": stack only at batch 1 (shape is static under jit, so this
        # is a trace-time decision; see default_conf note for the A/B)
        return True if be is True else img0.shape[0] == 1

    def _extract_batched(self, data):
        v0, v1 = data["view0"], data["view1"]
        b = v0["image"].shape[0]
        import numpy as np

        def stackable(a, b):
            # plain arrays only: view dicts can carry Pose/Camera pytree
            # wrappers (eval datasets), which the extractor never reads
            return (
                isinstance(a, (jnp.ndarray, np.ndarray))
                and isinstance(b, (jnp.ndarray, np.ndarray))
                and a.shape == b.shape
            )

        stacked = {
            k: jnp.concatenate([v0[k], v1[k]], axis=0)
            for k in v0
            if k in v1 and stackable(v0[k], v1[k])
        }
        pred = self.extractor(stacked)
        if not self.conf.extractor.get("trainable", False):
            pred = jax.tree.map(jax.lax.stop_gradient, pred)
        pred0 = jax.tree.map(lambda x: x[:b], pred)
        pred1 = jax.tree.map(lambda x: x[b:], pred)
        return pred0, pred1

    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        if self._can_batch_extract(data):
            pred0, pred1 = self._extract_batched(data)
        else:
            pred0 = self.extract_view(data, "0")
            pred1 = self.extract_view(data, "1")
        pred = {
            **{k + "0": v for k, v in pred0.items()},
            **{k + "1": v for k, v in pred1.items()},
        }
        for k in ("matcher", "filter", "solver"):
            if self._has(k):
                pred = {**pred, **getattr(self, k)({**data, **pred})}
        if self._has("ground_truth") and self.conf.run_gt_in_forward:
            pred.update(self.ground_truth({**data, **pred}))
        return pred

    def loss(self, pred: dict, data: dict):
        losses, metrics = {}, {}
        total = 0
        if self._has("ground_truth") and not self.conf.run_gt_in_forward:
            pred = {**pred, **self.ground_truth({**data, **pred})}
        for k in self.components:
            if not self._has(k):
                continue
            sub_conf = self.conf.get(k)
            if not sub_conf.get("apply_loss", True):
                continue
            try:
                losses_, metrics_ = getattr(self, k).loss(pred, {**pred, **data})
            except NotImplementedError:
                continue
            losses = {**losses, **losses_}
            metrics = {**metrics, **metrics_}
            total = losses_["total"] + total
        return {**losses, "total": total}, metrics


__main_model__ = TwoViewPipeline
