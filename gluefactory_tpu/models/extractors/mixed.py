"""MixedExtractor: combine a separate detector and descriptor model.

Counterpart of reference models/extractors/mixed.py:10-79: run a detector for
keypoints and a descriptor model for dense features, then interpolate
descriptors at the detected keypoints.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import get_model
from ..base_model import BaseModel
from ...utils.config import to_dict
from .aliked import _bilinear_raw


class MixedExtractor(BaseModel):
    default_conf = {
        "name": "mixed",
        "detector": {"name": None},
        "descriptor": {"name": None},
        "interpolate_descriptors_from": "dense_descriptors",
    }
    required_data_keys = ["image"]

    def setup(self):
        self.detector = get_model(self.conf.detector["name"]).from_conf(
            to_dict(self.conf.detector)
        )
        self.descriptor = get_model(self.conf.descriptor["name"]).from_conf(
            to_dict(self.conf.descriptor)
        )

    def __call__(self, data):
        self.check_required_keys(data)
        pred = dict(self.detector(data))
        dpred = self.descriptor({**data, **pred})
        key = self.conf.interpolate_descriptors_from
        if key in dpred:
            dense = dpred[key]  # (B, Hc, Wc, D)
            h = data["image"].shape[1]
            stride = max(h // dense.shape[1], 1)
            kp = pred["keypoints"]
            x = (kp[..., 0] + 0.5) / stride - 0.5
            y = (kp[..., 1] + 0.5) / stride - 0.5
            desc = _bilinear_raw(dense, x, y)
            desc = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
            )
            pred["descriptors"] = desc
        else:
            pred.update({k: v for k, v in dpred.items() if k not in pred})
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = MixedExtractor
