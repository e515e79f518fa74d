"""Wireframe extractor: fuse a point extractor and a line extractor into the
junction-based input GlueStick requires.

Counterpart of reference gluefactory/models/lines/wireframe.py:131-312, with
one static-shape adaptation: the reference merges nearby line endpoints into
shared junctions (dynamic junction count); here every line endpoint IS a
junction (2L junctions, then K keypoints), which keeps shapes static. Line
connectivity across shared endpoints is still expressed through the line
message-passing layer attending over spatially-identical junction
descriptors. Keypoints closer than nms_radius to any endpoint are masked out
(reference :185-211 removes them).

Outputs: keypoints (B, 2L+K, 2) [junctions first], keypoint_scores,
descriptors, keypoint_mask, lines (B, L, 2, 2), line_scores, line_mask,
lines_junc_idx (B, L, 2) indices into the junction axis, orig_lines.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import get_model
from ..base_model import BaseModel
from ..extractors.superpoint_open import sample_descriptors
from ...utils.config import to_dict


class WireframeExtractor(BaseModel):
    default_conf = {
        "name": "wireframe",
        "point_extractor": {
            "name": "superpoint_open",
            "trainable": False,
            "dense_outputs": True,
            "max_num_keypoints": 512,
        },
        "line_extractor": {
            "name": "lsd",
            "trainable": False,
            "max_num_lines": 250,
            "min_length": 15,
        },
        "wireframe_params": {"merge_points": True, "nms_radius": 3},
    }
    required_data_keys = ["image"]

    def setup(self):
        self.point_extractor = get_model(
            self.conf.point_extractor["name"]
        ).from_conf(to_dict(self.conf.point_extractor))
        self.line_extractor = get_model(
            self.conf.line_extractor["name"]
        ).from_conf(to_dict(self.conf.line_extractor))

    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        pred_lines = self.line_extractor(data)
        pred_pts = self.point_extractor(data)

        lines = pred_lines["lines"]  # (B, L, 2, 2)
        line_scores = pred_lines["line_scores"]
        line_mask = pred_lines["line_mask"]
        b, L = lines.shape[:2]

        kpts = pred_pts["keypoints"]  # (B, K, 2)
        kp_scores = pred_pts["keypoint_scores"]
        kp_desc = pred_pts["descriptors"]
        kp_mask = pred_pts.get("keypoint_mask", jnp.ones(kpts.shape[:-1], bool))

        endpoints = lines.reshape(b, 2 * L, 2)
        ep_mask = jnp.repeat(line_mask, 2, axis=-1)

        if conf.wireframe_params["merge_points"]:
            # mask out keypoints too close to a line endpoint (ref :185-211)
            d = jnp.linalg.norm(
                kpts[:, :, None, :] - endpoints[:, None, :, :], axis=-1
            )
            d = jnp.where(ep_mask[:, None, :], d, jnp.inf)
            close = jnp.any(d < conf.wireframe_params["nms_radius"], axis=-1)
            kp_mask = kp_mask & (~close)
            kp_scores = jnp.where(kp_mask, kp_scores, 0.0)

        # endpoint descriptors from the dense map
        dense = pred_pts.get("dense_descriptors")
        if dense is not None:
            stride = data["image"].shape[1] // dense.shape[1]
            ep_desc = sample_descriptors(endpoints, dense, stride)
        else:
            ep_desc = jnp.zeros(endpoints.shape[:-1] + (kp_desc.shape[-1],), kp_desc.dtype)

        # endpoint scores: inherit the (normalized) line score
        ep_scores = jnp.repeat(line_scores, 2, axis=-1)

        all_points = jnp.concatenate([endpoints, kpts], axis=1)
        all_scores = jnp.concatenate([ep_scores, kp_scores], axis=1)
        all_desc = jnp.concatenate([ep_desc, kp_desc], axis=1)
        all_mask = jnp.concatenate([ep_mask, kp_mask], axis=1)

        lines_junc_idx = jnp.broadcast_to(
            jnp.arange(2 * L).reshape(1, L, 2), (b, L, 2)
        )

        return {
            "keypoints": all_points,
            "keypoint_scores": all_scores,
            "descriptors": all_desc,
            "keypoint_mask": all_mask,
            "lines": lines,
            "orig_lines": lines,
            "line_scores": line_scores,
            "line_mask": line_mask,
            "lines_junc_idx": lines_junc_idx,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = WireframeExtractor
