"""GT "matcher" from relative pose + depth (supervision component).

Counterpart of reference models/matchers/depth_matcher.py:10-82: wraps
geometry.gt_generation.gt_matches_from_pose_depth.
"""

from __future__ import annotations

from ...geometry.gt_generation import (
    gt_line_matches_from_pose_depth,
    gt_matches_from_pose_depth,
)
from ..base_model import BaseModel


class DepthMatcher(BaseModel):
    default_conf = {
        "name": "depth_matcher",
        "use_points": True,
        "use_lines": False,  # line GT for GlueStick (reference :18,64-79)
        "line_th_positive": 5.0,  # endpoint-reprojection distances; replaces
        "line_th_negative": 10.0,  # the reference's sampled-point Hungarian knobs
        "th_positive": 3.0,
        "th_negative": 5.0,
        "th_epi": None,  # add epipolar-based negatives (reference :15)
        "th_cc": None,  # cycle-consistency threshold
    }
    required_data_keys = ["view0", "view1", "T_0to1", "T_1to0"]

    def __call__(self, data):
        self.check_required_keys(data)
        result = {}
        if self.conf.use_points:
            keys = {}
            if "depth_keypoints0" in data:
                keys = {
                    k: data[k]
                    for k in (
                        "depth_keypoints0",
                        "valid_depth_keypoints0",
                        "depth_keypoints1",
                        "valid_depth_keypoints1",
                    )
                }
            gt = gt_matches_from_pose_depth(
                data["keypoints0"],
                data["keypoints1"],
                data,
                pos_th=self.conf.th_positive,
                neg_th=self.conf.th_negative,
                epi_th=self.conf.th_epi,
                cc_th=self.conf.th_cc,
                valid0=data.get("keypoint_mask0"),
                valid1=data.get("keypoint_mask1"),
                **keys,
            )
            result = {
                "gt_assignment": gt["assignment"],
                "gt_matches0": gt["matches0"],
                "gt_matches1": gt["matches1"],
                "gt_matching_scores0": gt["matching_scores0"],
                "gt_matching_scores1": gt["matching_scores1"],
                "gt_proj_0to1": gt["proj_0to1"],
                "gt_proj_1to0": gt["proj_1to0"],
                "gt_visible0": gt["visible0"],
                "gt_visible1": gt["visible1"],
            }
        if self.conf.use_lines and "lines0" in data:
            gt_lines = gt_line_matches_from_pose_depth(
                data["lines0"],
                data["lines1"],
                data,
                pos_th=self.conf.line_th_positive,
                neg_th=self.conf.line_th_negative,
                valid0=data.get("line_mask0"),
                valid1=data.get("line_mask1"),
            )
            result.update({f"gt_{k}": v for k, v in gt_lines.items()})
        return result

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = DepthMatcher
