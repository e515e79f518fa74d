"""GT "matcher" from the pair homography (supervision component).

Counterpart of reference models/matchers/homography_matcher.py:8-66: wraps
geometry.gt_generation.gt_matches_from_homography and emits gt_-prefixed keys.
"""

from __future__ import annotations

from ...geometry.gt_generation import (
    gt_line_matches_from_homography,
    gt_matches_from_homography,
)
from ..base_model import BaseModel


class HomographyMatcher(BaseModel):
    default_conf = {
        "name": "homography_matcher",
        "use_points": True,
        "use_lines": False,
        "th_positive": 3.0,
        "th_negative": 6.0,
        "line_th_positive": 5.0,
        "line_th_negative": 10.0,
    }
    required_data_keys = ["H_0to1"]

    def __call__(self, data):
        self.check_required_keys(data)
        result = {}
        if self.conf.use_points:
            gt = gt_matches_from_homography(
                data["keypoints0"],
                data["keypoints1"],
                data["H_0to1"],
                pos_th=self.conf.th_positive,
                neg_th=self.conf.th_negative,
                valid0=data.get("keypoint_mask0"),
                valid1=data.get("keypoint_mask1"),
            )
            result = {
                "gt_assignment": gt["assignment"],
                "gt_matches0": gt["matches0"],
                "gt_matches1": gt["matches1"],
                "gt_matching_scores0": gt["matching_scores0"],
                "gt_matching_scores1": gt["matching_scores1"],
                "gt_proj_0to1": gt["proj_0to1"],
                "gt_proj_1to0": gt["proj_1to0"],
            }
        if self.conf.use_lines and "lines0" in data:
            gt_lines = gt_line_matches_from_homography(
                data["lines0"],
                data["lines1"],
                data["H_0to1"],
                pos_th=self.conf.line_th_positive,
                neg_th=self.conf.line_th_negative,
                valid0=data.get("line_mask0"),
                valid1=data.get("line_mask1"),
            )
            result.update({f"gt_{k}": v for k, v in gt_lines.items()})
        return result

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = HomographyMatcher
