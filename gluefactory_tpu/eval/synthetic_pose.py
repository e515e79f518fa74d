"""Hermetic relative-pose benchmark on synthetic 3D multi-plane scenes.

Applies the exact MegaDepth-1500 protocol (export -> epipolar precision +
RANSAC pose sweep -> AUC@5/10/20deg) to the zero-download synthetic_two_view
dataset. Use:
    python -m gluefactory_tpu.eval.synthetic_pose [--conf ...]
"""

from __future__ import annotations

from pathlib import Path

from ..datasets.synthetic_two_view import SyntheticTwoViewDataset
from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .relpose_benchmark import RelPoseBenchmarkPipeline


class SyntheticPosePipeline(RelPoseBenchmarkPipeline):
    default_conf = {
        "data": {
            "name": "synthetic_two_view",
            "image_size": [640, 480],
            "test_size": 20,
            "test_batch_size": 1,
        },
        "model": RelPoseBenchmarkPipeline.default_conf["model"],
        "eval": RelPoseBenchmarkPipeline.default_conf["eval"],
    }

    def make_dataset(self, data_conf):
        return SyntheticTwoViewDataset(data_conf)


if __name__ == "__main__":
    from .. import logger

    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    tag, conf = parse_eval_args("synthetic_pose", args, SyntheticPosePipeline.default_conf)
    experiment_dir = Path(EVAL_PATH) / "synthetic_pose" / tag
    pipeline = SyntheticPosePipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    logger.info("Summaries: %s", s)
