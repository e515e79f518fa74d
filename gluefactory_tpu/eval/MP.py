"""Multispectral (optical<->thermal) homography benchmark.

Counterpart of reference gluefactory/eval/MP.py:29-202: the HPatches protocol
applied to optical/thermal pairs (the fork's headline eval).
    python -m gluefactory_tpu.eval.MP [--conf ...]
"""

from __future__ import annotations

from pathlib import Path

from ..datasets.mp_image_pairs import MPImagePairs
from ..settings import EVAL_PATH
from .homography_benchmark import HomographyBenchmarkPipeline
from .io import get_eval_parser, parse_eval_args


class MPPipeline(HomographyBenchmarkPipeline):
    default_conf = {
        "data": {
            "name": "mp_image_pairs",
            "mp": {
                "filename": None,  # synthetic pairs by default (zero-egress)
                "augmentation": {
                    "photometric": {"enable": False},
                    "homographic": {
                        "enable": True,
                        "params": {"difficulty": 0.4, "translation": 0.3,
                                    "max_angle": 25},
                    },
                },
            },
            "test_batch_size": 1,
        },
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "sift", "max_num_keypoints": 1024},
            "matcher": {"name": "nearest_neighbor_matcher", "ratio_thresh": 0.95},
        },
        "eval": HomographyBenchmarkPipeline.default_conf["eval"],
    }

    def make_dataset(self, data_conf):
        return MPImagePairs(data_conf)


if __name__ == "__main__":
    from .. import logger

    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    tag, conf = parse_eval_args("MP", args, MPPipeline.default_conf)
    experiment_dir = Path(EVAL_PATH) / "MP" / tag
    pipeline = MPPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    logger.info("Summaries: %s", s)
