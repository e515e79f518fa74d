"""MegaDepth-1500 relative-pose benchmark CLI.

Counterpart of reference gluefactory/eval/megadepth1500.py:26-189:
    python -m gluefactory_tpu.eval.megadepth1500 --conf <name> ...
Pose AUC@5/10/20deg over the 1500 calibrated pairs (pairs_calibrated.txt via
the ImagePairs dataset), resize-1600-long preprocessing. Requires the
megadepth1500 images + pairs file on disk (zero-egress; reference
auto-downloads at :61-69).
"""

from __future__ import annotations

from pathlib import Path

from ..datasets.image_pairs import ImagePairs
from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .relpose_benchmark import RelPoseBenchmarkPipeline


class MegaDepth1500Pipeline(RelPoseBenchmarkPipeline):
    default_conf = {
        "data": {
            "name": "image_pairs",
            "pairs": "megadepth1500/pairs_calibrated.txt",
            "root": "megadepth1500/images/",
            "preprocessing": {
                "resize": 1600,
                "side": "long",
                "pad_to": [1600, 1600],
            },
            "test_batch_size": 1,
        },
        "model": RelPoseBenchmarkPipeline.default_conf["model"],
        "eval": RelPoseBenchmarkPipeline.default_conf["eval"],
    }

    def make_dataset(self, data_conf):
        return ImagePairs(data_conf)


if __name__ == "__main__":
    from .. import logger

    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    tag, conf = parse_eval_args("megadepth1500", args, MegaDepth1500Pipeline.default_conf)
    experiment_dir = Path(EVAL_PATH) / "megadepth1500" / tag
    pipeline = MegaDepth1500Pipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    logger.info("Summaries: %s", s)
