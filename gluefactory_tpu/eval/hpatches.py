"""HPatches homography benchmark CLI.

Counterpart of reference gluefactory/eval/hpatches.py:29-202:
    python -m gluefactory_tpu.eval.hpatches --conf <name> [--overwrite] ...
Resize-480-short preprocessing (reference :35-39), H-AUC@1/3/5px via DLT and
a RANSAC threshold sweep. Requires HPatches on disk (zero-egress).
"""

from __future__ import annotations

from pathlib import Path

from ..datasets.hpatches import HPatchesDataset
from ..settings import EVAL_PATH
from .homography_benchmark import HomographyBenchmarkPipeline
from .io import get_eval_parser, parse_eval_args


class HPatchesPipeline(HomographyBenchmarkPipeline):
    default_conf = {
        "data": {
            "name": "hpatches",
            "preprocessing": {
                "resize": 480,
                "side": "short",
                # static box for one-compile export; HPatches aspect ratios
                # after 480-short resize fit within 480x864
                "pad_to": [864, 480],
            },
            "test_batch_size": 1,
        },
        "model": HomographyBenchmarkPipeline.default_conf["model"],
        "eval": HomographyBenchmarkPipeline.default_conf["eval"],
    }

    def make_dataset(self, data_conf):
        return HPatchesDataset(data_conf)


if __name__ == "__main__":
    from .. import logger

    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = HPatchesPipeline.default_conf
    tag, conf = parse_eval_args("hpatches", args, default_conf)
    experiment_dir = Path(EVAL_PATH) / "hpatches" / tag
    pipeline = HPatchesPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    logger.info("Summaries: %s", s)
