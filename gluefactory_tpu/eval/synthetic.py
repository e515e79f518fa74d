"""Hermetic homography benchmark on procedural textures.

This environment has no network access, so the reference's
download-everything benchmarks cannot run as-is. This pipeline applies the
EXACT HPatches evaluation protocol (export -> cached eval -> match precision,
DLT and RANSAC-sweep H-AUC) to the synthetic homography dataset, giving a
fully reproducible regression benchmark for matcher quality that runs
anywhere. Use:
    python -m gluefactory_tpu.eval.synthetic [--conf ...] [--overwrite]
"""

from __future__ import annotations

from pathlib import Path

from ..datasets.homographies import HomographyDataset
from ..settings import EVAL_PATH
from .homography_benchmark import HomographyBenchmarkPipeline
from .io import get_eval_parser, parse_eval_args


class SyntheticHomographyPipeline(HomographyBenchmarkPipeline):
    default_conf = {
        "data": {
            "name": "homographies",
            "synthetic": {"do": True, "pool": 32, "size": [960, 720]},
            "train_size": 2,
            "val_size": 30,
            "test_batch_size": 1,
            "homography": {
                "difficulty": 0.5,
                "translation": 0.5,
                "max_angle": 30,
                "patch_shape": [640, 480],
            },
            "photometric": {"name": "lg", "p": 0.5},
        },
        "model": HomographyBenchmarkPipeline.default_conf["model"],
        "eval": HomographyBenchmarkPipeline.default_conf["eval"],
    }

    def make_dataset(self, data_conf):
        return HomographyDataset(data_conf)

    def get_dataloader(self, data_conf=None):
        dataset = self.make_dataset(dict(data_conf or self.conf.data))
        return dataset.get_data_loader("val", shuffle=False)


if __name__ == "__main__":
    from .. import logger

    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    tag, conf = parse_eval_args(
        "synthetic", args, SyntheticHomographyPipeline.default_conf
    )
    experiment_dir = Path(EVAL_PATH) / "synthetic" / tag
    pipeline = SyntheticHomographyPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    logger.info("Summaries: %s", s)
