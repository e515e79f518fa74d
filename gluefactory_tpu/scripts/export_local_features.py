"""Cache local features of a dataset's views to HDF5.

Counterpart of reference gluefactory/scripts/export_local_features.py (127
LoC): run an extractor over every view of a dataset split and store
keypoints/scores/descriptors per sample name, for CacheLoader-based training
and evaluation.

    python -m gluefactory_tpu.scripts.export_local_features \
        --dataset homographies --method sift --n_kpts 1024 \
        data.synthetic.do=true
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from .. import logger
from ..datasets import get_dataset
from ..models import get_model
from ..settings import DATA_PATH
from ..utils.config import merge, parse_dotlist
from ..utils.export_predictions import export_predictions

METHOD_CONFS = {
    "sift": {"name": "sift", "max_num_keypoints": 2048},
    "sp": {"name": "superpoint_open", "max_num_keypoints": 2048,
           "detection_threshold": 0.0},
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--method", type=str, default="sift", choices=METHOD_CONFS)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--n_kpts", type=int, default=2048)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_args()

    overrides = parse_dotlist(args.dotlist)
    data_conf = merge({"name": args.dataset}, overrides.get("data", {}))
    dataset = get_dataset(args.dataset)(data_conf)
    loader = dataset.get_data_loader(args.split, shuffle=False)

    method_conf = merge(METHOD_CONFS[args.method], {"max_num_keypoints": args.n_kpts})
    model = get_model(method_conf["name"]).from_conf(method_conf)
    variables = {"variables": None}

    def apply_fn(batch):
        # per-view extraction: views are exported as separate groups
        out = {}
        for v in ("view0", "view1", ""):
            key = v if v else None
            view = batch.get(v, batch if v == "" else None)
            if not isinstance(view, dict) or "image" not in view:
                continue
            img = np.asarray(view["image"])
            if variables["variables"] is None:
                variables["variables"] = model.init(
                    jax.random.PRNGKey(0), {"image": img}
                )
            pred = model.apply(variables["variables"], {"image": img})
            suffix = v[-1] if v else ""
            out.update({f"{k}{suffix}": val for k, val in pred.items()})
        return out

    out_file = args.output or (
        Path(DATA_PATH)
        / "exports"
        / f"{args.dataset}_{args.split}_{args.method}_{args.n_kpts}.h5"
    )
    export_predictions(loader, apply_fn, out_file, as_half=True)
    logger.info("Feature cache written to %s", out_file)


if __name__ == "__main__":
    main()
