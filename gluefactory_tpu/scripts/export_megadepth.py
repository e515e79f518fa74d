"""Cache local features (+ keypoint depths) for MegaDepth training.

Counterpart of reference gluefactory/scripts/export_megadepth.py (173 LoC):
runs an extractor over every image of each MegaDepth scene and writes
per-scene HDF5 caches including per-keypoint depth (for the pose-depth GT
fast path, geometry/gt_generation.py keypoint-depth kwargs).

    python -m gluefactory_tpu.scripts.export_megadepth --method sift --n_kpts 2048
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import jax
import numpy as np

from .. import logger
from ..datasets.megadepth import MegaDepth
from ..geometry.depth import sample_depth
from ..models import get_model
from ..settings import DATA_PATH
from .export_local_features import METHOD_CONFS


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default="sift", choices=METHOD_CONFS)
    parser.add_argument("--n_kpts", type=int, default=2048)
    parser.add_argument("--splits", nargs="+", default=["train", "val"])
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    method_conf = {**METHOD_CONFS[args.method], "max_num_keypoints": args.n_kpts}
    model = get_model(method_conf["name"]).from_conf(method_conf)
    variables = {"v": None}

    out_root = Path(args.output or (Path(DATA_PATH) / "exports" / "megadepth"))
    out_root.mkdir(parents=True, exist_ok=True)

    dataset = MegaDepth({"preprocessing": {"resize": None}})
    for split in args.splits:
        ds = dataset.get_dataset(split)
        for scene in ds.scenes:
            out_file = out_root / f"{scene}_{args.method}_{args.n_kpts}.h5"
            if out_file.exists():
                logger.info("Skipping cached %s", out_file)
                continue
            with h5py.File(str(out_file), "w") as hfile:
                for idx, img_path in enumerate(ds.images[scene]):
                    if img_path is None:
                        continue
                    try:
                        view = ds._read_view(scene, idx)
                    except (IOError, OSError):
                        continue
                    img = view["image"][None]
                    if variables["v"] is None:
                        variables["v"] = model.init(
                            jax.random.PRNGKey(0), {"image": img}
                        )
                    pred = model.apply(variables["v"], {"image": img})
                    grp = hfile.create_group(str(img_path))
                    for k in ("keypoints", "keypoint_scores", "descriptors",
                              "keypoint_mask", "scales", "oris"):
                        if k in pred:
                            grp.create_dataset(k, data=np.asarray(pred[k][0]))
                    if "depth" in view:
                        import jax.numpy as jnp

                        d, valid = sample_depth(
                            pred["keypoints"], jnp.asarray(view["depth"][None])
                        )
                        grp.create_dataset("depth_keypoints", data=np.asarray(d[0]))
                        grp.create_dataset(
                            "valid_depth_keypoints", data=np.asarray(valid[0])
                        )
            logger.info("Wrote %s", out_file)


if __name__ == "__main__":
    main()
