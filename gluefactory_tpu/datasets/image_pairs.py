"""Generic image-pairs eval dataset from a pairs file.

Counterpart of reference gluefactory/datasets/image_pairs.py:42-100: each line
is `name0 name1` optionally followed by two 9-value intrinsics + a 4x4
relative pose (calibrated pairs, the megadepth1500 format) or a 3x3
homography.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .utils import ImagePreprocessor, read_image, scale_intrinsics


def names_to_pair(name0, name1, separator="/"):
    return separator.join((name0.replace("/", "-"), name1.replace("/", "-")))


def parse_camera(params) -> Camera:
    K = np.asarray([float(x) for x in params], np.float32).reshape(3, 3)
    return Camera.from_calibration_matrix(K)


def parse_relative_pose(params) -> Pose:
    T = np.asarray([float(x) for x in params], np.float32).reshape(4, 4)
    return Pose.from_4x4mat(T)


class _PairsSplit:
    def __init__(self, parent):
        self.parent = parent

    def __len__(self):
        return len(self.parent.items)

    def __getitem__(self, idx):
        conf = self.parent.conf
        line = self.parent.items[idx]
        pair_data = {}
        name0, name1 = line[0], line[1]
        root = self.parent.root

        def load_view(name, cam=None):
            img = read_image(root / name, False)
            d = self.parent.preprocessor(img)
            d["name"] = name
            if cam is not None:
                K = np.asarray(cam.calibration_matrix())
                K = scale_intrinsics(K, d["scales"])
                d["camera"] = Camera.from_calibration_matrix(K)
            return d

        if len(line) == 2:
            pair_data["view0"] = load_view(name0)
            pair_data["view1"] = load_view(name1)
        elif len(line) == 11:  # name0 name1 H (3x3)
            pair_data["view0"] = load_view(name0)
            pair_data["view1"] = load_view(name1)
            H = np.asarray([float(x) for x in line[2:]], np.float32).reshape(3, 3)
            from .utils import scale_homography

            pair_data["H_0to1"] = scale_homography(
                H, pair_data["view0"]["scales"], pair_data["view1"]["scales"]
            )
        elif len(line) == 36:  # name0 name1 K0(9) K1(9) T(16): calibrated
            cam0 = parse_camera(line[2:11])
            cam1 = parse_camera(line[11:20])
            T = parse_relative_pose(line[20:36])
            pair_data["view0"] = load_view(name0, cam0)
            pair_data["view1"] = load_view(name1, cam1)
            pair_data["T_0to1"] = T
            pair_data["T_1to0"] = T.inv()
        else:
            raise ValueError(f"Unknown pair format with {len(line)} fields")

        pair_data["name"] = names_to_pair(name0, name1)
        pair_data["idx"] = idx
        return pair_data


class ImagePairs(BaseDataset):
    default_conf = {
        "name": "image_pairs",
        "pairs": None,  # path to the pairs file, relative to DATA_PATH
        "root": None,  # image root, relative to DATA_PATH
        "preprocessing": ImagePreprocessor.default_conf,
        "test_batch_size": 1,
    }

    def _init(self, conf):
        pairs_path = Path(DATA_PATH) / conf.pairs
        if not pairs_path.exists():
            raise FileNotFoundError(pairs_path)
        self.root = Path(DATA_PATH) / conf.root
        self.items = [
            line.split() for line in pairs_path.read_text().strip().split("\n")
        ]
        self.preprocessor = ImagePreprocessor(dict(conf.preprocessing))

    def get_dataset(self, split):
        return _PairsSplit(self)


__main_dataset__ = ImagePairs
