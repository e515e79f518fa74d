"""HPatches homography-evaluation dataset.

Counterpart of reference gluefactory/datasets/hpatches.py:38-114: 116
sequences (ignoring 8 high-resolution scenes), 5 pairs each (ref image 1 vs
2..6) with GT homographies, resized to a common short side with the GT
adjusted by the resize transforms. Zero-egress: no auto-download — expects
DATA_PATH/hpatches-sequences-release on disk.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .utils import ImagePreprocessor, read_image, scale_homography

# scenes excluded by the reference for their size (hpatches.py:48-57)
IGNORED_SCENES = (
    "i_contruction", "i_crownnight", "i_dc", "i_pencils", "i_whitebuilding",
    "v_artisans", "v_astronautis", "v_talent",
)


class _HPatchesSplit:
    def __init__(self, parent):
        self.parent = parent
        self.items = parent.items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        scene, i = self.items[idx]
        conf = self.parent.conf
        root = self.parent.root / scene
        suffix = "ppm" if scene.startswith("i_") else "ppm"
        img0 = read_image(root / f"1.{suffix}", conf.grayscale)
        img1 = read_image(root / f"{i}.{suffix}", conf.grayscale)
        H = np.loadtxt(root / f"H_1_{i}").astype(np.float32)
        pre = self.parent.preprocessor
        d0 = pre(img0)
        d1 = pre(img1)
        H = scale_homography(H, d0["scales"], d1["scales"])
        return {
            "name": f"{scene}/{i}",
            "scene": scene,
            "idx": idx,
            "H_0to1": H,
            "view0": d0,
            "view1": d1,
        }


class HPatchesDataset(BaseDataset):
    default_conf = {
        "name": "hpatches",
        "data_dir": "hpatches-sequences-release",
        "preprocessing": {"resize": 480, "side": "short", "grayscale": False,
                          "pad_to": None},
        "subset": None,  # "i" (illumination) | "v" (viewpoint) | None
        "grayscale": True,
        "ignore_large_images": True,
        "test_batch_size": 1,
    }

    def _init(self, conf):
        self.root = Path(DATA_PATH) / conf.data_dir
        if not self.root.exists():
            raise FileNotFoundError(
                f"HPatches not found at {self.root} (zero-egress: download it "
                "out-of-band, see reference datasets/hpatches.py:80-87)"
            )
        self.preprocessor = ImagePreprocessor(dict(conf.preprocessing))
        scenes = sorted([p.name for p in self.root.iterdir() if p.is_dir()])
        if conf.ignore_large_images:
            scenes = [s for s in scenes if s not in IGNORED_SCENES]
        if conf.subset:
            scenes = [s for s in scenes if s.startswith(f"{conf.subset}_")]
        self.items = [(s, i) for s in scenes for i in range(2, 7)]

    def get_dataset(self, split):
        assert split in ("test", "val")
        return _HPatchesSplit(self)


__main_dataset__ = HPatchesDataset
