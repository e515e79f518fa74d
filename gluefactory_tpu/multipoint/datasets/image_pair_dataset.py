"""Multispectral (optical/thermal) image-pair dataset.

Counterpart of reference gluefactory/multipoint/datasets/ImagePairDataset.py:
HDF5 file with one group per sample holding aligned 'optical' and 'thermal'
images (+ optional per-modality homographies and cached keypoint labels),
with photometric and homographic augmentation.

Zero-egress additions: a synthetic generator fabricates aligned
optical/thermal pairs (thermal = smoothed intensity inversion with emissive
blobs — enough modality gap to exercise the multispectral pipeline) so the
whole MP stack runs hermetically; the h5 schema matches the reference so real
multipoint datasets drop in.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import h5py
import numpy as np

from ...datasets.augmentations import augmentations
from ...datasets.base_dataset import BaseDataset
from ...datasets.homographies import generate_texture_image
from ...geometry.homography import sample_homography_corners
from ...settings import DATA_PATH


def synthetic_thermal(optical: np.ndarray, rng) -> np.ndarray:
    """Fake thermal modality: blurred inversion + emissive blobs + noise."""
    t = 1.0 - optical[..., 0]
    t = cv2.GaussianBlur(t, (0, 0), 2.0)
    h, w = t.shape
    for _ in range(rng.randint(2, 6)):
        cx, cy = rng.randint(0, w), rng.randint(0, h)
        r = rng.randint(8, max(min(h, w) // 4, 10))
        blob = np.zeros_like(t)
        cv2.circle(blob, (cx, cy), r, 1.0, -1)
        blob = cv2.GaussianBlur(blob, (0, 0), r / 2)
        t = np.clip(t + 0.5 * blob, 0, 1)
    t = np.clip(t + rng.randn(h, w).astype(np.float32) * 0.02, 0, 1)
    return t[..., None].astype(np.float32)


class _MPSplit:
    def __init__(self, parent, split, names):
        self.parent = parent
        self.split = split
        self.names = names

    def __len__(self):
        return len(self.names)

    def _load_pair(self, name, rng):
        parent = self.parent
        if parent.h5_path is not None:
            with h5py.File(str(parent.h5_path), "r") as f:
                grp = f[name]
                optical = np.asarray(grp["optical"], np.float32)
                thermal = np.asarray(grp["thermal"], np.float32)
                if optical.ndim == 2:
                    optical = optical[..., None]
                if thermal.ndim == 2:
                    thermal = thermal[..., None]
        else:
            seed = int(name.split("/")[-1])
            r = np.random.RandomState(parent.conf.seed + seed)
            optical = generate_texture_image(r, tuple(parent.conf.synthetic.size))
            thermal = synthetic_thermal(optical, r)
        return optical, thermal

    def __getitem__(self, idx):
        parent = self.parent
        conf = parent.conf
        rng = np.random.RandomState(
            (conf.seed + idx) if self.split != "train" else None
        )
        optical, thermal = self._load_pair(self.names[idx], rng)
        h, w = optical.shape[:2]

        out = {"name": str(self.names[idx]), "idx": idx}
        for key, img in (("optical", optical), ("thermal", thermal)):
            H = np.eye(3, dtype=np.float32)
            valid = np.ones(img.shape[:2], np.float32)
            if conf.augmentation.homographic.enable:
                H, *_ = sample_homography_corners(
                    (w, h), (w, h), rng=rng, **dict(conf.augmentation.homographic.params)
                )
                img = cv2.warpPerspective(img, H, (w, h)).reshape(h, w, -1)
                valid = cv2.warpPerspective(valid, H, (w, h))
                H = H.astype(np.float32)
            if conf.augmentation.photometric.enable:
                img = parent.photo_aug(img, rng)
            out[key] = {
                "image": img.astype(np.float32),
                "homography": H,
                "valid_mask": (valid > 0.999).astype(np.float32),
            }
        return out


class ImagePairDataset(BaseDataset):
    default_conf = {
        "name": "mp_image_pair",
        "filename": None,  # h5 file; None => synthetic
        "synthetic": {"pool": 64, "size": [320, 256]},
        "train_fraction": 0.9,
        "augmentation": {
            "photometric": {"enable": True, "name": "dark"},
            "homographic": {
                "enable": False,
                "params": {"difficulty": 0.5, "translation": 0.3, "max_angle": 30},
            },
        },
    }

    def _init(self, conf):
        self.photo_aug = augmentations[conf.augmentation.photometric.get("name", "dark")]()
        if conf.filename:
            self.h5_path = Path(DATA_PATH) / conf.filename
            with h5py.File(str(self.h5_path), "r") as f:
                names = sorted(f.keys())
        else:
            self.h5_path = None
            names = [f"synthetic/{i:05d}" for i in range(int(conf.synthetic.pool))]
        n_train = int(len(names) * conf.train_fraction)
        self._splits = {"train": names[:n_train], "val": names[n_train:],
                        "test": names[n_train:]}

    def get_dataset(self, split):
        return _MPSplit(self, split, self._splits[split])


__main_dataset__ = ImagePairDataset
