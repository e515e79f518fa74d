"""Synthetic homography-pair training dataset.

Counterpart of reference gluefactory/datasets/homographies.py:47-278: each
sample warps one source image with two random convex-patch homographies into a
fixed patch shape, applies photometric augmentation per view, and provides the
exact pair homography H_0to1 = H1 @ H0^-1 as supervision.

Differences by design:
  - zero-egress environment: no revisitop1m auto-download. Sources are a local
    image folder (conf.data_dir) or procedurally generated textures
    (conf.synthetic.do=True) so training/tests run hermetically.
  - outputs are numpy NHWC float32 in [0,1] with static shapes (TPU batching).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..geometry.homography import sample_homography_corners, warp_points_np
from ..settings import DATA_PATH
from .augmentations import augmentations
from .base_dataset import BaseDataset


def generate_texture_image(rng, size=(960, 720)) -> np.ndarray:
    """Procedural textured image: random polygons + blurred noise background.
    Gives detectors repeatable corners without any downloaded data."""
    w, h = size
    noise = rng.rand(h // 4, w // 4).astype(np.float32)
    img = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC) * 0.3 + 0.35
    n_shapes = rng.randint(20, 40)
    for _ in range(n_shapes):
        n_pts = rng.randint(3, 7)
        cx, cy = rng.randint(0, w), rng.randint(0, h)
        radius = rng.randint(10, max(min(w, h) // 6, 12))
        ang = rng.rand(n_pts) * 2 * np.pi
        rad = radius * (0.4 + 0.6 * rng.rand(n_pts))
        pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], -1).astype(
            np.int32
        )
        color = float(rng.rand())
        cv2.fillPoly(img, [pts], color)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    return np.clip(img, 0, 1)[..., None].astype(np.float32)


class _HomographySplit:
    def __init__(self, parent: "HomographyDataset", names, split: str):
        self.parent = parent
        self.names = names
        self.split = split
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int) -> dict:
        conf = self.parent.conf
        # train samples draw fresh augmentations every EPOCH but are
        # deterministic in (seed, epoch, idx): reproducible runs, and every
        # process of a multi-process run generates the same global batch
        seed = conf.seed + idx + (1_000_003 * (self.epoch + 1) if self.split == "train" else 0)
        rng = np.random.RandomState(seed % (2**31))
        img = self.parent.read_image(self.names[idx], rng)
        h, w = img.shape[:2]
        ps = tuple(conf.homography.patch_shape)

        def view(difficulty_scale=1.0, photometric=True):
            hconf = conf.homography
            difficulty = hconf.difficulty
            if hconf.difficulty_range is not None:
                lo, hi = hconf.difficulty_range
                difficulty = float(rng.uniform(lo, hi))
            H, _, _, _ = sample_homography_corners(
                (w, h),
                ps,
                difficulty=difficulty * difficulty_scale,
                translation=hconf.translation,
                n_angles=hconf.n_angles,
                max_angle=hconf.max_angle,
                min_convexity=hconf.min_convexity,
                rng=rng,
            )
            from ..native import warp_perspective

            warped = warp_perspective(img, H, ps)
            if photometric and rng.rand() < conf.photometric.p:
                warped = self.parent.photo_aug(warped, rng)
            return {
                "image": warped.astype(np.float32),
                "image_size": np.array(ps, np.float32),
            }, H

        left_scale = 0.0 if conf.right_only else 1.0
        data0, H0 = view(left_scale, photometric=False)
        data1, H1 = view(1.0, photometric=True)
        H_pair = (H1 @ np.linalg.inv(H0)).astype(np.float32)

        if conf.features.do and conf.features.per_view:
            # TRUE per-view extraction (matches the eval distribution): the
            # extractor runs on each warped+augmented view on the host, so
            # detection asymmetry and photometric descriptor changes are real.
            for d in (data0, data1):
                pred = self.parent.extract_image(d["image"])
                d["cache"] = pred
                if not conf.features.keep_images:
                    d.pop("image")
        elif conf.features.do:
            # cached-feature mode (reference homographies.py:175-207 /
            # CacheLoader): detect once on the source image, then per view
            # warp keypoints by that view's homography and reuse descriptors.
            # Per-view perturbations (descriptor noise, sub-px jitter, random
            # dropout) break the identical-descriptor degeneracy so training
            # transfers to independently-extracted features.
            feats = self.parent.get_features(self.names[idx], img)
            fc = conf.features
            for d, H in ((data0, H0), (data1, H1)):
                kpts = warp_points_np(feats["keypoints"], H)
                if fc.jitter > 0:
                    kpts = kpts + rng.randn(*kpts.shape) * fc.jitter
                inside = (
                    (kpts[:, 0] >= 0)
                    & (kpts[:, 0] < ps[0])
                    & (kpts[:, 1] >= 0)
                    & (kpts[:, 1] < ps[1])
                )
                mask = feats["keypoint_mask"] & inside
                if fc.dropout > 0:
                    mask = mask & (rng.rand(len(mask)) > fc.dropout)
                desc = feats["descriptors"]
                if fc.desc_noise > 0:
                    desc = desc + rng.randn(*desc.shape).astype(np.float32) * fc.desc_noise
                    desc = desc / np.maximum(
                        np.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
                    )
                d["cache"] = {
                    "keypoints": kpts.astype(np.float32),
                    "keypoint_scores": np.where(
                        mask, feats["keypoint_scores"], 0.0
                    ).astype(np.float32),
                    "descriptors": desc.astype(np.float32),
                    "keypoint_mask": mask,
                }
                if not conf.features.keep_images:
                    d.pop("image")

        sample = {
            "name": f"{self.names[idx]}",
            "idx": idx,
            "H_0to1": H_pair,
            "view0": data0,
            "view1": data1,
        }
        if conf.triplet:
            data2, H2 = view(1.0, photometric=True)
            sample["view2"] = data2
            sample["H_0to2"] = (H2 @ np.linalg.inv(H0)).astype(np.float32)
            sample["H_1to2"] = (H2 @ np.linalg.inv(H1)).astype(np.float32)
        return sample


class HomographyDataset(BaseDataset):
    default_conf = {
        "name": "homographies",
        "data_dir": "revisitop1m",
        "image_dir": "jpg/",
        "glob": ["*.jpg", "*.png", "*.jpeg", "*.JPG", "*.PNG"],
        "train_size": 100,
        "val_size": 10,
        "grayscale": True,
        "triplet": False,
        "right_only": False,
        "synthetic": {"do": False, "size": [960, 720], "pool": 64},
        "homography": {
            "difficulty": 0.8,
            # per-sample difficulty mixing: when set to [lo, hi], each view
            # draws difficulty ~ U(lo, hi) instead of the fixed value, so one
            # batch mixes high-overlap pairs (calibration signal: matchable
            # tokens should score high) with low-overlap pairs (hard
            # negatives: unmatchable tokens should score LOW — the signal the
            # matchability head needs for width pruning to fire organically,
            # reference get_pruning_mask lightglue.py:586-593)
            "difficulty_range": None,
            "translation": 1.0,
            "max_angle": 60,
            "n_angles": 10,
            "patch_shape": [640, 480],
            "min_convexity": 0.05,
        },
        "photometric": {"name": "lg", "p": 0.75},
        # cached-feature mode: extract once per source image, warp keypoints
        "features": {
            "do": False,
            "per_view": False,  # True: extract on each warped view (slower,
            #                     matches the eval distribution exactly)
            "name": "sift",
            "max_num_keypoints": 512,
            "keep_images": False,
            "desc_noise": 0.05,  # per-view descriptor perturbation (cached mode)
            "jitter": 0.3,  # sub-pixel keypoint jitter (px, cached mode)
            "dropout": 0.1,  # per-view random keypoint dropout (cached mode)
            "conf": {},
        },
    }

    def _init(self, conf):
        self.photo_aug = augmentations[conf.photometric.name]()
        self._feature_cache: dict = {}
        self._extractor = None
        if conf.synthetic.do:
            pool = int(conf.synthetic.pool)
            self.image_names = [f"synthetic/{i:05d}" for i in range(pool)]
            self._synth_cache: dict = {}
        else:
            data_dir = Path(DATA_PATH) / conf.data_dir
            image_dir = data_dir / conf.image_dir
            if not image_dir.exists():
                raise FileNotFoundError(
                    f"{image_dir} not found; set synthetic.do=True for hermetic data"
                )
            images = []
            for g in conf.glob:
                images += [
                    p.relative_to(image_dir).as_posix() for p in image_dir.glob("**/" + g)
                ]
            self.image_names = sorted(images)
            self.image_dir = image_dir
        n_train, n_val = int(conf.train_size), int(conf.val_size)
        rng = np.random.RandomState(conf.seed)
        order = rng.permutation(len(self.image_names))
        n_src = len(self.image_names)
        if conf.synthetic.do and n_train + n_val > n_src:
            # oversample the pool: every index draws fresh random warps, so
            # repeated source images still yield distinct training pairs
            train_names = [
                self.image_names[order[i % max(n_src - n_val, 1)]]
                for i in range(n_train)
            ]
            val_names = [self.image_names[i] for i in order[n_src - n_val :]]
            self.splits = {"train": train_names, "val": val_names}
        else:
            self.splits = {
                "train": [self.image_names[i] for i in order[:n_train]],
                "val": [self.image_names[i] for i in order[n_train : n_train + n_val]],
            }
        self.splits["test"] = self.splits["val"]

    def read_image(self, name: str, rng) -> np.ndarray:
        if self.conf.synthetic.do:
            if name not in self._synth_cache:
                seed = int(name.split("/")[-1])
                self._synth_cache[name] = generate_texture_image(
                    np.random.RandomState(self.conf.seed + seed),
                    tuple(self.conf.synthetic.size),
                )
            return self._synth_cache[name]
        img = cv2.imread(str(self.image_dir / name), cv2.IMREAD_COLOR)
        if img is None:
            return np.zeros((1024, 1024, 1), np.float32)
        img = img.astype(np.float32) / 255.0
        if self.conf.grayscale:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img

    def extract_image(self, img: np.ndarray) -> dict:
        """Run the (host) extractor on one image -> unbatched pred dict."""
        conf = self.conf.features
        if self._extractor is None:
            from ..models import get_model

            self._extractor = get_model(conf.name).from_conf(
                {"max_num_keypoints": conf.max_num_keypoints, **dict(conf.conf)}
            )
        if hasattr(self._extractor, "_host_extract"):
            # pure-numpy path: no device round-trip from the loader thread
            kpts, scores, scales, oris, descs, mask = self._extractor._host_extract(
                img[None]
            )
            return {
                "keypoints": kpts[0], "keypoint_scores": scores[0],
                "descriptors": descs[0], "keypoint_mask": mask[0],
            }
        pred = self._extractor.apply({}, {"image": img[None]})
        return {
            "keypoints": np.asarray(pred["keypoints"][0]),
            "keypoint_scores": np.asarray(pred["keypoint_scores"][0]),
            "descriptors": np.asarray(pred["descriptors"][0]),
            "keypoint_mask": np.asarray(pred["keypoint_mask"][0]),
        }

    def get_features(self, name: str, img: np.ndarray) -> dict:
        """Detect-once feature cache for the source image (host)."""
        if name in self._feature_cache:
            return self._feature_cache[name]
        conf = self.conf.features
        if self._extractor is None:
            from ..models import get_model

            self._extractor = get_model(conf.name).from_conf(
                {"max_num_keypoints": conf.max_num_keypoints, **dict(conf.conf)}
            )
        pred = self._extractor.apply({}, {"image": img[None]})
        feats = {
            "keypoints": np.asarray(pred["keypoints"][0]),
            "keypoint_scores": np.asarray(pred["keypoint_scores"][0]),
            "descriptors": np.asarray(pred["descriptors"][0]),
            "keypoint_mask": np.asarray(pred["keypoint_mask"][0]),
        }
        self._feature_cache[name] = feats
        return feats

    def get_dataset(self, split: str):
        return _HomographySplit(self, self.splits[split], split)


__main_dataset__ = HomographyDataset
