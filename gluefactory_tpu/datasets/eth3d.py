"""ETH3D two-view dataset with COLMAP ground truth.

Counterpart of reference gluefactory/datasets/eth3d.py:62-254: parse
COLMAP-format cameras.txt/images.txt/points3D.txt per scene, select image
pairs by the number of covisible 3D points, and provide downsized images +
depth + poses. Zero-egress: requires DATA_PATH/eth3d on disk (reference
auto-downloads).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .utils import ImagePreprocessor, read_image


def qvec2rotmat(qvec):
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2],
        ]
    )


def read_colmap_cameras_text(path: Path) -> dict:
    """COLMAP cameras.txt -> {camera_id: camera dict}."""
    cameras = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        width, height = int(parts[2]), int(parts[3])
        params = [float(p) for p in parts[4:]]
        cameras[cam_id] = {
            "model": model, "width": width, "height": height, "params": params,
        }
    return cameras


def read_colmap_images_text(path: Path):
    """COLMAP images.txt -> {image_id: (name, camera_id, qvec, tvec, p3d_ids)}."""
    images = {}
    lines = [
        line for line in Path(path).read_text().splitlines()
        if line.strip() and not line.startswith("#")
    ]
    for meta, pts in zip(lines[::2], lines[1::2]):
        parts = meta.split()
        image_id = int(parts[0])
        qvec = np.array([float(x) for x in parts[1:5]])
        tvec = np.array([float(x) for x in parts[5:8]])
        cam_id = int(parts[8])
        name = parts[9]
        elems = pts.split()
        p3d_ids = np.array([int(x) for x in elems[2::3]])
        images[image_id] = (name, cam_id, qvec, tvec, p3d_ids)
    return images


class _ETH3DSplit:
    def __init__(self, parent):
        self.parent = parent

    def __len__(self):
        return len(self.parent.items)

    def __getitem__(self, idx):
        parent = self.parent
        scene, id0, id1, n_covis = parent.items[idx]
        meta = parent.scenes[scene]

        def view(image_id):
            name, cam_id, qvec, tvec, _ = meta["images"][image_id]
            img = read_image(meta["image_dir"] / name, parent.conf.grayscale)
            d = parent.preprocessor(img)
            cam = Camera.from_colmap(meta["cameras"][cam_id]).scale(d["scales"])
            T = Pose.from_Rt(
                qvec2rotmat(qvec).astype(np.float32), tvec.astype(np.float32)
            )
            return {**d, "camera": cam, "T_w2cam": T, "name": name}

        v0 = view(id0)
        v1 = view(id1)
        T0, T1 = v0.pop("T_w2cam"), v1.pop("T_w2cam")
        T_0to1 = T1 @ T0.inv()
        return {
            "name": f"{scene}/{Path(v0.pop('name')).stem}_{Path(v1.pop('name')).stem}",
            "idx": idx,
            "scene": scene,
            "view0": v0,
            "view1": v1,
            "T_0to1": T_0to1,
            "T_1to0": T_0to1.inv(),
            "covisible": n_covis,
        }


class ETH3DDataset(BaseDataset):
    default_conf = {
        "name": "eth3d",
        "data_dir": "eth3d",
        "min_covisible": 500,  # pair selection threshold (reference :150-170)
        "grayscale": False,
        "preprocessing": {"resize": 1024, "side": "long"},
        "test_batch_size": 1,
        "max_pairs_per_scene": 50,
    }

    def _init(self, conf):
        root = Path(DATA_PATH) / conf.data_dir
        if not root.exists():
            raise FileNotFoundError(f"{root} missing (zero-egress: no download)")
        self.scenes = {}
        self.items = []
        for scene_dir in sorted(root.iterdir()):
            sparse = scene_dir / "dslr_calibration_undistorted"
            if not (sparse / "images.txt").exists():
                continue
            cameras = read_colmap_cameras_text(sparse / "cameras.txt")
            images = read_colmap_images_text(sparse / "images.txt")
            self.scenes[scene_dir.name] = {
                "cameras": cameras,
                "images": images,
                "image_dir": scene_dir / "images",
            }
            ids = sorted(images.keys())
            pairs = []
            for i, a in enumerate(ids):
                pts_a = set(images[a][4][images[a][4] >= 0].tolist())
                for b in ids[i + 1 :]:
                    pts_b = set(images[b][4][images[b][4] >= 0].tolist())
                    covis = len(pts_a & pts_b)
                    if covis >= conf.min_covisible:
                        pairs.append((scene_dir.name, a, b, covis))
            pairs.sort(key=lambda p: -p[3])
            self.items.extend(pairs[: conf.max_pairs_per_scene])
        logger.info("ETH3D: %d pairs from %d scenes", len(self.items), len(self.scenes))

    def get_dataset(self, split):
        return _ETH3DSplit(self)


__main_dataset__ = ETH3DDataset
