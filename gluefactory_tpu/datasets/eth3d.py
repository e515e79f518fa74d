"""ETH3D two-view dataset with COLMAP ground truth and rendered depth.

Counterpart of reference gluefactory/datasets/eth3d.py:62-254, using the same
on-disk layout (the SOLD2 ETH3D_undistorted package the reference
auto-downloads; zero-egress here, so the tree must exist under DATA_PATH):

    ETH3D_undistorted/<scene>/
        images/dslr_images_undistorted/<name>.JPG
        ground_truth_depth/undistorted_depth/<name>.png   # uint16, depth*256
        dslr_calibration_undistorted/cameras.txt          # COLMAP text
        dslr_calibration_undistorted/images.txt           # poses + visible 3D ids

Pairs are selected by the number of covisible 3D points between the two
images' POINTS2D tracks (reference :135-148), images are downsized by
`downsize_factor` (reference :210-216), and the uint16 depth PNGs are
decoded as depth = px/256 (reference read_depth :217-226) then
nearest-resized to the processed image resolution (depth PNGs in the real
package are pre-rendered at the 1/8 resolution).

One deliberate divergence: cameras are keyed by the CAMERA_ID column of the
undistorted calibration itself rather than positional indexing through the
jpg calibration's id (reference :101-112) — equivalent on the real data,
where both calibrations enumerate the same physical cameras, and robust to
non-sequential ids. Intrinsics are kept at full resolution and rescaled with
the preprocessor's exact `scales` (instead of assuming shape/8 divisibility).
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
    """COLMAP cameras.txt -> {camera_id: camera dict} (reference :23-36)."""
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
    """COLMAP images.txt -> {image_id: (name, camera_id, qvec, tvec, p3d_ids)}
    (reference :113-133: pose line + POINTS2D line, every 3rd elem is the
    POINT3D_ID, -1 for unobserved)."""
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
        p3d_ids = np.array([int(x) for x in elems[2::3]] or [-1])
        images[image_id] = (name, cam_id, qvec, tvec, p3d_ids)
    return images


def read_eth3d_depth(path: Path) -> np.ndarray:
    """uint16 PNG -> float32 metric depth (reference read_depth :217-226).
    Zero pixels mean no ground truth; keep them 0 (depth_matcher treats
    non-positive depth as invalid)."""
    depth_img = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH)
    if depth_img is None:
        raise FileNotFoundError(path)
    return depth_img.astype(np.float32) / 256.0


class _ETH3DSplit:
    def __init__(self, parent):
        self.parent = parent

    def __len__(self):
        return len(self.parent.items)

    def __getitem__(self, idx):
        parent = self.parent
        conf = parent.conf
        scene, id0, id1, n_covis = parent.items[idx]
        meta = parent.scenes[scene]

        def view(image_id):
            name, cam_id, qvec, tvec, _ = meta["images"][image_id]
            img = read_image(meta["image_dir"] / name, conf.grayscale)
            h, w = img.shape[:2]
            d = parent.preprocessor(
                img, resize=max(h, w) // conf.downsize_factor
            )
            cam = Camera.from_colmap(meta["cameras"][cam_id]).scale(d["scales"])
            T = Pose.from_Rt(
                qvec2rotmat(qvec).astype(np.float32), tvec.astype(np.float32)
            )
            out = {**d, "camera": cam, "T_w2cam": T, "name": name}
            depth_path = meta["depth_dir"] / (Path(name).stem + ".png")
            if depth_path.exists():
                depth = read_eth3d_depth(depth_path)
                ph, pw = d["image"].shape[:2]
                if depth.shape != (ph, pw):
                    depth = cv2.resize(
                        depth, (pw, ph), interpolation=cv2.INTER_NEAREST
                    )
                out["depth"] = depth
            return out

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
            "n_covisible_points": n_covis,
        }


class ETH3DDataset(BaseDataset):
    default_conf = {
        "name": "eth3d",
        "data_dir": "ETH3D_undistorted",  # reference conf key + default
        "downsize_factor": 8,
        "min_covisibility": 500,  # pair selection threshold (reference :146)
        "grayscale": True,
        "test_batch_size": 1,
        "max_pairs_per_scene": 50,
    }

    def _init(self, conf):
        root = Path(DATA_PATH) / conf.data_dir
        if not root.exists():
            raise FileNotFoundError(f"{root} missing (zero-egress: no download)")
        self.preprocessor = _ResizablePreprocessor(conf.grayscale)
        self.scenes = {}
        self.items = []
        for scene_dir in sorted(p for p in root.iterdir() if p.is_dir()):
            sparse = scene_dir / "dslr_calibration_undistorted"
            if not (sparse / "images.txt").exists():
                continue
            cameras = read_colmap_cameras_text(sparse / "cameras.txt")
            images = read_colmap_images_text(sparse / "images.txt")
            self.scenes[scene_dir.name] = {
                "cameras": cameras,
                "images": images,
                "image_dir": scene_dir / "images" / "dslr_images_undistorted",
                "depth_dir": scene_dir / "ground_truth_depth" / "undistorted_depth",
            }
            ids = sorted(images.keys())
            visible = {
                a: set(images[a][4][images[a][4] >= 0].tolist()) for a in ids
            }
            pairs = []
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    covis = len(visible[a] & visible[b])
                    if covis >= conf.min_covisibility:
                        pairs.append((scene_dir.name, a, b, covis))
            pairs.sort(key=lambda p: -p[3])
            self.items.extend(pairs[: conf.max_pairs_per_scene])
        logger.info("ETH3D: %d pairs from %d scenes", len(self.items), len(self.scenes))

    def get_dataset(self, split):
        return _ETH3DSplit(self)


class _ResizablePreprocessor:
    """ImagePreprocessor with a per-image long-side target (the downsize
    factor acts on each image's own resolution, reference :210-216)."""

    def __init__(self, grayscale: bool):
        self.grayscale = grayscale

    def __call__(self, img: np.ndarray, resize: int) -> dict:
        proc = ImagePreprocessor(
            {"resize": int(max(resize, 8)), "side": "long",
             "grayscale": self.grayscale}
        )
        return proc(img)


__main_dataset__ = ETH3DDataset
