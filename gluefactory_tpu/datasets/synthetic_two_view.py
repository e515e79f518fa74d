"""Hermetic synthetic 3D two-view dataset: textured multi-plane scenes with
exact cameras, relative poses and dense depth.

No counterpart in the reference (its 3D supervision comes from downloaded
MegaDepth). This dataset renders two views of a scene made of fronto-parallel
textured planes at different depths (front planes are finite rectangles that
occlude the infinite back plane). Each plane induces an exact homography per
view, so images, depth maps and poses are all mutually consistent — giving a
zero-download benchmark/fixture for the pose+depth GT path
(geometry/gt_generation.py) and the relative-pose eval
(eval/megadepth1500.py protocol).
"""

from __future__ import annotations

import cv2
import numpy as np

from ..geometry.utils import so3exp_map
from .base_dataset import BaseDataset
from .homographies import generate_texture_image


def _plane_homography(K, R, t, d):
    """Homography from plane coords (X, Y) at world z=d to image pixels:
    p ~ K (R [X, Y, d]^T + t) = K [r1 r2 (d*r3 + t)] [X Y 1]^T."""
    M = np.stack([R[:, 0], R[:, 1], d * R[:, 2] + t], axis=1)
    return K @ M


def render_view(K, R, t, planes, size):
    """Render image + depth of fronto-parallel planes for camera (R, t)
    (world -> cam). planes: list of (texture, d, rect or None), back-to-front.
    """
    w, h = size
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1)  # (h, w, 3)

    image = np.zeros((h, w), np.float32)
    depth = np.zeros((h, w), np.float32)
    filled = np.zeros((h, w), bool)

    for texture, d, rect in planes:  # back to front: later planes overwrite
        H = _plane_homography(K, R, t, d)
        Hinv = np.linalg.inv(H)
        plane_pts = pix @ Hinv.T
        Z = plane_pts[..., 2]
        valid = np.abs(Z) > 1e-9
        X = np.where(valid, plane_pts[..., 0] / np.where(valid, Z, 1), 0)
        Y = np.where(valid, plane_pts[..., 1] / np.where(valid, Z, 1), 0)
        if rect is not None:
            x0, y0, x1, y1 = rect
            inside = (X >= x0) & (X < x1) & (Y >= y0) & (Y < y1)
        else:
            inside = np.ones_like(valid)
        # camera-frame depth of the plane point
        p_cam = (np.stack([X, Y, np.full_like(X, d)], -1) @ R.T) + t
        z_cam = p_cam[..., 2].astype(np.float32)
        vis = valid & inside & (z_cam > 0.1)
        th, tw = texture.shape[:2]
        # map world plane coords to texture pixels, CLAMPED not wrapped:
        # tiling would create repeated patterns and systematic false matches
        u = np.clip(X * 60.0 + tw / 2, 0, tw - 1)
        v = np.clip(Y * 60.0 + th / 2, 0, th - 1)
        vals = cv2.remap(
            texture[..., 0], u.astype(np.float32), v.astype(np.float32),
            cv2.INTER_LINEAR,
        )
        image = np.where(vis, vals, image)
        depth = np.where(vis, z_cam, depth)
        filled |= vis
    return image[..., None], depth, filled


class _SynthSplit:
    def __init__(self, parent, n, split):
        self.parent, self.n, self.split = parent, n, split

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        from ..geometry.wrappers import Camera, Pose

        conf = self.parent.conf
        rng = np.random.RandomState(conf.seed + idx + (10_000 if self.split != "train" else 0))
        w, h = conf.image_size
        f = 0.9 * max(w, h)
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])

        # scene: infinite back plane + 2-4 finite front planes
        planes = [(generate_texture_image(rng, (1024, 1024)), 6.0 + rng.rand() * 2, None)]
        for _ in range(rng.randint(2, 5)):
            d = 2.5 + rng.rand() * 2.5
            cx, cy = rng.uniform(-1.5, 1.5, 2)
            sx, sy = rng.uniform(0.8, 2.0, 2)
            planes.append(
                (
                    generate_texture_image(rng, (512, 512)),
                    d,
                    (cx - sx / 2, cy - sy / 2, cx + sx / 2, cy + sy / 2),
                )
            )
        planes.sort(key=lambda p: -p[1])  # render back to front

        # cameras: view0 at origin-ish, view1 rotated + translated
        def sample_cam(scale):
            aa = rng.randn(3) * 0.05 * scale
            R = np.asarray(so3exp_map(aa.astype(np.float32)))
            t = rng.randn(3) * np.array([0.4, 0.25, 0.15]) * scale
            return R.astype(np.float64), t

        R0, t0 = sample_cam(0.5)
        R1, t1 = sample_cam(1.0)
        img0, depth0, _ = render_view(K, R0, t0, planes, (w, h))
        img1, depth1, _ = render_view(K, R1, t1, planes, (w, h))

        T0 = Pose.from_Rt(R0.astype(np.float32), t0.astype(np.float32))
        T1 = Pose.from_Rt(R1.astype(np.float32), t1.astype(np.float32))
        T_0to1 = T1 @ T0.inv()
        cam = Camera.from_calibration_matrix(K.astype(np.float32))

        return {
            "name": f"synth3d/{self.split}/{idx}",
            "idx": idx,
            "view0": {
                "image": img0.astype(np.float32),
                "depth": depth0,
                "camera": cam,
                "image_size": np.array([w, h], np.float32),
            },
            "view1": {
                "image": img1.astype(np.float32),
                "depth": depth1,
                "camera": cam,
                "image_size": np.array([w, h], np.float32),
            },
            "T_0to1": T_0to1,
            "T_1to0": T_0to1.inv(),
        }


class SyntheticTwoViewDataset(BaseDataset):
    default_conf = {
        "name": "synthetic_two_view",
        "image_size": [640, 480],
        "train_size": 100,
        "val_size": 10,
        "test_size": 20,
        "test_batch_size": 1,
    }

    def get_dataset(self, split):
        n = int(self.conf.get(f"{split}_size"))
        return _SynthSplit(self, n, split)


__main_dataset__ = SyntheticTwoViewDataset
