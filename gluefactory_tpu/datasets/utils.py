"""Image reading and preprocessing helpers (host side).

Counterpart of reference gluefactory/datasets/utils.py:6-131 and
utils/image.py ImagePreprocessor: read, resize with scale bookkeeping, crop or
pad to fixed shapes (TPU needs static shapes, so eval resizing pads to the
target box and records a valid region + scales).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def read_image(path: str | Path, grayscale: bool = False) -> np.ndarray | None:
    """Read an image into float32 [0,1], HWC (C=1 or 3, RGB)."""
    mode = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    img = cv2.imread(str(path), mode)
    if img is None:
        return None
    if grayscale:
        img = img[..., None]
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def resize_image(img: np.ndarray, size, fn: str = "max", interp: str = "area"):
    """Resize so that fn(shape)==size, keeping aspect; returns (img, scales)
    where scales = new/old (x, y) (reference datasets/utils.py resize)."""
    h, w = img.shape[:2]
    if isinstance(size, int):
        scale = size / (max(h, w) if fn == "max" else min(h, w))
        h_new, w_new = int(round(h * scale)), int(round(w * scale))
    else:
        w_new, h_new = size
    mode = {
        "linear": cv2.INTER_LINEAR,
        "cubic": cv2.INTER_CUBIC,
        "nearest": cv2.INTER_NEAREST,
        "area": cv2.INTER_AREA,
    }[interp]
    resized = cv2.resize(img, (w_new, h_new), interpolation=mode)
    if resized.ndim == 2:
        resized = resized[..., None]
    scales = np.array([w_new / w, h_new / h], np.float32)
    return resized, scales


class ImagePreprocessor:
    """Resize + optional pad-to-fixed-box preprocessing with scale metadata.

    Output dict: image (H', W', C), image_size (w, h) of the VALID region,
    scales (2,) mapping processed coords back to original via division.
    With `square_pad` or an (w, h) `pad_to`, the image is zero-padded to a
    static shape — keypoints outside the valid region are impossible since
    the pad is black, and image_size marks the true extent.
    """

    default_conf = {
        "resize": None,  # int or (w, h)
        "side": "long",  # "long" | "short" when resize is int
        "interpolation": "area",
        "pad_to": None,  # (w, h) static output box
        "grayscale": False,
    }

    def __init__(self, conf=None):
        from ..utils.config import FrozenConfig, merge

        self.conf = FrozenConfig(merge(self.default_conf, conf or {}))

    def __call__(self, img: np.ndarray) -> dict:
        conf = self.conf
        scales = np.array([1.0, 1.0], np.float32)
        if conf.grayscale and img.shape[-1] == 3:
            img = (img * np.array([0.299, 0.587, 0.114], np.float32)).sum(
                -1, keepdims=True
            )
        if conf.resize is not None:
            fn = "max" if conf.side == "long" else "min"
            size = conf.resize if isinstance(conf.resize, int) else tuple(conf.resize)
            img, scales = resize_image(img, size, fn=fn, interp=conf.interpolation)
        h, w = img.shape[:2]
        out = {
            "image": img.astype(np.float32),
            "image_size": np.array([w, h], np.float32),
            "scales": scales,
        }
        if conf.pad_to is not None:
            tw, th = conf.pad_to
            padded = np.zeros((th, tw, img.shape[-1]), np.float32)
            padded[: min(h, th), : min(w, tw)] = img[: min(h, th), : min(w, tw)]
            out["image"] = padded
        return out


def scale_homography(H: np.ndarray, scales0, scales1) -> np.ndarray:
    """Adjust a homography for per-view resizes: x1' = S1 H S0^-1 x0'."""
    S0 = np.diag([scales0[0], scales0[1], 1.0])
    S1 = np.diag([scales1[0], scales1[1], 1.0])
    return (S1 @ H @ np.linalg.inv(S0)).astype(np.float32)


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    """Scale a calibration matrix after image resize."""
    T = np.diag([scales[0], scales[1], 1.0])
    return (T @ K).astype(np.float32)


__all__ = [
    "read_image", "resize_image", "ImagePreprocessor",
    "scale_homography", "scale_intrinsics",
]
