"""Native (C++/OpenMP) host ops for the data pipeline, via ctypes.

Build is lazy: the shared library is compiled with g++ on first import and
cached next to the source. Every entry point has a NumPy fallback so the
package works without a toolchain.

API:
    warp_perspective(img, H, (w, h)) -> warped   (cv2.warpPerspective semantics)
    rgb_to_gray(img) -> gray
    brightness_contrast(img, alpha, beta) -> adjusted
    resize_bilinear(img, (w, h)) -> resized
    available() -> bool
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libwarp_ops.so"
_lib = None
_build_failed = False


def _build() -> bool:
    src = _HERE / "warp_ops.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        str(src), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        try:  # retry without OpenMP
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            return False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < (
        _HERE / "warp_ops.cpp"
    ).stat().st_mtime:
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.warp_perspective_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f64p,
        f32p, ctypes.c_int, ctypes.c_int,
    ]
    lib.brightness_contrast_f32.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
    ]
    lib.rgb_to_gray_f32.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int]
    lib.resize_bilinear_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_perspective(img: np.ndarray, H: np.ndarray, size) -> np.ndarray:
    """Warp float32 HWC img by homography H into (w, h) output."""
    w, h = size
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    lib = _load()
    if lib is None:  # NumPy fallback
        import cv2

        out = cv2.warpPerspective(img, H.astype(np.float64), (w, h))
        return out.reshape(h, w, -1)
    H_inv = np.ascontiguousarray(np.linalg.inv(np.asarray(H, np.float64)))
    out = np.empty((h, w, img.shape[-1]), np.float32)
    lib.warp_perspective_f32(
        _fptr(img), img.shape[0], img.shape[1], img.shape[2],
        H_inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _fptr(out), h, w,
    )
    return out


def brightness_contrast(img: np.ndarray, alpha: float, beta: float) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    lib = _load()
    if lib is None:
        return np.clip(img * alpha + beta, 0, 1)
    out = np.empty_like(img)
    lib.brightness_contrast_f32(_fptr(img), _fptr(out), img.size, alpha, beta)
    return out


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    lib = _load()
    if lib is None:
        return (img * np.array([0.299, 0.587, 0.114], np.float32)).sum(-1, keepdims=True)
    h, w = img.shape[:2]
    out = np.empty((h, w, 1), np.float32)
    lib.rgb_to_gray_f32(_fptr(img), _fptr(out), h, w)
    return out


def resize_bilinear(img: np.ndarray, size) -> np.ndarray:
    w, h = size
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    lib = _load()
    if lib is None:
        import cv2

        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR).reshape(h, w, -1)
    out = np.empty((h, w, img.shape[-1]), np.float32)
    lib.resize_bilinear_f32(
        _fptr(img), img.shape[0], img.shape[1], img.shape[2], _fptr(out), h, w
    )
    return out


__all__ = [
    "warp_perspective", "brightness_contrast", "rgb_to_gray",
    "resize_bilinear", "available",
]
