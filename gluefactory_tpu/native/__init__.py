"""Native (C++/OpenMP) host ops for the data pipeline, via ctypes.

Build is lazy: the shared library is compiled with g++ on first import and
cached next to the source. Every entry point has a NumPy fallback so the
package works without a toolchain.

API:
    warp_perspective(img, H, (w, h)) -> warped   (cv2.warpPerspective semantics)
    rgb_to_gray(img) -> gray
    brightness_contrast(img, alpha, beta) -> adjusted
    resize_bilinear(img, (w, h)) -> resized
    lsd_detect(gray) -> (n, 7) segments, or None if the library is unavailable
    available() -> bool
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libwarp_ops.so"
_SOURCES = [_HERE / "warp_ops.cpp", _HERE / "lsd.cpp"]
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        *[str(s) for s in _SOURCES], "-o", str(_LIB_PATH),
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
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < max(
        s.stat().st_mtime for s in _SOURCES
    ):
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
    lib.lsd_detect_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, f32p, ctypes.c_int,
    ]
    lib.lsd_detect_f32.restype = ctypes.c_int
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


def lsd_detect(
    gray: np.ndarray,
    scale: float = 0.8,
    sigma_scale: float = 0.6,
    quant: float = 2.0,
    ang_th: float = 22.5,
    log_eps: float = 0.0,
    density_th: float = 0.7,
    n_bins: int = 1024,
    max_segments: int = 8192,
):
    """Detect line segments with the native LSD implementation (lsd.cpp).

    `gray` is a float32 (H, W) image in [0, 1]. Returns an (n, 7) float32
    array of (x1, y1, x2, y2, width, precision, -log10 NFA) rows, or None
    when the native library could not be built (caller should fall back).
    """
    lib = _load()
    if lib is None:
        return None
    gray = np.ascontiguousarray(gray, np.float32)
    if gray.ndim == 3:
        gray = gray[..., 0] if gray.shape[-1] == 1 else (
            gray @ np.array([0.299, 0.587, 0.114], np.float32)
        )
    h, w = gray.shape
    out = np.empty((max_segments, 7), np.float32)
    n = lib.lsd_detect_f32(
        _fptr(gray), h, w, scale, sigma_scale, quant, ang_th,
        log_eps, density_th, n_bins, _fptr(out), max_segments,
    )
    return out[:n].copy()


__all__ = [
    "warp_perspective", "brightness_contrast", "rgb_to_gray",
    "resize_bilinear", "lsd_detect", "available",
]
