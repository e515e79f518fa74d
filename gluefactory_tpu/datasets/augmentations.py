"""Photometric augmentation pipelines.

Counterpart of reference gluefactory/datasets/augmentations.py:99-244, which
builds on albumentations (not available here): the same augmentation
*families* — identity / "dark" (strong photometric degradation) / "lg" (the
LightGlue training recipe) — implemented natively with cv2/numpy. Operate on
float32 grayscale or RGB images in [0, 1], HWC.
"""

from __future__ import annotations

import cv2
import numpy as np


def _rand(rng, lo, hi):
    return rng.uniform(lo, hi)


def _maybe(rng, p):
    return rng.rand() < p


def _clip(img):
    return np.clip(img, 0.0, 1.0)


def _brightness_contrast(img, rng, b=0.2, c=0.2):
    alpha = 1.0 + _rand(rng, -c, c)
    beta = _rand(rng, -b, b)
    return _clip(img * alpha + beta)


def _gamma(img, rng, lo=0.5, hi=2.0):
    return _clip(np.power(np.maximum(img, 1e-6), _rand(rng, lo, hi)))


def _gaussian_noise(img, rng, sigma_max=0.05):
    return _clip(img + rng.randn(*img.shape).astype(np.float32) * _rand(rng, 0, sigma_max))

def _blur(img, rng, kmax=5):
    k = rng.choice([3, 5]) if kmax >= 5 else 3
    out = cv2.GaussianBlur(img, (k, k), 0)
    return out.reshape(img.shape)


def _motion_blur(img, rng, kmax=7):
    k = int(rng.choice([3, 5, 7]))
    kernel = np.zeros((k, k), np.float32)
    ang = _rand(rng, 0, np.pi)
    c = (k - 1) / 2
    for i in range(k):
        x = int(round(c + (i - c) * np.cos(ang)))
        y = int(round(c + (i - c) * np.sin(ang)))
        kernel[np.clip(y, 0, k - 1), np.clip(x, 0, k - 1)] = 1
    kernel /= kernel.sum()
    return cv2.filter2D(img, -1, kernel).reshape(img.shape)


def _random_shade(img, rng, nb_ellipses=12, intensity=(-0.4, 0.2)):
    """Additive elliptical shading (counterpart of reference
    RandomAdditiveShade, datasets/augmentations.py:19-60)."""
    h, w = img.shape[:2]
    mask = np.zeros((h, w), np.float32)
    for _ in range(nb_ellipses):
        ax = int(max(rng.rand() * min(h, w) / 3, 8))
        ay = int(max(rng.rand() * min(h, w) / 3, 8))
        x = rng.randint(ax, max(w - ax, ax + 1))
        y = rng.randint(ay, max(h - ay, ay + 1))
        angle = rng.rand() * 90
        cv2.ellipse(mask, (x, y), (ax, ay), angle, 0, 360, 1.0, -1)
    mask = cv2.GaussianBlur(mask, (0, 0), min(h, w) / 10)
    shade = _rand(rng, *intensity)
    out = img + shade * mask[..., None] if img.ndim == 3 else img + shade * mask
    return _clip(out)


class IdentityAugmentation:
    def __call__(self, img, rng):
        return img


class LGAugmentation:
    """LightGlue training photometric recipe: mild brightness/contrast/gamma,
    occasional blur and noise (reference LGAugmentation)."""

    def __call__(self, img, rng):
        img = img.astype(np.float32)
        if _maybe(rng, 0.95):
            img = _brightness_contrast(img, rng)
        if _maybe(rng, 0.3):
            img = _gamma(img, rng, 0.7, 1.4)
        if _maybe(rng, 0.2):
            img = _blur(img, rng)
        if _maybe(rng, 0.2):
            img = _gaussian_noise(img, rng, 0.03)
        return img


class DarkAugmentation:
    """Strong low-light degradation (reference DarkAugmentation)."""

    def __call__(self, img, rng):
        img = img.astype(np.float32)
        img = _gamma(img, rng, 1.5, 3.0)
        img = _brightness_contrast(img, rng, b=0.3, c=0.4)
        if _maybe(rng, 0.5):
            img = _gaussian_noise(img, rng, 0.06)
        if _maybe(rng, 0.3):
            img = _motion_blur(img, rng)
        if _maybe(rng, 0.3):
            img = _random_shade(img, rng)
        return img


augmentations = {
    "identity": IdentityAugmentation,
    "lg": LGAugmentation,
    "dark": DarkAugmentation,
}


__all__ = ["augmentations", "IdentityAugmentation", "LGAugmentation", "DarkAugmentation"]
