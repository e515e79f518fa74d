"""Classical detectors + LGHD multispectral descriptor.

Counterpart of reference gluefactory/multipoint/models/ClassicDetectors.py:
cv2 SIFT/SURF detect-and-compute, or FAST keypoints with LGHD (Log-Gabor
Histogram Descriptor) — the classical baseline for optical<->thermal
matching. TPU re-design:

  - detection stays on the host (cv2, like our SIFT/LSD host extractors);
  - the LGHD pipeline is JAX: the log-Gabor filter bank responses are one
    batched FFT multiply (jnp.fft.fft2 * bank -> ifft2 magnitude), and the
    per-keypoint 4x4xA orientation histograms are a vectorized one-hot sum
    over gathered patches (the reference loops keypoints in Python,
    ClassicDetectors.py:129-152);
  - outputs are the framework's sparse fixed-shape arrays (keypoints /
    descriptors / keypoint_mask) plus the reference's `prob` map; the dense
    HxW descriptor map (reference :85-90) is deliberately replaced by the
    sparse form (same information, no HxWx384 tensor).

SURF is patented and absent from this OpenCV build; `method: surf` raises
with that explanation (reference ClassicDetectors.py:45-47 uses
xfeatures2d).
"""

from __future__ import annotations

import functools

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ...models.base_model import BaseModel
from ..utils.utils import keypoint_map_from_points


def log_gabor_filter_bank(
    H: int, W: int, n_scales: int = 4, n_angles: int = 6,
    min_wavelength: float = 3.0, multiplier: float = 1.6,
    sigma_onf: float = 0.75, cutoff: float = 0.45, sharpness: int = 15,
) -> np.ndarray:
    """(S*A, H, W) frequency-domain log-Gabor x angular-spread filters
    (reference ClassicDetectors.py:175-214)."""
    x, y = np.meshgrid(np.linspace(-0.5, 0.5, W), np.linspace(-0.5, 0.5, H))
    radius = np.fft.ifftshift(np.sqrt(x**2 + y**2))
    theta = np.fft.ifftshift(np.arctan2(-y, x))
    radius[0, 0] = 1.0  # avoid log(0) at DC; the lowpass zeroes it anyway

    lowpass = 1.0 / (1.0 + (radius / cutoff) ** (2 * sharpness))
    sin_t, cos_t = np.sin(theta), np.cos(theta)

    bank = np.zeros((n_scales * n_angles, H, W), np.float32)
    for s in range(n_scales):
        wavelength = min_wavelength * multiplier**s
        lg = np.exp(-(np.log(radius * wavelength) ** 2) / (2 * np.log(sigma_onf) ** 2))
        lg = lg * lowpass
        for a in range(n_angles):
            angle = a * np.pi / n_angles
            ds = sin_t * np.cos(angle) - cos_t * np.sin(angle)
            dc = cos_t * np.cos(angle) + sin_t * np.sin(angle)
            dtheta = np.minimum(np.abs(np.arctan2(ds, dc)) * n_angles * 0.5, np.pi)
            bank[s * n_angles + a] = lg * (np.cos(dtheta) + 1) / 2
    return bank


@functools.partial(jax.jit, static_argnames=("n_scales", "n_angles", "patch_size"))
def lghd_descriptors(
    image: jnp.ndarray, bank: jnp.ndarray, kpts: jnp.ndarray,
    n_scales: int = 4, n_angles: int = 6, patch_size: int = 40,
) -> jnp.ndarray:
    """LGHD descriptors at keypoints.

    image: (H, W); bank: (S*A, H, W); kpts: (K, 2) xy.
    Returns (K, S*16*A) histograms (reference :129-152 semantics).
    """
    fft = jnp.fft.fft2(image)[None]
    eo = jnp.abs(jnp.fft.ifft2(fft * bank))  # (S*A, H, W) response magnitude

    half = patch_size // 2
    quarter = patch_size // 4
    # dominant orientation per pixel & scale, then 4x4-grid histograms
    eo = eo.reshape(n_scales, n_angles, *image.shape)
    max_idx = jnp.argmax(eo, axis=1)  # (S, H, W)

    ys = jnp.clip(kpts[:, 1].astype(jnp.int32), half, image.shape[0] - half)
    xs = jnp.clip(kpts[:, 0].astype(jnp.int32), half, image.shape[1] - half)
    dy, dx = jnp.meshgrid(
        jnp.arange(-half, half), jnp.arange(-half, half), indexing="ij"
    )
    py = ys[:, None, None] + dy[None]  # (K, P, P)
    px = xs[:, None, None] + dx[None]
    patches = max_idx[:, py, px]  # (S, K, P, P)

    onehot = jax.nn.one_hot(patches, n_angles)  # (S, K, P, P, A)
    cells = onehot.reshape(
        n_scales, -1, 4, quarter, 4, quarter, n_angles
    ).sum((3, 5))  # (S, K, 4, 4, A)
    desc = cells.transpose(1, 0, 2, 3, 4).reshape(cells.shape[1], -1)
    return desc


@functools.lru_cache(maxsize=4)
def _cached_bank(h: int, w: int, n_scales: int, n_angles: int):
    return jnp.asarray(log_gabor_filter_bank(h, w, n_scales, n_angles))


class ClassicDetectors(BaseModel):
    default_conf = {
        "name": "classic_detectors",
        "method": "lghd",  # "sift" | "orb" | "lghd" ("surf": unavailable)
        "max_num_keypoints": 512,
        "min_keypoints": 100,  # retry with a looser detector below this
        "fast_threshold": 20,
        "lghd": {"n_scales": 4, "n_angles": 6, "patch_size": 40},
    }
    required_data_keys = ["image"]

    def _detect_host(self, img_u8: np.ndarray):
        conf = self.conf
        if conf.method == "sift":
            det = cv2.SIFT_create(int(conf.max_num_keypoints))
            kps, desc = det.detectAndCompute(img_u8, None)
            if len(kps) < conf.min_keypoints:
                kps, desc = cv2.SIFT_create(0).detectAndCompute(img_u8, None)
        elif conf.method == "orb":
            det = cv2.ORB_create(int(conf.max_num_keypoints))
            kps, desc = det.detectAndCompute(img_u8, None)
            if desc is not None:
                desc = desc.astype(np.float32)
        else:  # lghd: FAST corners, descriptors computed in JAX later
            fast = cv2.FastFeatureDetector_create(int(self.conf.fast_threshold))
            kps = fast.detect(img_u8, None)
            if len(kps) < conf.min_keypoints:
                kps = cv2.FastFeatureDetector_create(5).detect(img_u8, None)
            desc = None
        pts = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
        scores = np.array([k.response for k in kps], np.float32)
        return pts, scores, desc

    def __call__(self, data: dict) -> dict:
        """Host+device hybrid; call OUTSIDE jit (like the host SIFT/LSD)."""
        self.check_required_keys(data)
        conf = self.conf
        if conf.method == "surf":
            raise ValueError(
                "SURF is patented and not built into this OpenCV; use "
                "'sift', 'orb' or 'lghd' (reference uses cv2.xfeatures2d)"
            )
        images = np.asarray(data["image"])  # (B, H, W, C)
        if images.shape[-1] == 3:
            images = (images @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        K = int(conf.max_num_keypoints)

        kpts = np.zeros((b, K, 2), np.float32)
        scores = np.zeros((b, K), np.float32)
        mask = np.zeros((b, K), bool)
        descs = []
        dim = None
        for i in range(b):
            img_u8 = (images[i, ..., 0] * 255).astype(np.uint8)
            pts, sc, desc = self._detect_host(img_u8)
            order = np.argsort(-sc)[:K]
            n = len(order)
            kpts[i, :n] = pts[order]
            scores[i, :n] = sc[order]
            mask[i, :n] = True
            if conf.method == "lghd":
                lc = dict(conf.lghd)
                bank = _cached_bank(h, w, lc["n_scales"], lc["n_angles"])
                d = np.array(
                    lghd_descriptors(
                        jnp.asarray(images[i, ..., 0]), bank,
                        jnp.asarray(kpts[i]), **lc
                    )
                )
                d[n:] = 0.0
            else:
                dim = 128 if conf.method == "sift" else 32
                d = np.zeros((K, dim), np.float32)
                if desc is not None and n:
                    d[:n] = desc[order]
            descs.append(d)
        descs = np.stack(descs)
        # normalized descriptors (RootSIFT-style for histogramy LGHD/SIFT)
        norm = np.linalg.norm(descs, axis=-1, keepdims=True)
        descs = descs / np.maximum(norm, 1e-8)

        prob = keypoint_map_from_points(
            jnp.asarray(kpts), jnp.asarray(mask), (h, w)
        )
        return {
            "keypoints": jnp.asarray(kpts),
            "keypoint_scores": jnp.asarray(scores),
            "keypoint_mask": jnp.asarray(mask),
            "descriptors": jnp.asarray(descs),
            "prob": prob,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = ClassicDetectors
