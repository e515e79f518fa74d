"""SIFT keypoints + descriptors.

Counterpart of reference models/extractors/sift.py:137-213, which calls the
native pycolmap/OpenCV SIFT. Here the OpenCV backend is wrapped in
`jax.pure_callback`, so the extractor composes with the jitted TwoViewPipeline
on TPU: the callback runs on host per batch, returns fixed-shape padded
arrays (keypoints, scales, oris, RootSIFT descriptors, validity mask), and
everything downstream stays on-device. A future pure-JAX DoG backend can slot
in behind the same interface.
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel


def run_opencv_sift(features: cv2.SIFT, image_u8: np.ndarray):
    """Detect + describe one uint8 grayscale image (reference sift.py:60-76)."""
    kpts, descriptors = features.detectAndCompute(image_u8, None)
    points = np.array([k.pt for k in kpts], np.float32).reshape(-1, 2)
    scores = np.array([k.response for k in kpts], np.float32)
    scales = np.array([k.size for k in kpts], np.float32)
    angles = np.deg2rad(np.array([k.angle for k in kpts], np.float32))
    if descriptors is None:
        descriptors = np.zeros((0, 128), np.float32)
    return points, scores, scales, angles, descriptors.astype(np.float32)


class SIFT(BaseModel):
    default_conf = {
        "name": "sift",
        "backend": "opencv",
        "max_num_keypoints": 2048,
        "detection_threshold": 0.0066667,  # OpenCV contrastThreshold
        "edge_threshold": 10,
        "first_octave": -1,
        "num_octaves": 4,
        "rootsift": True,
        "nms_radius": 0,
    }
    required_data_keys = ["image"]

    def _host_extract(self, images: np.ndarray):
        conf = self.conf
        k_max = conf.max_num_keypoints
        sift = cv2.SIFT_create(
            contrastThreshold=float(conf.detection_threshold),
            nfeatures=k_max,
            edgeThreshold=float(conf.edge_threshold),
        )
        b = images.shape[0]
        kpts = np.zeros((b, k_max, 2), np.float32)
        scores = np.zeros((b, k_max), np.float32)
        scales = np.zeros((b, k_max), np.float32)
        oris = np.zeros((b, k_max), np.float32)
        descs = np.zeros((b, k_max, 128), np.float32)
        mask = np.zeros((b, k_max), bool)
        for i in range(b):
            img = images[i, ..., 0] if images.shape[-1] == 1 else cv2.cvtColor(
                images[i], cv2.COLOR_RGB2GRAY
            )
            img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            p, s, sc, a, d = run_opencv_sift(sift, img_u8)
            if len(p) > k_max:  # keep top-k by response (reference :167-173)
                order = np.argsort(-s)[:k_max]
                p, s, sc, a, d = p[order], s[order], sc[order], a[order], d[order]
            if self.conf.rootsift and len(d):  # reference :54-57
                d = d / np.maximum(d.sum(-1, keepdims=True), 1e-8)
                d = np.sqrt(d)
            n = len(p)
            kpts[i, :n] = p
            scores[i, :n] = s
            scales[i, :n] = sc
            oris[i, :n] = a
            descs[i, :n] = d
            mask[i, :n] = True
        return kpts, scores, scales, oris, descs, mask

    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        image = data["image"]
        b = image.shape[0]
        k = self.conf.max_num_keypoints
        out_shapes = (
            jax.ShapeDtypeStruct((b, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.bool_),
        )
        if isinstance(image, jax.core.Tracer):
            # under jit: host callback (NOT supported by the axon TPU relay -
            # use the cached-feature workflow there; works on cpu/gpu/tpu-vm)
            kpts, scores, scales, oris, descs, mask = jax.pure_callback(
                self._host_extract, out_shapes, image, vmap_method="sequential"
            )
        else:  # eager host path: plain numpy, no backend involvement
            kpts, scores, scales, oris, descs, mask = jax.tree.map(
                jnp.asarray, self._host_extract(np.asarray(image))
            )
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "scales": scales,
            "oris": oris,
            "descriptors": descs,
            "keypoint_mask": mask,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = SIFT
