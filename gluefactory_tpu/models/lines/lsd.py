"""LSD line segment detector.

Counterpart of reference gluefactory/models/lines/lsd.py:9-81 (pytlsd C++).
The default backend is the framework's own native C++ implementation of the
published LSD algorithm (gluefactory_tpu/native/lsd.cpp, von Gioi IPOL 2012)
— the same algorithm pytlsd binds — scoring lines by -log10(NFA)*sqrt(len)
like the reference (:42). OpenCV's LSD is kept as a cross-check/fallback
backend. Both are wrapped in `jax.pure_callback` with fixed-shape padded
outputs, so the detector composes with jitted pipelines like the SIFT
extractor.

Outputs: lines (B, L, 2, 2) endpoint pairs, line_scores (B, L) (normalized
per image like reference wireframe.py:176-178), line_mask (B, L).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import native
from ..base_model import BaseModel


class LSD(BaseModel):
    default_conf = {
        "name": "lsd",
        "max_num_lines": 250,
        "min_length": 15.0,
        "backend": "native",  # native C++ LSD | "opencv" cross-check
    }
    required_data_keys = ["image"]

    def _detect_single(self, img: np.ndarray):
        """Detect on one grayscale float image -> (segs (n,2,2), nfa (n,))."""
        if self.conf.backend == "native" and native.available():
            rows = native.lsd_detect(img)
            if rows is None or len(rows) == 0:
                return np.zeros((0, 2, 2), np.float32), np.zeros((0,), np.float32)
            return rows[:, :4].reshape(-1, 2, 2), np.maximum(rows[:, 6], 0.0)
        import cv2

        img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        det = cv2.createLineSegmentDetector().detect(img_u8)[0]
        if det is None or len(det) == 0:
            return np.zeros((0, 2, 2), np.float32), np.zeros((0,), np.float32)
        segs = det.reshape(-1, 2, 2)
        # OpenCV does not expose NFA by default: neutral unit weight
        return segs, np.ones((len(segs),), np.float32)

    def _host_detect(self, images: np.ndarray):
        conf = self.conf
        L = int(conf.max_num_lines)
        b = images.shape[0]
        lines = np.zeros((b, L, 2, 2), np.float32)
        scores = np.zeros((b, L), np.float32)
        mask = np.zeros((b, L), bool)
        for i in range(b):
            img = images[i, ..., 0] if images.shape[-1] == 1 else (
                images[i] @ np.array([0.299, 0.587, 0.114], np.float32)
            )
            segs, nfa = self._detect_single(np.asarray(img, np.float32))
            if len(segs) == 0:
                continue
            lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
            keep = lengths >= conf.min_length
            segs, lengths, nfa = segs[keep], lengths[keep], nfa[keep]
            # reference score = nfa * sqrt(length) (lsd.py:42)
            sc = nfa * np.sqrt(lengths)
            order = np.argsort(-sc)[:L]
            segs, sc = segs[order], sc[order]
            n = len(segs)
            lines[i, :n] = segs
            scores[i, :n] = sc
            mask[i, :n] = True
        # normalize scores per image (reference wireframe.py:176-178)
        maxs = scores.max(axis=1, keepdims=True)
        scores = scores / (maxs + 1e-8)
        return lines, scores, mask

    def __call__(self, data):
        self.check_required_keys(data)
        image = data["image"]
        b = image.shape[0]
        L = self.conf.max_num_lines
        out_shapes = (
            jax.ShapeDtypeStruct((b, L, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, L), jnp.float32),
            jax.ShapeDtypeStruct((b, L), jnp.bool_),
        )
        if isinstance(image, jax.core.Tracer):
            # under jit: host callback (NOT supported by the axon TPU relay)
            lines, scores, mask = jax.pure_callback(
                self._host_detect, out_shapes, image, vmap_method="sequential"
            )
        else:  # eager host path: plain numpy, no backend involvement
            lines, scores, mask = jax.tree.map(
                jnp.asarray, self._host_detect(np.asarray(image))
            )
        return {"lines": lines, "line_scores": scores, "line_mask": mask}

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = LSD
