"""LSD line segment detector.

Counterpart of reference gluefactory/models/lines/lsd.py:9-81 (pytlsd C++).
pytlsd is not available here; OpenCV's LSD implementation (same algorithm) is
wrapped in `jax.pure_callback` with fixed-shape padded outputs, so the
detector composes with jitted pipelines like the SIFT extractor.

Outputs: lines (B, L, 2, 2) endpoint pairs, line_scores (B, L) (sqrt-length
weighted, normalized per image like reference wireframe.py:176-178),
line_mask (B, L).
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel


class LSD(BaseModel):
    default_conf = {
        "name": "lsd",
        "max_num_lines": 250,
        "min_length": 15.0,
    }
    required_data_keys = ["image"]

    def _host_detect(self, images: np.ndarray):
        conf = self.conf
        L = int(conf.max_num_lines)
        b = images.shape[0]
        lines = np.zeros((b, L, 2, 2), np.float32)
        scores = np.zeros((b, L), np.float32)
        mask = np.zeros((b, L), bool)
        lsd = cv2.createLineSegmentDetector()
        for i in range(b):
            img = images[i, ..., 0] if images.shape[-1] == 1 else cv2.cvtColor(
                images[i], cv2.COLOR_RGB2GRAY
            )
            img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            det = lsd.detect(img_u8)[0]
            if det is None or len(det) == 0:
                continue
            segs = det.reshape(-1, 2, 2)
            lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
            keep = lengths >= conf.min_length
            segs, lengths = segs[keep], lengths[keep]
            sc = np.sqrt(lengths)  # reference score ~ sqrt(length)
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
