"""Keypoints on a fixed grid (counterpart of reference
models/extractors/grid_extractor.py:20-57) — for dense/semi-dense experiments
and fast synthetic tests."""

from __future__ import annotations

import jax.numpy as jnp

from ..base_model import BaseModel


class GridExtractor(BaseModel):
    default_conf = {"name": "grid_extractor", "cell_size": 14}
    required_data_keys = ["image"]

    def __call__(self, data):
        self.check_required_keys(data)
        b, h, w, _ = data["image"].shape
        cs = self.conf.cell_size
        ys, xs = jnp.meshgrid(
            jnp.arange(h // cs, dtype=jnp.float32),
            jnp.arange(w // cs, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([xs, ys], axis=-1) * cs + cs / 2 + 0.5
        kpts = jnp.broadcast_to(grid.reshape(1, -1, 2), (b, grid.shape[0] * grid.shape[1], 2))
        return {
            "grid": jnp.broadcast_to(grid[None], (b,) + grid.shape),
            "keypoints": kpts,
            "keypoint_scores": jnp.ones(kpts.shape[:-1], jnp.float32),
            "keypoint_mask": jnp.ones(kpts.shape[:-1], bool),
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = GridExtractor
