"""Dense nearest-neighbor descriptor matcher.

Counterpart of reference models/matchers/nearest_neighbor_matcher.py:15-97:
cosine-similarity NN with optional ratio test, distance threshold, and mutual
check — batched, static shapes, padding-mask aware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base_model import BaseModel

_NEG_INF = -1e9


def find_nn(sim, ratio_thresh, distance_thresh):
    """Top-1 (optionally ratio-tested) nearest neighbor per row."""
    top2_val, top2_idx = jax.lax.top_k(sim, 2)
    dist_nn = 2 * (1 - top2_val)  # descriptors assumed L2-normalized
    mask = jnp.ones(sim.shape[:-1], bool)
    if ratio_thresh is not None:
        mask &= dist_nn[..., 0] <= (ratio_thresh**2) * dist_nn[..., 1]
    if distance_thresh is not None:
        mask &= dist_nn[..., 0] <= distance_thresh**2
    matches = jnp.where(mask, top2_idx[..., 0], -1)
    scores = jnp.where(mask, (top2_val[..., 0] + 1) / 2.0, 0.0)
    return matches.astype(jnp.int32), scores


def mutual_check(m0, m1):
    inds0 = jnp.arange(m0.shape[-1])[None]
    loop = jnp.take_along_axis(m1, jnp.clip(m0, 0, None), axis=-1)
    ok = (m0 > -1) & (inds0 == loop)
    return jnp.where(ok, m0, -1)


class NearestNeighborMatcher(BaseModel):
    default_conf = {
        "name": "nearest_neighbor_matcher",
        "ratio_thresh": None,
        "distance_thresh": None,
        "mutual_check": True,
        "loss": None,
    }
    required_data_keys = ["descriptors0", "descriptors1"]

    def __call__(self, data):
        self.check_required_keys(data)
        d0, d1 = data["descriptors0"], data["descriptors1"]
        sim = jnp.einsum(
            "bnd,bmd->bnm", d0, d1, preferred_element_type=jnp.float32
        )
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        if mask0 is not None:
            sim = jnp.where(mask0[:, :, None], sim, _NEG_INF)
        if mask1 is not None:
            sim = jnp.where(mask1[:, None, :], sim, _NEG_INF)

        matches0, scores0 = find_nn(
            sim, self.conf.ratio_thresh, self.conf.distance_thresh
        )
        matches1, scores1 = find_nn(
            sim.swapaxes(-1, -2), self.conf.ratio_thresh, self.conf.distance_thresh
        )
        if self.conf.mutual_check:
            matches0 = mutual_check(matches0, matches1)
            matches1 = mutual_check(matches1, matches0)
        if mask0 is not None:
            matches0 = jnp.where(mask0, matches0, -1)
            scores0 = jnp.where(mask0, scores0, 0.0)
        if mask1 is not None:
            matches1 = jnp.where(mask1, matches1, -1)
            scores1 = jnp.where(mask1, scores1, 0.0)
        return {
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": scores0,
            "matching_scores1": scores1,
            "similarity": sim,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = NearestNeighborMatcher
