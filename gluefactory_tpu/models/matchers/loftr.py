"""LoFTR-style detector-free dense matcher, TPU-native.

Counterpart of reference models/matchers/kornia_loftr.py (a kornia pretrained
LoFTR wrapper, eval-only). kornia is unavailable; this is a native compact
implementation of the LoFTR *architecture family*: CNN backbone producing
coarse (1/8) and fine (1/2) features, a coarse transformer with alternating
self/cross attention over grid tokens, dual-softmax mutual matching of coarse
cells, and fine refinement by correlation soft-argmax in local windows.
Outputs follow the detector-free convention of the reference wrapper:
keypoints are the matched cell centers (refined), and matches0 is the
identity over valid matches (kornia_loftr.py semantics).

Static shapes: the top-K coarse matches are selected with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import masked_attention
from ..base_model import BaseModel


class _ConvBlock(nn.Module):
    c: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (3, 3), strides=(self.stride, self.stride), padding="SAME")(x)
        x = nn.gelu(nn.GroupNorm(num_groups=4)(x))
        x = nn.Conv(self.c, (3, 3), padding="SAME")(x)
        return nn.gelu(nn.GroupNorm(num_groups=4)(x))


class _CoarseLayer(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x, source):
        h = self.heads
        dh = self.dim // h

        def heads_of(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q = heads_of(nn.Dense(self.dim)(x))
        k = heads_of(nn.Dense(self.dim)(source))
        v = heads_of(nn.Dense(self.dim)(source))
        msg = masked_attention(q, k, v, None, None, impl="xla")
        b, _, n, _ = msg.shape
        msg = msg.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        msg = nn.Dense(self.dim)(msg)
        y = nn.LayerNorm()(jnp.concatenate([x, msg], -1))
        y = nn.gelu(nn.Dense(2 * self.dim)(y))
        return x + nn.Dense(self.dim)(y)


class LoFTR(BaseModel):
    default_conf = {
        "name": "loftr",
        "dim_coarse": 128,
        "dim_fine": 64,
        "n_coarse_layers": 3,
        "max_num_matches": 512,
        "coarse_threshold": 0.2,
        "fine_window": 5,
        "temperature": 0.1,
        "is_training": False,
    }
    required_data_keys = ["view0", "view1"]

    @nn.compact
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        img0 = data["view0"]["image"]
        img1 = data["view1"]["image"]
        b = img0.shape[0]

        # shared-weight backbone modules (created once, applied to both views)
        bb1 = _ConvBlock(conf.dim_fine, stride=2, name="bb1")
        bb2 = _ConvBlock(conf.dim_coarse, stride=2, name="bb2")
        bb3 = _ConvBlock(conf.dim_coarse, stride=2, name="bb3")

        def features(img):
            f2 = bb1(img)  # 1/2
            f8 = bb3(bb2(f2))  # 1/8
            return f2, f8

        f2_0, f8_0 = features(img0)
        f2_1, f8_1 = features(img1)
        hc0, wc0 = f8_0.shape[1:3]
        hc1, wc1 = f8_1.shape[1:3]
        t0 = f8_0.reshape(b, hc0 * wc0, conf.dim_coarse)
        t1 = f8_1.reshape(b, hc1 * wc1, conf.dim_coarse)

        # coarse transformer: alternating self/cross (LoFTR's LocalFeatureTransformer)
        for i in range(conf.n_coarse_layers):
            self_layer = _CoarseLayer(conf.dim_coarse, name=f"self_{i}")
            cross_layer = _CoarseLayer(conf.dim_coarse, name=f"cross_{i}")
            t0 = self_layer(t0, t0)
            t1 = self_layer(t1, t1)
            new0 = cross_layer(t0, t1)
            t1 = cross_layer(t1, t0)
            t0 = new0

        # dual-softmax coarse matching
        t0n = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-8)
        t1n = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-8)
        sim = jnp.einsum(
            "bnd,bmd->bnm", t0n, t1n, preferred_element_type=jnp.float32
        ) / conf.temperature
        p = jax.nn.softmax(sim, axis=-1) * jax.nn.softmax(sim, axis=-2)

        # mutual best + threshold, top-K static selection
        best1 = jnp.argmax(p, axis=-1)  # (B, N0)
        score = jnp.max(p, axis=-1)
        best0_of_1 = jnp.argmax(p, axis=-2)  # (B, N1)
        mutual = jnp.take_along_axis(best0_of_1, best1, axis=-1) == jnp.arange(
            t0.shape[1]
        )[None]
        score = jnp.where(mutual, score, 0.0)
        k = conf.max_num_matches
        topv, topi = jax.lax.top_k(score, k)  # (B, K) indices into grid0
        valid = topv > conf.coarse_threshold
        j = jnp.take_along_axis(best1, topi, axis=-1)  # matched grid1 cells

        # cell centers at full resolution (stride 8)
        def centers(idx, wc):
            xs = (idx % wc).astype(jnp.float32) * 8 + 4.0
            ys = (idx // wc).astype(jnp.float32) * 8 + 4.0
            return jnp.stack([xs, ys], -1)

        kpts0 = centers(topi, wc0)
        kpts1 = centers(j, wc1)

        # fine refinement: correlation soft-argmax in a window of 1/2-res feats
        W = conf.fine_window
        r = W // 2
        dy, dx = jnp.meshgrid(
            jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0), indexing="ij"
        )
        offs = jnp.stack([dx, dy], -1).reshape(-1, 2) * 2.0  # 1/2-res stride

        from ..extractors.aliked import _bilinear_raw

        def fine_feat(fmap, pts):
            return _bilinear_raw(fmap, pts[..., 0] / 2.0, pts[..., 1] / 2.0)

        c0 = fine_feat(f2_0, kpts0)  # (B, K, Df)
        win = kpts1[:, :, None, :] + offs[None, None]  # (B, K, W2, 2)
        pw = win.reshape(b, -1, 2)
        c1 = _bilinear_raw(f2_1, pw[..., 0] / 2.0, pw[..., 1] / 2.0)
        c1 = c1.reshape(b, k, -1, conf.dim_fine)
        corr = jnp.einsum(
            "bkd,bkwd->bkw", c0, c1, preferred_element_type=jnp.float32
        ) / conf.dim_fine**0.5
        w_soft = jax.nn.softmax(corr * 10.0, axis=-1)
        refine = jnp.einsum("bkw,wc->bkc", w_soft, offs)
        kpts1 = kpts1 + refine

        matches0 = jnp.where(valid, jnp.arange(k)[None], -1).astype(jnp.int32)
        return {
            "keypoints0": kpts0,
            "keypoints1": kpts1,
            "keypoint_scores0": topv,
            "keypoint_scores1": topv,
            "keypoint_mask0": valid,
            "keypoint_mask1": valid,
            "matches0": matches0,
            "matches1": matches0,
            "matching_scores0": jnp.where(valid, topv, 0.0),
            "matching_scores1": jnp.where(valid, topv, 0.0),
            "coarse_matrix": p,
        }

    def loss(self, pred, data):
        """LoFTR coarse supervision: NLL of the dual-softmax matrix on GT
        cell correspondences (LoFTR paper Sec. 3.4, the L_c term). The
        reference wrapper (matchers/kornia_loftr.py) cannot train at all;
        here GT comes from the pair's known homography via
        `gt_coarse_assignment_from_H`. Needs data: gt_coarse_assignment."""
        p = pred["coarse_matrix"]
        gt = data["gt_coarse_assignment"].astype(jnp.float32)
        nll = -(gt * jnp.log(p + 1e-6)).sum((-1, -2)) / jnp.maximum(
            gt.sum((-1, -2)), 1.0
        )
        return {"total": nll, "coarse_nll": nll}, {}


def gt_coarse_assignment_from_H(
    shape0: tuple, shape1: tuple, H_0to1: jnp.ndarray, cell: int = 8,
    threshold: float | None = None,
):
    """Binary (B, N0, N1) coarse-cell assignment: each view-0 cell center is
    assigned to the view-1 cell CONTAINING its warp under H_0to1 (LoFTR's
    rounded-grid supervision); pass `threshold` to additionally require the
    warp within that many px of the view-1 cell center."""
    from ...geometry.homography import warp_points

    h0, w0 = shape0
    h1, w1 = shape1
    hc0, wc0 = h0 // cell, w0 // cell
    hc1, wc1 = h1 // cell, w1 // cell

    def grid(hc, wc):
        ys, xs = jnp.meshgrid(
            jnp.arange(hc, dtype=jnp.float32),
            jnp.arange(wc, dtype=jnp.float32),
            indexing="ij",
        )
        return jnp.stack([xs, ys], -1).reshape(-1, 2) * cell + cell / 2

    c0 = grid(hc0, wc0)[None]  # (1, N0, 2)
    b = H_0to1.shape[0]
    warped = warp_points(jnp.broadcast_to(c0, (b,) + c0.shape[1:]), H_0to1)
    # containing cell via floor(warped / cell), with an explicit in-GRID
    # check (ADVICE r3: nearest-center only equals containing-cell on a
    # full-coverage grid; warps in the uncovered margin of non-divisible
    # image dims must be dropped, not snapped to an edge cell)
    cx = jnp.floor(warped[..., 0] / cell).astype(jnp.int32)
    cy = jnp.floor(warped[..., 1] / cell).astype(jnp.int32)
    ingrid = (cx >= 0) & (cx < wc1) & (cy >= 0) & (cy < hc1)
    idx = jnp.clip(cy, 0, hc1 - 1) * wc1 + jnp.clip(cx, 0, wc1 - 1)
    onehot = jax.nn.one_hot(idx, hc1 * wc1, dtype=jnp.float32)
    keep = ingrid
    if threshold is not None:
        c1 = grid(hc1, wc1)[None]  # (1, N1, 2)
        center = jnp.take_along_axis(
            jnp.broadcast_to(c1, (b,) + c1.shape[1:]), idx[..., None], axis=1
        )
        keep = keep & (jnp.linalg.norm(warped - center, axis=-1) <= threshold)
    return onehot * keep[..., None].astype(jnp.float32)


__main_model__ = LoFTR
