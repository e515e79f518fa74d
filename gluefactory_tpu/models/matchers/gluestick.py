"""GlueStick joint point+line matcher, TPU-native.

Re-design of reference gluefactory/models/matchers/gluestick.py (776 LoC):
  - nodes are wireframe junctions (line endpoints first, then isolated
    keypoints — the layout produced by lines/wireframe.py, mirroring the
    reference's input contract at :155-195);
  - KeypointEncoder MLP on (x, y, score) and EndPtEncoder on
    (endpoint, +-direction offset, line score) (:484-515);
  - attentional GNN alternating self/cross layers; after every SELF layer, a
    LineLayer passes messages along line segments: each endpoint receives
    MLP(self, other endpoint, line encoding), scatter-averaged onto its
    junction (:582-684). Scatter-mean is a segment_sum over junction indices;
  - point assignment: log double softmax with a learned bin (:761-773);
    line assignment from junction similarities gathered by lines_junc_idx
    with direction-max (:329-369);
  - NLL losses for points and lines (:371-431).

Padding: keypoint_mask (junctions) and line_mask flow through attention,
assignment, scatter ops and losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.assignment import masked_log_softmax
from ...ops.attention import masked_attention
from ..base_model import BaseModel
from ..utils.metrics import matcher_metrics

_NEG_INF = -1e9


def normalize_keypoints_07(kpts, size, mask=None):
    """GlueStick normalization: center at size/2, scale by 0.7*max(size)
    (reference gluestick.py:470-481)."""
    if size is None:
        big = jnp.where(mask[..., None], kpts, -jnp.inf) if mask is not None else kpts
        small = jnp.where(mask[..., None], kpts, jnp.inf) if mask is not None else kpts
        size = 1.0 + jnp.max(big, axis=-2) - jnp.min(small, axis=-2)
    c = size / 2
    f = jnp.max(size, axis=-1, keepdims=True) * 0.7
    return (kpts - c[..., None, :]) / f[..., None, :]


def log_double_softmax(scores, bin_score, mask0=None, mask1=None):
    """Dual-softmax with a learned bin (reference :761-773), masked."""
    b, m, n = scores.shape
    bin_row = jnp.broadcast_to(bin_score, (b, m, 1))
    bin_col = jnp.broadcast_to(bin_score, (b, 1, n))
    pair = None
    if mask0 is not None and mask1 is not None:
        pair = mask0[:, :, None] & mask1[:, None, :]
        scores = jnp.where(pair, scores, _NEG_INF)
        bin_row = jnp.where(mask0[:, :, None], bin_row, _NEG_INF)
        bin_col = jnp.where(mask1[:, None, :], bin_col, _NEG_INF)
    s0 = jnp.concatenate([scores, bin_row], axis=2)
    s1 = jnp.concatenate([scores, bin_col], axis=1)
    ls0 = masked_log_softmax(s0, None if pair is None else s0 > _NEG_INF / 2, axis=2)
    ls1 = masked_log_softmax(s1, None if pair is None else s1 > _NEG_INF / 2, axis=1)
    out = jnp.full((b, m + 1, n + 1), 0.0, scores.dtype)
    out = out.at[:, :m, :n].set((ls0[:, :, :n] + ls1[:, :m]) / 2)
    out = out.at[:, :m, -1].set(ls0[:, :, -1])
    out = out.at[:, -1, :n].set(ls1[:, -1])
    return out


def scatter_mean(values, idx, n_out):
    """Per-batch scatter-mean: values (B, K, D) into (B, n_out, D) by idx
    (B, K). Equivalent of torch scatter_reduce mean (reference :634-676)."""
    def one(v, i):
        sums = jnp.zeros((n_out, v.shape[-1]), v.dtype).at[i].add(v)
        counts = jnp.zeros((n_out,), v.dtype).at[i].add(1.0)
        return sums / jnp.maximum(counts, 1.0)[:, None]

    return jax.vmap(one)(values, idx)


class _MLP(nn.Module):
    layers: tuple
    use_ln: bool = True  # False for converted official weights (the
    # reference's BatchNorm1d, gluestick.py:458-467, is folded into the convs)

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.layers):
            x = nn.Dense(c)(x)
            if i < len(self.layers) - 1:
                if self.use_ln:
                    x = nn.LayerNorm()(x)
                x = nn.relu(x)
        return x


class _AttnPropagation(nn.Module):
    dim: int
    heads: int = 4
    use_ln: bool = True

    @nn.compact
    def __call__(self, x, source, mask_x, mask_s):
        h = self.heads
        dh = self.dim // h

        def heads_of(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q = heads_of(nn.Dense(self.dim)(x))
        k = heads_of(nn.Dense(self.dim)(source))
        v = heads_of(nn.Dense(self.dim)(source))
        impl = "xla"  # pallas kernel lacks a VJP; XLA fuses fine here
        msg = masked_attention(q, k, v, mask_x, mask_s, impl=impl)
        b, _, n, _ = msg.shape
        msg = msg.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        msg = nn.Dense(self.dim)(msg)
        return _MLP((2 * self.dim, self.dim), use_ln=self.use_ln)(
            jnp.concatenate([x, msg], -1)
        )


class _LineLayer(nn.Module):
    dim: int
    use_ln: bool = True

    @nn.compact
    def __call__(self, ldesc, line_enc, lines_junc_idx, line_ep_mask):
        """ldesc (B, J, D); line_enc (B, 2L, D); lines_junc_idx (B, 2L);
        line_ep_mask (B, 2L) validity of each line endpoint."""
        b, j, d = ldesc.shape
        ep = jnp.take_along_axis(ldesc, lines_junc_idx[..., None], axis=1)  # (B,2L,D)
        other = ep.reshape(b, -1, 2, d)[:, :, ::-1].reshape(b, -1, d)
        message = _MLP((2 * self.dim, self.dim), use_ln=self.use_ln)(
            jnp.concatenate([ep, other, line_enc], -1)
        )
        message = message * line_ep_mask[..., None]
        # padded endpoints scatter into junction 0 with zero weight: route
        # them to a dead index (j) and trim
        idx = jnp.where(line_ep_mask, lines_junc_idx, j)
        update = scatter_mean(message, idx, j + 1)[:, :j]
        return ldesc + update


class GlueStick(BaseModel):
    default_conf = {
        "name": "gluestick",
        "input_dim": 256,
        "descriptor_dim": 256,
        "weights": None,
        "keypoint_encoder": [32, 64, 128, 256],
        "n_gnn_layers": 9,  # pairs of (self, cross)
        "num_line_iterations": 1,
        "filter_threshold": 0.2,
        # False for converted official weights (reference BatchNorm folded in)
        "ln": True,
        # reproduce the reference EndPtEncoder's line-score layout: it TILES
        # scores.repeat(1, 2) = [s_0..s_L, s_0..s_L] against line-major
        # interleaved endpoints (gluestick.py:508-515), so endpoint (l, e)
        # reads score (2l+e) mod L. Official weights were trained with this;
        # our default uses the aligned per-line score.
        "compat_tiled_line_scores": False,
        "checkpointed": False,
        "is_training": False,
        "loss": {"nll_weight": 1.0, "nll_balancing": 0.5},
    }
    required_data_keys = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
        "keypoint_scores0", "keypoint_scores1",
        "lines0", "lines1", "lines_junc_idx0", "lines_junc_idx1",
        "line_scores0", "line_scores1",
    ]

    def setup(self):
        conf = self.conf
        d = conf.descriptor_dim
        if conf.input_dim != d:
            self.input_proj = nn.Dense(d)
        enc_layers = tuple(conf.keypoint_encoder)
        ln = bool(conf.ln)
        self.kenc = _MLP(enc_layers + (d,), use_ln=ln)
        self.lenc = _MLP(enc_layers + (d,), use_ln=ln)
        self.gnn_self = [
            _AttnPropagation(d, use_ln=ln, name=f"self_{i}")
            for i in range(conf.n_gnn_layers)
        ]
        self.gnn_cross = [
            _AttnPropagation(d, use_ln=ln, name=f"cross_{i}")
            for i in range(conf.n_gnn_layers)
        ]
        self.line_layers = [
            _LineLayer(d, use_ln=ln, name=f"line_{i}")
            for i in range(conf.n_gnn_layers)
        ]
        self.final_proj = nn.Dense(d)
        self.final_line_proj = nn.Dense(d)
        self.bin_score = self.param("bin_score", nn.initializers.ones, ())
        self.line_bin_score = self.param("line_bin_score", nn.initializers.ones, ())

    def _encode_lines(self, lines, line_scores, size, mask_lines):
        """EndPtEncoder (reference :495-515): per endpoint, (pos, +-offset,
        score) -> D."""
        b, L = lines.shape[:2]
        ln = normalize_keypoints_07(lines.reshape(b, -1, 2), size).reshape(b, L, 2, 2)
        offset = ln[:, :, 1] - ln[:, :, 0]  # (B, L, 2)
        offs = jnp.stack([offset, -offset], axis=2)  # (B, L, 2, 2)
        if self.conf.compat_tiled_line_scores:
            # upstream layout: tiled scores vs interleaved endpoints
            sc = jnp.tile(line_scores, (1, 2)).reshape(b, L, 2, 1)
        else:
            sc = jnp.broadcast_to(line_scores[..., None, None], (b, L, 2, 1))
        feats = jnp.concatenate([ln, offs, sc], axis=-1).reshape(b, 2 * L, 5)
        return self.lenc(feats)

    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        b, m = kpts0.shape[:2]
        n = kpts1.shape[1]
        mask0 = data.get("keypoint_mask0", jnp.ones((b, m), bool))
        mask1 = data.get("keypoint_mask1", jnp.ones((b, n), bool))
        lmask0 = data.get("line_mask0", jnp.ones(data["lines0"].shape[:2], bool))
        lmask1 = data.get("line_mask1", jnp.ones(data["lines1"].shape[:2], bool))
        size0 = data.get("view0", {}).get("image_size")
        size1 = data.get("view1", {}).get("image_size")

        desc0, desc1 = data["descriptors0"], data["descriptors1"]
        if conf.input_dim != conf.descriptor_dim:
            desc0 = self.input_proj(desc0)
            desc1 = self.input_proj(desc1)

        kn0 = normalize_keypoints_07(kpts0, size0, mask0)
        kn1 = normalize_keypoints_07(kpts1, size1, mask1)
        desc0 = desc0 + self.kenc(
            jnp.concatenate([kn0, data["keypoint_scores0"][..., None]], -1)
        )
        desc1 = desc1 + self.kenc(
            jnp.concatenate([kn1, data["keypoint_scores1"][..., None]], -1)
        )

        line_enc0 = self._encode_lines(data["lines0"], data["line_scores0"], size0, lmask0)
        line_enc1 = self._encode_lines(data["lines1"], data["line_scores1"], size1, lmask1)
        lj0 = data["lines_junc_idx0"].reshape(b, -1)  # (B, 2L)
        lj1 = data["lines_junc_idx1"].reshape(b, -1)
        ep_mask0 = jnp.repeat(lmask0, 2, axis=-1)
        ep_mask1 = jnp.repeat(lmask1, 2, axis=-1)

        for i in range(conf.n_gnn_layers):
            desc0 = desc0 + self.gnn_self[i](desc0, desc0, mask0, mask0)
            desc1 = desc1 + self.gnn_self[i](desc1, desc1, mask1, mask1)
            for _ in range(conf.num_line_iterations):
                desc0 = self.line_layers[i](desc0, line_enc0, lj0, ep_mask0)
                desc1 = self.line_layers[i](desc1, line_enc1, lj1, ep_mask1)
            new0 = desc0 + self.gnn_cross[i](desc0, desc1, mask0, mask1)
            desc1 = desc1 + self.gnn_cross[i](desc1, desc0, mask1, mask0)
            desc0 = new0

        mdesc0 = self.final_proj(desc0)
        mdesc1 = self.final_proj(desc1)
        kp_scores = jnp.einsum(
            "bmd,bnd->bmn", mdesc0, mdesc1, preferred_element_type=jnp.float32
        ) / conf.descriptor_dim**0.5
        kp_scores = log_double_softmax(kp_scores, self.bin_score, mask0, mask1)
        m0, m1, ms0, ms1 = self._get_matches(kp_scores)

        pred = {
            "log_assignment": kp_scores,
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": ms0,
            "matching_scores1": ms1,
        }

        # line matching from junction descriptors (reference :329-369)
        mldesc0 = self.final_line_proj(desc0)
        mldesc1 = self.final_line_proj(desc1)
        jsim = jnp.einsum(
            "bmd,bnd->bmn", mldesc0, mldesc1, preferred_element_type=jnp.float32
        ) / conf.descriptor_dim**0.5
        # gather endpoint-pair similarities
        L0 = lj0.shape[1] // 2
        L1 = lj1.shape[1] // 2
        sim_ep = jnp.take_along_axis(jsim, lj1[:, None, :].repeat(jsim.shape[1], 1), axis=2)
        sim_ep = jnp.take_along_axis(sim_ep, lj0[:, :, None].repeat(sim_ep.shape[2], 2), axis=1)
        sim_ep = sim_ep.reshape(b, L0, 2, L1, 2)
        raw_line_scores = 0.5 * jnp.maximum(
            sim_ep[:, :, 0, :, 0] + sim_ep[:, :, 1, :, 1],
            sim_ep[:, :, 0, :, 1] + sim_ep[:, :, 1, :, 0],
        )
        line_scores = log_double_softmax(
            raw_line_scores, self.line_bin_score, lmask0, lmask1
        )
        lm0, lm1, lms0, lms1 = self._get_matches(line_scores)
        pred.update(
            {
                "line_log_assignment": line_scores,
                "line_matches0": lm0,
                "line_matches1": lm1,
                "line_matching_scores0": lms0,
                "line_matching_scores1": lms1,
                "raw_line_scores": raw_line_scores,
            }
        )
        return pred

    def _get_matches(self, scores):
        from ...ops.assignment import filter_matches

        return filter_matches(scores, self.conf.filter_threshold)

    def _sub_loss(self, pred, data, bin_score, prefix=""):
        """Point or line NLL (reference sub_loss :371-408)."""
        positive = data[f"gt_{prefix}assignment"].astype(jnp.float32)
        num_pos = jnp.maximum(positive.sum((1, 2)), 1.0)
        neg0 = (data[f"gt_{prefix}matches0"] == -1).astype(jnp.float32)
        neg1 = (data[f"gt_{prefix}matches1"] == -1).astype(jnp.float32)
        num_neg = jnp.maximum(neg0.sum(1) + neg1.sum(1), 1.0)
        la = pred[f"{prefix}log_assignment"]
        nll_pos = -(la[:, :-1, :-1] * positive).sum((1, 2)) / num_pos
        nll_neg = -(
            (la[:, :-1, -1] * neg0).sum(1) + (la[:, -1, :-1] * neg1).sum(1)
        ) / num_neg
        nll = (
            self.conf.loss.nll_balancing * nll_pos
            + (1 - self.conf.loss.nll_balancing) * nll_neg
        )
        return {
            f"{prefix}assignment_nll": nll,
            f"{prefix}num_matchable": num_pos,
            f"{prefix}num_unmatchable": num_neg,
        }, nll

    def loss(self, pred, data):
        losses = {}
        total = 0.0
        point_losses, nll = self._sub_loss(pred, data, self.bin_score, "")
        losses.update(point_losses)
        total = total + nll * self.conf.loss.nll_weight
        if "gt_line_assignment" in data:
            line_losses, lnll = self._sub_loss(pred, data, self.line_bin_score, "line_")
            losses.update(line_losses)
            total = total + lnll * self.conf.loss.nll_weight
        losses["total"] = total
        metrics = {}
        if not self.conf.is_training:
            metrics = matcher_metrics(pred, data)
            if "gt_line_matches0" in data:
                metrics.update(matcher_metrics(pred, data, prefix="line_"))
        return losses, metrics


def pretrained_variables(conf_weights: str) -> dict:
    """Converted-official-weights tree for `GlueStick.apply` (use conf
    ln=False, compat_tiled_line_scores=True with these)."""
    from .lightglue_pretrained import load_npz_params

    return load_npz_params(conf_weights)


__main_model__ = GlueStick
