"""SuperGlue matcher, TPU-native.

Re-design of reference gluefactory_nonfree/superglue.py (342 LoC): keypoint
encoder MLP (position+score -> descriptor space), attentional GNN with
alternating self/cross message passing, and a Sinkhorn optimal-transport
assignment with a learned dustbin score (log_optimal_transport,
superglue.py:173-201).

TPU adaptations: masked attention via the shared fused ops; Sinkhorn runs a
fixed number of log-space iterations inside jit (lax.scan); padding masks
exclude invalid keypoints from the transport marginals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import masked_attention
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics

_NEG_INF = -1e9


def normalize_keypoints_superglue(kpts, size, mask=None):
    """SuperGlue's own normalization (reference superglue.py:76-86):
    shift by size/2, scale by max(size)*0.7 — NOT LightGlue's max/2."""
    if size is None:
        big = jnp.where(mask[..., None], kpts, -jnp.inf) if mask is not None else kpts
        small = jnp.where(mask[..., None], kpts, jnp.inf) if mask is not None else kpts
        size = 1.0 + jnp.max(big, axis=-2) - jnp.min(small, axis=-2)
    size = size.astype(kpts.dtype)
    shift = size / 2
    scale = jnp.max(size, axis=-1) * 0.7
    return (kpts - shift[..., None, :]) / scale[..., None, None]


def log_sinkhorn_iterations(Z, log_mu, log_nu, iters: int):
    """Log-space Sinkhorn (reference superglue.py:173-178)."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    (u, v), _ = jax.lax.scan(
        body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)), None, length=iters
    )
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores, alpha, iters: int, mask0=None, mask1=None):
    """Differentiable OT with dustbins (reference superglue.py:181-201),
    masked: padded keypoints get zero marginal mass."""
    b, m, n = scores.shape
    one0 = jnp.ones((b, m)) if mask0 is None else mask0.astype(jnp.float32)
    one1 = jnp.ones((b, n)) if mask1 is None else mask1.astype(jnp.float32)
    ms = one0.sum(-1)  # valid counts per batch
    ns = one1.sum(-1)

    bins0 = jnp.broadcast_to(alpha, (b, m, 1))
    bins1 = jnp.broadcast_to(alpha, (b, 1, n))
    alpha_c = jnp.broadcast_to(alpha, (b, 1, 1))
    if mask0 is not None:
        pair = mask0[:, :, None] & mask1[:, None, :]
        scores = jnp.where(pair, scores, _NEG_INF)
        bins0 = jnp.where(mask0[:, :, None], bins0, _NEG_INF)
        bins1 = jnp.where(mask1[:, None, :], bins1, _NEG_INF)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], -1),
            jnp.concatenate([bins1, alpha_c], -1),
        ],
        1,
    )

    norm = -jnp.log(ms + ns)  # (b,)
    log_mu_valid = jnp.where(one0 > 0, norm[:, None], _NEG_INF)
    log_nu_valid = jnp.where(one1 > 0, norm[:, None], _NEG_INF)
    log_mu = jnp.concatenate([log_mu_valid, jnp.log(ns)[:, None] + norm[:, None]], 1)
    log_nu = jnp.concatenate([log_nu_valid, jnp.log(ms)[:, None] + norm[:, None]], 1)

    Z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    return Z - norm[:, None, None]


class _MLP(nn.Module):
    layers: tuple
    use_ln: bool = True

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.layers):
            x = nn.Dense(c)(x)
            if i < len(self.layers) - 1:
                if self.use_ln:
                    x = nn.LayerNorm()(x)
                x = nn.relu(x)
        return x


class SuperGlue(BaseModel):
    default_conf = {
        "name": "superglue",
        "input_dim": 256,
        "descriptor_dim": 256,
        "weights": None,
        "keypoint_encoder": [32, 64, 128, 256],
        "GNN_layers": 9,  # pairs of (self, cross)
        "num_heads": 4,
        "sinkhorn_iterations": 50,
        "filter_threshold": 0.2,
        # LayerNorm in the MLPs (TPU-friendly training default). Set False
        # for converted official weights: the reference uses BatchNorm
        # (superglue.py:70), which convert_weights folds into the convs.
        "ln": True,
        "is_training": False,
        "loss": {"nll_balancing": 0.5},
    }
    required_data_keys = ["keypoints0", "keypoints1", "descriptors0", "descriptors1"]

    def setup(self):
        d = self.conf.descriptor_dim
        self.kenc = _MLP(tuple(self.conf.keypoint_encoder) + (d,), use_ln=self.conf.ln)
        layers = []
        for i in range(self.conf.GNN_layers):
            layers.append(_GNNLayer(d, self.conf.num_heads, self.conf.ln, name=f"self_{i}"))
            layers.append(_GNNLayer(d, self.conf.num_heads, self.conf.ln, name=f"cross_{i}"))
        self.gnn_layers = layers
        self.final_proj = nn.Dense(d)
        self.bin_score = self.param("bin_score", nn.initializers.ones, ())

    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        size0 = data.get("view0", {}).get("image_size")
        size1 = data.get("view1", {}).get("image_size")

        kn0 = normalize_keypoints_superglue(kpts0, size0, mask0)
        kn1 = normalize_keypoints_superglue(kpts1, size1, mask1)
        sc0 = data.get("keypoint_scores0", jnp.ones(kpts0.shape[:-1]))
        sc1 = data.get("keypoint_scores1", jnp.ones(kpts1.shape[:-1]))

        desc0 = data["descriptors0"] + self.kenc(
            jnp.concatenate([kn0, sc0[..., None]], -1)
        )
        desc1 = data["descriptors1"] + self.kenc(
            jnp.concatenate([kn1, sc1[..., None]], -1)
        )

        for i, layer in enumerate(self.gnn_layers):
            if i % 2 == 0:  # self
                desc0 = layer(desc0, desc0, mask0, mask0)
                desc1 = layer(desc1, desc1, mask1, mask1)
            else:  # cross
                new0 = layer(desc0, desc1, mask0, mask1)
                desc1 = layer(desc1, desc0, mask1, mask0)
                desc0 = new0

        mdesc0 = self.final_proj(desc0)
        mdesc1 = self.final_proj(desc1)
        scores = jnp.einsum(
            "bmd,bnd->bmn", mdesc0, mdesc1, preferred_element_type=jnp.float32
        ) / conf.descriptor_dim**0.5
        log_assignment = log_optimal_transport(
            scores, self.bin_score, conf.sinkhorn_iterations, mask0, mask1
        )

        from ...ops.assignment import filter_matches

        m0, m1, ms0, ms1 = filter_matches(log_assignment, conf.filter_threshold)
        return {
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": ms0,
            "matching_scores1": ms1,
            "log_assignment": log_assignment,
        }

    def loss(self, pred, data):
        losses_nll, _, metrics_nll = nll_loss(
            pred, data, nll_balancing=self.conf.loss.nll_balancing
        )
        losses = {"total": losses_nll, **metrics_nll}
        metrics = {} if self.conf.is_training else matcher_metrics(pred, data)
        return losses, metrics


class _GNNLayer(nn.Module):
    """One attentional message-passing step (reference AttentionalPropagation)."""

    dim: int
    num_heads: int
    use_ln: bool = True

    @nn.compact
    def __call__(self, x, source, mask_x, mask_s):
        h = self.num_heads
        dh = self.dim // h

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.dim)(x))
        k = heads(nn.Dense(self.dim)(source))
        v = heads(nn.Dense(self.dim)(source))
        impl = "xla"  # pallas kernel lacks a VJP; XLA fuses fine here
        msg = masked_attention(q, k, v, mask_x, mask_s, impl=impl)
        b, _, n, _ = msg.shape
        msg = msg.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        msg = nn.Dense(self.dim)(msg)
        update = _MLP((2 * self.dim, self.dim), use_ln=self.use_ln)(
            jnp.concatenate([x, msg], -1)
        )
        return x + update


__main_model__ = SuperGlue
