"""LightGlue matcher, TPU-native.

Re-design of the reference matcher (gluefactory/models/matchers/lightglue.py,
666 LoC) for JAX/XLA:

  - All per-layer parameters are STACKED along a leading layer axis. One
    parameter layout serves three execution modes with zero duplication:
      * training: `lax.scan` over layers (optionally rematerialized per layer,
        the counterpart of torch checkpointing, reference :515-518),
      * inference: the same scan,
      * adaptive-depth inference: `lax.while_loop` with dynamically sliced
        layer parameters — a true early exit (reference :527-531) that keeps
        static shapes.
  - Adaptive WIDTH pruning (reference :532-547 index_select, which changes
    shapes) becomes mask-based: pruned tokens are masked out of attention,
    assignment and outputs; shapes never change. `prune0/prune1` report the
    layer at which each point was pruned, like the reference.
  - The reference's missing `confidence_thresholds` buffer (a fork bug — they
    are referenced at :592,604 but never registered) is fixed by computing the
    published schedule 0.8 + 0.1*exp(-4 l / L) (reference :581-584) as a
    static numpy constant.
  - Bidirectional cross-attention computes both directions from ONE similarity
    matrix (the reference materializes `sim` and its transposed softmax
    separately, :236-242).
  - Padding discipline: `keypoint_mask0/1` (True = valid) flow through
    normalization, attention, assignment and loss.

Inputs (data dict): keypoints0/1 (B,M|N,2), descriptors0/1 (B,*,input_dim),
optional keypoint_mask0/1, view0/view1.image_size (B,2), scales/oris when
add_scale_ori. Outputs mirror the reference: matches0/1, matching_scores0/1,
log_assignment, ref_descriptors0/1 (stacked per layer), prune0/1.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.assignment import filter_matches, sigmoid_log_double_softmax
from ...ops.attention import (
    apply_rotary,
    cross_attention_bidirectional_packed,
    cross_attention_bidirectional_stacked,
    self_attention_packed,
)
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics


def normalize_keypoints(
    kpts: jnp.ndarray,
    size: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Center/scale keypoints into ~[-1, 1] (reference lightglue.py:22-33).

    Without an image size, the span of VALID keypoints defines the frame
    (the reference ignores padding here; we mask it out).
    """
    if size is None:
        big = jnp.where(mask[..., None], kpts, -jnp.inf) if mask is not None else kpts
        small = jnp.where(mask[..., None], kpts, jnp.inf) if mask is not None else kpts
        size = 1.0 + jnp.max(big, axis=-2) - jnp.min(small, axis=-2)
    size = size.astype(kpts.dtype)
    shift = size / 2
    scale = jnp.max(size, axis=-1) / 2
    return (kpts - shift[..., None, :]) / scale[..., None, None]


def _dense(x, w, b=None):
    y = jnp.einsum("...d,de->...e", x, w)
    return y if b is None else y + b


def _layer_norm(x, scale, bias, eps: float = 1e-5):
    # stats in fp32 even on the bf16 (mp) path, result back in x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


class LightGlue(BaseModel):
    """See module docstring. Conf mirrors reference lightglue.py:341-361."""

    default_conf = {
        "name": "lightglue",
        "input_dim": 256,
        "add_scale_ori": False,
        "descriptor_dim": 256,
        "n_layers": 9,
        "num_heads": 4,
        "flash": True,  # use the fused attention path (Pallas on TPU)
        "mp": False,  # bf16 compute inside attention
        "depth_confidence": -1.0,  # early stopping, disable with -1
        "width_confidence": -1.0,  # point pruning, disable with -1
        # static compact-prefix capacity for width pruning, as a fraction of
        # the keypoint count (or an absolute int). Once EVERY batch element's
        # active set fits the capacity, survivors are gathered into (B, C)
        # buffers and the remaining layers run there — a REAL FLOP reduction
        # (attention/FFN cost drops ~ (C/N)^2 / C/N) with static shapes,
        # unlike the reference's shape-changing index_select
        # (lightglue.py:532-547). Exact: compaction only engages when all
        # active tokens fit, so no token is ever dropped. <= 0 disables
        # (mask-only pruning).
        "width_capacity": 0.5,
        "filter_threshold": 0.0,
        "checkpointed": False,  # remat each layer
        # whole-block Pallas megakernels (ops/pallas_lightglue_block.py):
        # one fused program per self block and per cross block — projections,
        # rotary, attention, out-proj, LayerNorm, GELU and the residual all
        # stay in VMEM, so per layer only the descriptors cross HBM.
        # "auto" = on for Pallas inference on the stacked full-depth path
        # (m == n, N % 128 == 0, N <= 1024); True forces it (interpret mode
        # off-TPU, used by tests); False disables.
        "fused_layer": "auto",
        # collect per-layer descriptors (needed by the deep-supervision loss
        # and the reference output contract). False skips the scan stacking at
        # inference: ref_descriptors* then carry ONLY the exit layer (L=1),
        # like the adaptive path.
        "collect_layers": True,
        "posenc": "conditional_fourier",  # "fourier" (upstream) | "conditional_fourier" (fork :50-77)
        "weights": None,  # path to a converted .npz of official weights
        "is_training": False,
        "loss": {
            "gamma": 1.0,
            "fn": "nll",
            "nll_balancing": 0.5,
        },
    }

    required_data_keys = ["keypoints0", "keypoints1", "descriptors0", "descriptors1"]

    def setup(self):
        conf = self.conf
        d = conf.descriptor_dim
        n = conf.n_layers
        self.head_dim = d // conf.num_heads

        def dense_stack(name, din, dout, layers=n, bias=True):
            w = self.param(name + "_w", nn.initializers.lecun_normal(), (layers, din, dout))
            b = self.param(name + "_b", nn.initializers.zeros, (layers, dout)) if bias else None
            return (w, b)

        if conf.input_dim != d:
            self.input_proj_w = self.param(
                "input_proj_w", nn.initializers.lecun_normal(), (conf.input_dim, d)
            )
            self.input_proj_b = self.param("input_proj_b", nn.initializers.zeros, (d,))

        # positional encoding (reference :80-93 / fork conditional :50-77)
        M = 2 + 2 * int(conf.add_scale_ori)
        F_half = self.head_dim // 2
        gamma = 1.0
        self.posenc_Wr = self.param(
            "posenc_Wr", nn.initializers.normal(stddev=gamma**-2), (M, F_half)
        )
        if conf.posenc == "conditional_fourier":
            self.posenc_cond_w = self.param(
                "posenc_cond_w", nn.initializers.lecun_normal(), (1, F_half)
            )
            self.posenc_cond_b = self.param(
                "posenc_cond_b", nn.initializers.zeros, (F_half,)
            )

        # transformer layers, stacked (reference SelfBlock :159-191 / CrossBlock :194-249)
        self.self_Wqkv = dense_stack("self_Wqkv", d, 3 * d)
        self.self_out = dense_stack("self_out", d, d)
        self.self_ffn1 = dense_stack("self_ffn1", 2 * d, 2 * d)
        self.self_ln = (
            self.param("self_ln_scale", nn.initializers.ones, (n, 2 * d)),
            self.param("self_ln_bias", nn.initializers.zeros, (n, 2 * d)),
        )
        self.self_ffn2 = dense_stack("self_ffn2", 2 * d, d)

        self.cross_qk = dense_stack("cross_qk", d, d)
        self.cross_v = dense_stack("cross_v", d, d)
        self.cross_out = dense_stack("cross_out", d, d)
        self.cross_ffn1 = dense_stack("cross_ffn1", 2 * d, 2 * d)
        self.cross_ln = (
            self.param("cross_ln_scale", nn.initializers.ones, (n, 2 * d)),
            self.param("cross_ln_bias", nn.initializers.zeros, (n, 2 * d)),
        )
        self.cross_ffn2 = dense_stack("cross_ffn2", 2 * d, d)

        # per-layer assignment heads (reference MatchAssignment :299-318)
        self.assign_proj = dense_stack("assign_proj", d, d)
        self.assign_match = dense_stack("assign_match", d, 1)

        # per-layer token confidence heads, n-1 of them (reference :96-107)
        self.conf_head = dense_stack("conf_head", d, 1, layers=max(n - 1, 1))

        # fixed confidence schedule (reference :581-584; fork forgot to register)
        self.confidence_thresholds = np.clip(
            0.8 + 0.1 * np.exp(-4.0 * np.arange(n) / n), 0.0, 1.0
        ).astype(np.float32)

    # ------------------------------------------------------------------ utils
    def _attn_impl(self) -> str:
        """Pallas fused attention on TPU (forward + custom-VJP backward
        kernels, ops/pallas_attention.py); XLA elsewhere."""
        conf = self.conf
        use_pallas = conf.flash and jax.default_backend() == "tpu"
        return "pallas" if use_pallas else "xla"

    def _slice(self, stack, i, dtype=None):
        """Index the layer axis of a (w, b) stack with a static or traced i.

        `dtype` casts the slice (bf16 on the mp path: mixed-dtype einsums
        would otherwise silently promote activations back to fp32)."""
        w, b = stack
        take = lambda p: jax.lax.dynamic_index_in_dim(p, i, axis=0, keepdims=False)
        w = take(w)
        b = None if b is None else take(b)
        if dtype is not None:
            w = w.astype(dtype)
            b = None if b is None else b.astype(dtype)
        return w, b

    def _posenc(self, kpts: jnp.ndarray, num_valid: jnp.ndarray) -> jnp.ndarray:
        """Rotary frequency tensor (2, B, N, descriptor_dim), packed layout.

        The encoding is identical for every head, so it is tiled along the
        channel axis: rotary then applies directly to the packed (B, N, H*Dh)
        q/k without any head transpose (rotate_half's pair swap is local to
        adjacent channels, so it commutes with the head packing)."""
        projected = jnp.einsum("...nm,mf->...nf", kpts, self.posenc_Wr)
        if self.conf.posenc == "conditional_fourier":
            cond = jax.nn.relu(num_valid.astype(projected.dtype))[..., None]  # (B,1)
            modulation = _dense(cond, self.posenc_cond_w, self.posenc_cond_b)  # (B,F/2)
            projected = projected + modulation[:, None, :]
        emb = jnp.stack([jnp.cos(projected), jnp.sin(projected)], axis=0)
        emb = jnp.repeat(emb, 2, axis=-1)  # pair-interleave to head_dim
        return jnp.tile(emb, (1, 1, 1, self.conf.num_heads))  # (2, B, N, D)

    # ----------------------------------------------------------- layer blocks
    def _self_block(self, i, x, encoding, mask):
        conf = self.conf
        w, b = self._slice(self.self_Wqkv, i, x.dtype)
        qkv = _dense(x, w, b)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # packed (B, N, D), heads on channels
        enc = encoding.astype(x.dtype)
        q = apply_rotary(q, enc)
        k = apply_rotary(k, enc)
        context = self_attention_packed(
            q, k, v, mask, num_heads=conf.num_heads, impl=self._attn_impl()
        )
        w, b = self._slice(self.self_out, i, x.dtype)
        message = _dense(context.astype(x.dtype), w, b)
        return x + self._ffn(x, message, i, self.self_ffn1, self.self_ln, self.self_ffn2)

    def _ffn(self, x, message, i, ffn1, ln, ffn2):
        w1, b1 = self._slice(ffn1, i, x.dtype)
        w2, b2 = self._slice(ffn2, i, x.dtype)
        scale = jax.lax.dynamic_index_in_dim(ln[0], i, 0, keepdims=False)
        bias = jax.lax.dynamic_index_in_dim(ln[1], i, 0, keepdims=False)
        # concat([x, message]) @ W1 as two half-K matmuls: the (B, N, 2D)
        # concat never materializes (saves an HBM round trip per FFN)
        d = x.shape[-1]
        y = _dense(x, w1[:d], b1) + _dense(message, w1[d:])
        y = jax.nn.gelu(_layer_norm(y, scale, bias), approximate=False)
        return _dense(y, w2, b2)

    def _cross_block(self, i, x0, x1, mask0, mask1):
        conf = self.conf
        wqk, bqk = self._slice(self.cross_qk, i, x0.dtype)
        wv, bv = self._slice(self.cross_v, i, x0.dtype)
        qk0 = _dense(x0, wqk, bqk)  # packed (B, N, D), heads on channels
        qk1 = _dense(x1, wqk, bqk)
        v0 = _dense(x0, wv, bv)
        v1 = _dense(x1, wv, bv)
        m0, m1 = cross_attention_bidirectional_packed(
            qk0, qk1, v0, v1, mask0, mask1,
            num_heads=conf.num_heads, impl=self._attn_impl(),
        )
        wo, bo = self._slice(self.cross_out, i, x0.dtype)
        m0 = _dense(m0.astype(x0.dtype), wo, bo)
        m1 = _dense(m1.astype(x0.dtype), wo, bo)
        x0 = x0 + self._ffn(x0, m0, i, self.cross_ffn1, self.cross_ln, self.cross_ffn2)
        x1 = x1 + self._ffn(x1, m1, i, self.cross_ffn1, self.cross_ln, self.cross_ffn2)
        return x0, x1

    def _layer(self, i, desc0, desc1, enc0, enc1, mask0, mask1):
        desc0 = self._self_block(i, desc0, enc0, mask0)
        desc1 = self._self_block(i, desc1, enc1, mask1)
        return self._cross_block(i, desc0, desc1, mask0, mask1)

    def _layer_stacked(self, i, desc, enc, mask):
        """One layer over BOTH sets stacked on the batch axis (2B, N, D):
        one self and one cross kernel call per layer, half the XLA ops.
        (An earlier concat-per-layer variant measured slower; stacking once
        for the whole stack amortizes the concat/split to two ops total.)"""
        desc = self._self_block(i, desc, enc, mask)
        wqk, bqk = self._slice(self.cross_qk, i, desc.dtype)
        wv, bv = self._slice(self.cross_v, i, desc.dtype)
        qk = _dense(desc, wqk, bqk)
        v = _dense(desc, wv, bv)
        m0, m1 = cross_attention_bidirectional_stacked(
            qk, v, mask, num_heads=self.conf.num_heads, impl=self._attn_impl()
        )
        m = jnp.concatenate([m0, m1], axis=0)
        wo, bo = self._slice(self.cross_out, i, desc.dtype)
        m = _dense(m.astype(desc.dtype), wo, bo)
        return desc + self._ffn(desc, m, i, self.cross_ffn1, self.cross_ln, self.cross_ffn2)

    # ------------------------------------------------------------- assignment
    def _assignment(self, i, desc0, desc1, mask0, mask1):
        """Log assignment scores at layer i (reference MatchAssignment :306-315)."""
        d = self.conf.descriptor_dim
        w, b = self._slice(self.assign_proj, i)
        mdesc0 = _dense(desc0, w, b) / d**0.25
        mdesc1 = _dense(desc1, w, b) / d**0.25
        sim = jnp.einsum(
            "bmd,bnd->bmn", mdesc0, mdesc1, preferred_element_type=jnp.float32
        )
        wm, bm = self._slice(self.assign_match, i)
        z0 = _dense(desc0, wm, bm)
        z1 = _dense(desc1, wm, bm)
        return sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1), sim

    def _matchability(self, i, desc):
        wm, bm = self._slice(self.assign_match, i)
        return jax.nn.sigmoid(_dense(desc, wm, bm)[..., 0])

    def _confidence(self, i, desc0, desc1):
        """Token confidences at layer i < n-1 (reference TokenConfidence :102-107)."""
        w, b = self._slice(self.conf_head, i)
        c0 = jax.nn.sigmoid(_dense(jax.lax.stop_gradient(desc0), w, b)[..., 0])
        c1 = jax.nn.sigmoid(_dense(jax.lax.stop_gradient(desc1), w, b)[..., 0])
        return c0, c1

    # ----------------------------------------------------------------- forward
    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        conf = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        b, m, _ = kpts0.shape
        n = kpts1.shape[1]
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")

        size0 = size1 = None
        if "view0" in data:
            size0 = data["view0"].get("image_size")
        if "view1" in data:
            size1 = data["view1"].get("image_size")
        kn0 = normalize_keypoints(kpts0, size0, mask0)
        kn1 = normalize_keypoints(kpts1, size1, mask1)

        if conf.add_scale_ori:
            sc0, o0 = data["scales0"], data["oris0"]
            sc1, o1 = data["scales1"], data["oris1"]
            expand = lambda t: t if t.ndim == 3 else t[..., None]
            kn0 = jnp.concatenate([kn0, expand(sc0), expand(o0)], axis=-1)
            kn1 = jnp.concatenate([kn1, expand(sc1), expand(o1)], axis=-1)

        desc0 = data["descriptors0"]
        desc1 = data["descriptors1"]
        if conf.input_dim != conf.descriptor_dim:
            desc0 = _dense(desc0, self.input_proj_w, self.input_proj_b)
            desc1 = _dense(desc1, self.input_proj_w, self.input_proj_b)
        if conf.mp:
            # bf16 through the transformer stack (reference half-cast
            # attention, lightglue.py:143,483-485); softmax/layernorm/
            # assignment statistics stay fp32.
            desc0 = desc0.astype(jnp.bfloat16)
            desc1 = desc1.astype(jnp.bfloat16)

        # conditional PE uses the (static) keypoint count like the fork
        # (lightglue.py:490-494 passes kpts.shape[1]); padded sets therefore
        # share one condition value, which is what official fork training saw.
        nk0 = jnp.full((b,), m, jnp.float32)
        nk1 = jnp.full((b,), n, jnp.float32)
        enc0 = self._posenc(kn0, nk0)
        enc1 = self._posenc(kn1, nk1)

        is_training = conf.is_training
        do_early_stop = conf.depth_confidence > 0 and not is_training
        do_point_pruning = conf.width_confidence > 0 and not is_training

        ones0 = jnp.ones((b, m), bool) if mask0 is None else mask0
        ones1 = jnp.ones((b, n), bool) if mask1 is None else mask1

        if not (do_early_stop or do_point_pruning):
            desc0, desc1, all_desc0, all_desc1 = self._run_layers_scan(
                desc0, desc1, enc0, enc1, mask0, mask1
            )
            i_exit = conf.n_layers - 1
            prune0 = jnp.full((b, m), conf.n_layers, jnp.float32)
            prune1 = jnp.full((b, n), conf.n_layers, jnp.float32)
            act0, act1 = ones0, ones1
        else:
            (desc0, desc1, i_exit, act0, act1, prune0, prune1) = self._run_layers_adaptive(
                desc0, desc1, enc0, enc1, ones0, ones1
            )
            all_desc0 = desc0[None]
            all_desc1 = desc1[None]

        # final assignment at the exit layer over ACTIVE tokens
        am0 = act0 if (mask0 is not None or do_point_pruning) else None
        am1 = act1 if (mask1 is not None or do_point_pruning) else None
        if self._attn_impl() == "pallas" and not is_training:
            # fused Pallas assignment: sim + double-softmax + bins + filter
            # stats in one pass; the (M+1)x(N+1) matrix is written once and
            # never re-read (ops/pallas_assignment.py). Forward-only: the
            # loss recomputes assignments through the XLA path.
            from ...ops.pallas_assignment import (
                filter_matches_from_stats,
                fused_log_assignment,
            )

            dd = conf.descriptor_dim
            w, bproj = self._slice(self.assign_proj, i_exit)
            mdesc0 = (_dense(desc0, w, bproj) / dd**0.25).astype(jnp.float32)
            mdesc1 = (_dense(desc1, w, bproj) / dd**0.25).astype(jnp.float32)
            wm, bm = self._slice(self.assign_match, i_exit)
            z0 = _dense(desc0, wm, bm)[..., 0].astype(jnp.float32)
            z1 = _dense(desc1, wm, bm)[..., 0].astype(jnp.float32)
            scores, rowmax, rowarg, colmax, colarg = fused_log_assignment(
                mdesc0, mdesc1, z0, z1, am0, am1
            )
            m0, m1, mscores0, mscores1 = filter_matches_from_stats(
                rowmax, rowarg, colmax, colarg, conf.filter_threshold
            )
        else:
            scores, _ = self._assignment(i_exit, desc0, desc1, am0, am1)
            m0, m1, mscores0, mscores1 = filter_matches(scores, conf.filter_threshold)

        return {
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": mscores0,
            "matching_scores1": mscores1,
            "ref_descriptors0": jnp.swapaxes(all_desc0, 0, 1),  # (B, L, M, D)
            "ref_descriptors1": jnp.swapaxes(all_desc1, 0, 1),
            "log_assignment": scores,
            "prune0": prune0,
            "prune1": prune1,
            "stop_layer": jnp.asarray(i_exit, jnp.int32),
        }

    def _run_layers_scan(self, desc0, desc1, enc0, enc1, mask0, mask1):
        """Full-depth pass: lax.scan over the stacked layer axis, collecting
        per-layer descriptors for deep supervision (reference loop :514-524).

        When both sets have the same length (the padded-batch norm on TPU),
        they run STACKED on the batch axis for the whole stack."""
        n_layers = self.conf.n_layers
        b, m = desc0.shape[:2]
        n = desc1.shape[1]

        if m == n:
            desc = jnp.concatenate([desc0, desc1], axis=0)  # (2B, N, D)
            enc = jnp.concatenate([enc0, enc1], axis=1)
            if mask0 is None and mask1 is None:
                mask = None
            else:
                ones = lambda k: jnp.ones((b, k), bool)
                mask = jnp.concatenate(
                    [ones(m) if mask0 is None else mask0,
                     ones(n) if mask1 is None else mask1], axis=0)

            collect = self.conf.collect_layers or self.conf.is_training

            fused = self.conf.fused_layer
            fused_on = fused is True or (
                fused == "auto" and self._attn_impl() == "pallas"
            )
            use_fused = (
                fused_on
                and not self.conf.is_training
                and m % 128 == 0
                and m <= 2048  # > 1024 runs the VMEM-lean v2 kernels
            )
            if use_fused:
                step = self._make_fused_step(enc, mask, desc.dtype, collect)
            else:
                def step(carry, i):
                    d = self._layer_stacked(i, carry, enc, mask)
                    return d, (d if collect else None)

            if self.conf.checkpointed:
                step = jax.checkpoint(step)
            desc, alls = jax.lax.scan(step, desc, jnp.arange(n_layers))
            if not collect:
                alls = desc[None]
            return desc[:b], desc[b:], alls[:, :b], alls[:, b:]

        collect = self.conf.collect_layers or self.conf.is_training

        def step(carry, i):
            d0, d1 = carry
            d0, d1 = self._layer(i, d0, d1, enc0, enc1, mask0, mask1)
            return (d0, d1), ((d0, d1) if collect else (None, None))

        if self.conf.checkpointed:
            step = jax.checkpoint(step)
        (desc0, desc1), (all0, all1) = jax.lax.scan(
            step, (desc0, desc1), jnp.arange(n_layers)
        )
        if not collect:
            all0, all1 = desc0[None], desc1[None]
        return desc0, desc1, all0, all1

    def _make_fused_body(self, enc, dtype, masked=True):
        """Build `layer(desc, maski, i) -> desc` over the whole-block Pallas
        megakernels: one fused program per self block (grid over the 2B
        stacked sets) and per cross block (grid over B pairs). `maski` is an
        (2B, N) int32 validity/active mask — DATA, so the adaptive loop can
        feed its evolving active sets through the same kernels.
        Inference-only; see ops/pallas_lightglue_block.py."""
        from ...ops.pallas_lightglue_block import (
            fused_cross_block,
            fused_self_block,
            rotary_tables,
        )

        interp = jax.default_backend() != "tpu"
        nh = self.conf.num_heads
        n = enc.shape[2]
        use_v2 = n > 1024
        if use_v2:
            # VMEM-lean large-N kernels: compact per-head rotary tables (the
            # encoding is head-tiled, so one head's slice carries it all),
            # all-valid fast path only (gated by the caller)
            from ...ops.pallas_lightglue_block import (
                fused_cross_block_v2,
                fused_self_block_v2,
            )

            dh = self.conf.descriptor_dim // nh
            cos, sina, sinb = rotary_tables(enc[..., :dh], dtype)
        else:
            cos, sina, sinb = rotary_tables(enc, dtype)

        def layer(carry, maski, i):
            # `masked` is captured statically: the all-valid fast path skips
            # every validity-bias op inside the kernels
            dt = carry.dtype
            wqkv, bqkv = self._slice(self.self_Wqkv, i, dt)
            wso, bso = self._slice(self.self_out, i, dt)
            wsf1, bsf1 = self._slice(self.self_ffn1, i, dt)
            wsf2, bsf2 = self._slice(self.self_ffn2, i, dt)
            take = lambda p: jax.lax.dynamic_index_in_dim(p, i, 0, keepdims=False)
            slns = take(self.self_ln[0]).astype(dt)
            slnb = take(self.self_ln[1]).astype(dt)
            if use_v2:
                carry = fused_self_block_v2(
                    carry, cos, sina, sinb, maski,
                    wqkv, bqkv, wso, bso, wsf1, bsf1, slns, slnb, wsf2, bsf2,
                    num_heads=nh, block_q=128, interpret=interp, masked=masked,
                )
            else:
                carry = fused_self_block(
                    carry, cos, sina, sinb, maski,
                    wqkv, bqkv, wso, bso, wsf1, bsf1, slns, slnb, wsf2, bsf2,
                    num_heads=nh, interpret=interp, masked=masked,
                )
            wqk, bqk = self._slice(self.cross_qk, i, dt)
            wv, bv = self._slice(self.cross_v, i, dt)
            wco, bco = self._slice(self.cross_out, i, dt)
            wcf1, bcf1 = self._slice(self.cross_ffn1, i, dt)
            wcf2, bcf2 = self._slice(self.cross_ffn2, i, dt)
            clns = take(self.cross_ln[0]).astype(dt)
            clnb = take(self.cross_ln[1]).astype(dt)
            if use_v2:
                return fused_cross_block_v2(
                    carry, maski,
                    wqk, bqk, wv, bv, wco, bco, wcf1, bcf1, clns, clnb,
                    wcf2, bcf2, num_heads=nh, block_q=128, interpret=interp,
                    masked=masked,
                )
            return fused_cross_block(
                carry, maski,
                wqk, bqk, wv, bv, wco, bco, wcf1, bcf1, clns, clnb, wcf2, bcf2,
                num_heads=nh, interpret=interp, masked=masked,
            )

        return layer

    def _make_fused_step(self, enc, mask, dtype, collect):
        """Scan step over the fused layer (full-depth inference path)."""
        maski = (
            jnp.ones(enc.shape[1:3], jnp.int32)
            if mask is None
            else mask.astype(jnp.int32)
        )
        layer = self._make_fused_body(enc, dtype, masked=mask is not None)

        def step(carry, i):
            carry = layer(carry, maski, i)
            return carry, (carry if collect else None)

        return step

    def _resolve_capacity(self, n_pts: int) -> int:
        """Static compact width for a side with n_pts slots; 0 disables."""
        cap = self.conf.width_capacity
        if cap is None or cap <= 0 or self.conf.width_confidence <= 0:
            return 0
        c = int(cap) if cap > 1 else int(np.ceil(cap * n_pts))
        mult = 128 if n_pts >= 256 else 8  # kernel-friendly multiple
        c = int(min(n_pts, -(-c // mult) * mult))
        return 0 if c >= n_pts else c

    def _run_layers_adaptive(self, desc0, desc1, enc0, enc1, act0, act1):
        """Adaptive depth/width pass (inference): lax.while_loop with early
        exit on token confidence and point pruning.

        Width pruning runs in TWO phases. Phase 1 processes full-size (B, N)
        tensors while any batch element's active set exceeds the static
        capacity C (conf.width_capacity). Once everything fits, survivors are
        gathered into compact (B, C) buffers — descriptors, rotary encodings,
        masks — and phase 2 runs the remaining layers there: attention,
        projections and FFNs all shrink, a real FLOP cut with static shapes
        (the reference's shape-changing index_select, lightglue.py:532-547,
        is impossible under jit). Survivor descriptors scatter back into the
        full buffers afterwards; tokens pruned before compaction keep their
        stale descriptors, which the final masked assignment never reads."""
        conf = self.conf
        n_layers = conf.n_layers
        b, m = act0.shape
        n = act1.shape[1]
        thresholds = jnp.asarray(self.confidence_thresholds)
        prune0 = jnp.ones((b, m), jnp.float32)
        prune1 = jnp.ones((b, n), jnp.float32)
        c0_cap = self._resolve_capacity(m)
        c1_cap = self._resolve_capacity(n)
        use_compact = c0_cap > 0 and c1_cap > 0

        def make_body(enc0_, enc1_, idx0=None, idx1=None):
            """Loop body over (d0, d1) of any static width. idx0/idx1 map
            compact slots to original token ids for prune-count scatter.

            When both sides share one kernel-friendly width, the layer runs
            through the whole-block Pallas megakernels (the active masks are
            DATA to the fused kernels, so pruning still bites inside them)."""
            fused = self.conf.fused_layer
            mloc0 = enc0_.shape[2]
            nloc0 = enc1_.shape[2]
            use_fused = (
                (fused is True or (fused == "auto" and self._attn_impl() == "pallas"))
                and mloc0 == nloc0
                and mloc0 % 128 == 0
                and mloc0 <= 1024
            )
            if use_fused:
                enc_ = jnp.concatenate([enc0_, enc1_], axis=1)
                fused_layer = self._make_fused_body(enc_, desc0.dtype)

            def body_fn(state):
                i, d0, d1, done, a0, a1, p0, p1 = state
                mloc, nloc = a0.shape[1], a1.shape[1]
                if use_fused:
                    d = jnp.concatenate([d0, d1], axis=0)
                    a = jnp.concatenate([a0, a1], axis=0).astype(jnp.int32)
                    d = fused_layer(d, a, i)
                    d0, d1 = d[:b], d[b:]
                else:
                    d0, d1 = self._layer(i, d0, d1, enc0_, enc1_, a0, a1)
                is_last = i == n_layers - 1

                def check_stop():
                    c0, c1 = self._confidence(jnp.minimum(i, n_layers - 2), d0, d1)
                    th = thresholds[i]
                    confident = jnp.concatenate(
                        [jnp.where(a0, (c0 > th), True), jnp.where(a1, (c1 > th), True)],
                        axis=-1,
                    )
                    # inactive slots count as confident then subtract out, so
                    # the ratio is identical between full and compact views
                    num = jnp.concatenate([a0, a1], axis=-1).sum(-1).astype(jnp.float32)
                    ratio = confident.sum(-1).astype(jnp.float32) - (mloc + nloc - num)
                    ratio = ratio / jnp.maximum(num, 1.0)
                    return jnp.all(ratio > conf.depth_confidence), c0, c1

                if conf.depth_confidence > 0:
                    stop, c0, c1 = jax.lax.cond(
                        is_last,
                        lambda: (jnp.asarray(True), jnp.ones((b, mloc)), jnp.ones((b, nloc))),
                        check_stop,
                    )
                else:
                    stop = is_last
                    c0 = jnp.ones((b, mloc))
                    c1 = jnp.ones((b, nloc))

                if conf.width_confidence > 0:
                    # keep likely-matchable or low-confidence tokens (reference
                    # get_pruning_mask :586-593); never prune once stopped.
                    th = thresholds[jnp.minimum(i, n_layers - 1)]
                    keep0 = (self._matchability(i, d0) > (1 - conf.width_confidence)) | (
                        c0 <= th
                    )
                    keep1 = (self._matchability(i, d1) > (1 - conf.width_confidence)) | (
                        c1 <= th
                    )
                    a0_new = jnp.where(stop | is_last, a0, a0 & keep0)
                    a1_new = jnp.where(stop | is_last, a1, a1 & keep1)
                    bidx = jnp.arange(b)[:, None]
                    if idx0 is None:
                        p0 = p0 + a0_new.astype(jnp.float32)
                        p1 = p1 + a1_new.astype(jnp.float32)
                    else:  # scatter compact survivor counts to original ids
                        p0 = p0.at[bidx, idx0].add(a0_new.astype(jnp.float32))
                        p1 = p1.at[bidx, idx1].add(a1_new.astype(jnp.float32))
                    a0, a1 = a0_new, a1_new

                return (i + 1, d0, d1, stop, a0, a1, p0, p1)

            return body_fn

        def over_capacity(a0, a1):
            return jnp.logical_or(
                jnp.max(a0.sum(-1)) > c0_cap, jnp.max(a1.sum(-1)) > c1_cap
            )

        def cond_full(state):
            i, _, _, done, a0, a1, *_ = state
            go = jnp.logical_and(i < n_layers, jnp.logical_not(done))
            if use_compact:
                go = jnp.logical_and(go, over_capacity(a0, a1))
            return go

        state = (jnp.asarray(0), desc0, desc1, jnp.asarray(False), act0, act1, prune0, prune1)
        state = jax.lax.while_loop(cond_full, make_body(enc0, enc1), state)
        i_end, desc0, desc1, done, act0, act1, prune0, prune1 = state

        if use_compact:
            bidx = jnp.arange(b)[:, None]
            # actives first, original order preserved (stable argsort)
            idx0 = jnp.argsort(jnp.logical_not(act0), axis=-1)[:, :c0_cap]
            idx1 = jnp.argsort(jnp.logical_not(act1), axis=-1)[:, :c1_cap]
            take = lambda t, idx: jnp.take_along_axis(t, idx[..., None], axis=1)
            d0c = take(desc0, idx0)
            d1c = take(desc1, idx1)
            a0c = jnp.take_along_axis(act0, idx0, axis=1)
            a1c = jnp.take_along_axis(act1, idx1, axis=1)
            e0c = jnp.take_along_axis(enc0, idx0[None, :, :, None], axis=2)
            e1c = jnp.take_along_axis(enc1, idx1[None, :, :, None], axis=2)

            def cond_compact(state):
                i, _, _, done, *_ = state
                return jnp.logical_and(i < n_layers, jnp.logical_not(done))

            cstate = (i_end, d0c, d1c, done, a0c, a1c, prune0, prune1)
            cstate = jax.lax.while_loop(
                cond_compact, make_body(e0c, e1c, idx0, idx1), cstate
            )
            i_end, d0c, d1c, _, a0c, a1c, prune0, prune1 = cstate
            # scatter survivors back; never-gathered tokens keep their
            # phase-1 descriptors and stay inactive
            desc0 = desc0.at[bidx, idx0].set(d0c)
            desc1 = desc1.at[bidx, idx1].set(d1c)
            act0 = jnp.zeros_like(act0).at[bidx, idx0].set(a0c)
            act1 = jnp.zeros_like(act1).at[bidx, idx1].set(a1c)

        return desc0, desc1, i_end - 1, act0, act1, prune0, prune1

    # -------------------------------------------------------------------- loss
    def loss(self, pred: dict, data: dict):
        """Deep-supervised NLL + confidence BCE (reference loss :614-663).

        Per-layer assignments are recomputed from the stored per-layer
        descriptors with the stacked assignment heads, scanning over layers to
        bound memory.
        """
        conf = self.conf
        n_layers = conf.n_layers
        all0 = jnp.swapaxes(pred["ref_descriptors0"], 0, 1)  # (L, B, M, D)
        all1 = jnp.swapaxes(pred["ref_descriptors1"], 0, 1)
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")

        la_final, _ = self._assignment(n_layers - 1, all0[-1], all1[-1], mask0, mask1)
        nll, gt_weights, loss_metrics = nll_loss(
            {"log_assignment": la_final}, data, nll_balancing=conf.loss.nll_balancing
        )
        losses = {
            "total": nll,
            "last": jax.lax.stop_gradient(nll),
            **loss_metrics,
            "row_norm": jnp.exp(la_final)[:, :-1].sum(2).mean(1),
        }

        final_m0 = jnp.argmax(la_final[:, :-1, :], axis=-1)
        final_m1 = jnp.argmax(la_final[:, :, :-1], axis=-2)

        def layer_loss(i):
            la_i, _ = self._assignment(i, all0[i], all1[i], mask0, mask1)
            nll_i, _, _ = nll_loss(
                {"log_assignment": la_i}, data, weights=gt_weights,
                nll_balancing=conf.loss.nll_balancing,
            )
            if conf.loss.gamma > 0.0:
                w = conf.loss.gamma ** (n_layers - i - 1)
            else:
                w = i + 1.0
            # confidence BCE (reference TokenConfidence.loss :109-122)
            wc, bc = self._slice(self.conf_head, i)
            logit0 = _dense(jax.lax.stop_gradient(all0[i]), wc, bc)[..., 0]
            logit1 = _dense(jax.lax.stop_gradient(all1[i]), wc, bc)[..., 0]
            correct0 = (
                jnp.argmax(jax.lax.stop_gradient(la_i)[:, :-1, :], axis=-1) == final_m0
            ).astype(jnp.float32)
            correct1 = (
                jnp.argmax(jax.lax.stop_gradient(la_i)[:, :, :-1], axis=-2) == final_m1
            ).astype(jnp.float32)
            bce0 = _masked_bce(logit0, correct0, mask0)
            bce1 = _masked_bce(logit1, correct1, mask1)
            return nll_i * w, w, (bce0 + bce1) / 2.0

        sum_weights = 1.0
        confidence = jnp.zeros_like(nll)
        total = losses["total"]
        for i in range(n_layers - 1):  # unrolled: n_layers is small and static
            nll_i_w, w, conf_i = layer_loss(i)
            total = total + nll_i_w
            sum_weights += w
            confidence = confidence + conf_i / (n_layers - 1)
        total = total / sum_weights
        losses["confidence"] = confidence
        if conf.is_training:
            total = total + confidence
        losses["total"] = total

        metrics = {} if conf.is_training else matcher_metrics(pred, data)
        return losses, metrics


def _masked_bce(logits, labels, mask):
    per_tok = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if mask is None:
        return per_tok.mean(-1)
    m = mask.astype(per_tok.dtype)
    return (per_tok * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)


__main_model__ = LightGlue
