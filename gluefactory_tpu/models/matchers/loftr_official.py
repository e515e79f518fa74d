"""Weight-compatible official LoFTR (Sun et al., CVPR 2021, zju3dv/LoFTR).

The native LoFTR-family model lives in loftr.py (compact, trainable). THIS
module reproduces the OFFICIAL released architecture — `outdoor_ds.ckpt` /
`indoor_ds_new.ckpt`, wrapped by the reference at
/root/reference/gluefactory/models/matchers/kornia_loftr.py:7-88 — so that
converted checkpoints (scripts/convert_weights.py --kind loftr) reproduce the
published matcher:

  - Backbone ResNetFPN_8_2: 7x7/s2 stem, three 2-BasicBlock stages
    [128, 196, 256], FPN top-down with align_corners=True bilinear x2
    upsampling -> coarse 1/8 (256ch) + fine 1/2 (128ch) maps. BatchNorms are
    FOLDED into the convolutions by the converter (exact at inference).
  - PositionEncodingSine added to the coarse map. The released checkpoints
    predate the repo's temperature bug fix, so `temp_bug_fix: False` is the
    default (LoFTR src/loftr/utils/position_encoding.py).
  - Coarse LocalFeatureTransformer: 4x (self, cross) LoFTREncoderLayers with
    LINEAR attention (elu(q)+1 kernel feature map), bias-free q/k/v/merge
    projections, 2-layer bias-free MLP on [x, message], LayerNorms.
  - Dual-softmax coarse matching: features / sqrt(d), temperature 0.1,
    softmax over both axes multiplied, mutual-nearest + threshold; here with
    static top-K selection and a validity mask (TPU fixed shapes).
  - FinePreprocess (cat_c_feat): 5x5 windows unfolded from the fine map at
    the matched cells (stride 4, zero pad 2), coarse context via down_proj +
    merge_feat; 1x (self, cross) fine transformer; correlation softargmax
    (spatial expectation) refines the view-1 point.

Outputs follow the reference wrapper's detector-free convention
(kornia_loftr.py: keypoints = matched cell coords, matches0 = identity over
valid rows).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel


def _conv(x, p, stride=1):
    """torch-Conv2d-equivalent: SYMMETRIC k//2 padding (JAX "SAME" pads
    (0, 1) on stride-2 even inputs — misaligned taps vs torch)."""
    w, b = p["kernel"], p["bias"]
    k = w.shape[0]
    pad = [(k // 2, k // 2)] * 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def _upsample2x_align_corners(x):
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    oh, ow = 2 * h, 2 * w

    def axis_lerp(t, in_len, out_len, axis):
        pos = jnp.arange(out_len) * ((in_len - 1) / (out_len - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_len - 1)
        frac = (pos - lo).astype(t.dtype)
        tl = jnp.take(t, lo, axis=axis)
        th = jnp.take(t, hi, axis=axis)
        shape = [1] * t.ndim
        shape[axis] = out_len
        frac = frac.reshape(shape)
        return tl * (1 - frac) + th * frac

    x = axis_lerp(x, h, oh, 1)
    x = axis_lerp(x, w, ow, 2)
    return x


def position_encoding_sine(d_model, h, w, temp_bug_fix=False):
    """LoFTR PositionEncodingSine (pe (h, w, d_model)). The released
    checkpoints use the PRE-fix temperature (temp_bug_fix=False)."""
    pe = np.zeros((d_model, h, w), np.float32)
    y_pos = np.cumsum(np.ones((h, w), np.float32), 0) - 1
    x_pos = np.cumsum(np.ones((h, w), np.float32), 1) - 1
    if temp_bug_fix:
        div = np.exp(
            np.arange(0, d_model // 2, 2, dtype=np.float32)
            * (-math.log(10000.0) / (d_model // 2))
        )
    else:
        div = np.exp(
            np.arange(0, d_model // 2, 2, dtype=np.float32)
            * (-math.log(10000.0) / d_model * 2)
        )
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos[None] * div)
    pe[1::4] = np.cos(x_pos[None] * div)
    pe[2::4] = np.sin(y_pos[None] * div)
    pe[3::4] = np.cos(y_pos[None] * div)
    return jnp.asarray(pe.transpose(1, 2, 0))


def _linear_attention(q, k, v, eps=1e-6):
    """LoFTR LinearAttention: feature map elu(.)+1, O(N) association.
    q: (B, L, H, D), k/v: (B, S, H, D) -> (B, L, H, D)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    v_length = v.shape[1]
    values = v / v_length
    kv = jnp.einsum("nshd,nshv->nhdv", k, values)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", q, kv, z) * v_length
    return out


class LoFTROfficial(BaseModel):
    default_conf = {
        "name": "loftr_official",
        "weights": None,  # converted .npz (scripts/convert_weights.py --kind loftr)
        "initial_dim": 128,
        "block_dims": [128, 196, 256],
        "d_coarse": 256,
        "d_fine": 128,
        "nhead": 8,
        "n_coarse_layers": 4,  # x (self, cross)
        "n_fine_layers": 1,
        "temperature": 0.1,
        "coarse_threshold": 0.2,
        "fine_window": 5,
        "max_num_matches": 512,
        "temp_bug_fix": False,  # released ckpts predate the fix
        "is_training": False,
    }
    required_data_keys = ["view0", "view1"]

    def setup(self):
        conf = self.conf
        bd = list(conf.block_dims)
        init = nn.initializers

        def conv_p(name, cin, cout, k):
            return {
                "kernel": self.param(
                    name + "_k", init.lecun_normal(), (k, k, cin, cout)
                ),
                "bias": self.param(name + "_b", init.zeros, (cout,)),
            }

        # ResNetFPN_8_2 (BN folded into conv biases/scales by the converter)
        self.stem = conv_p("stem", 1, conf.initial_dim, 7)
        blocks = {}
        in_dims = [conf.initial_dim] + bd[:-1]
        for li, (cin, cout) in enumerate(zip(in_dims, bd)):
            stride = 1 if li == 0 else 2
            for bi in range(2):
                pre = f"layer{li + 1}_{bi}"
                b_cin = cin if bi == 0 else cout
                blocks[pre + "_conv1"] = conv_p(pre + "_conv1", b_cin, cout, 3)
                blocks[pre + "_conv2"] = conv_p(pre + "_conv2", cout, cout, 3)
                if bi == 0 and stride != 1:
                    blocks[pre + "_down"] = conv_p(pre + "_down", cin, cout, 1)
        self.blocks = blocks
        self.l3_out = conv_p("l3_out", bd[2], bd[2], 1)
        self.l2_out = conv_p("l2_out", bd[1], bd[2], 1)
        self.l2_out2a = conv_p("l2_out2a", bd[2], bd[2], 3)
        self.l2_out2b = conv_p("l2_out2b", bd[2], bd[1], 3)
        self.l1_out = conv_p("l1_out", bd[0], bd[1], 1)
        self.l1_out2a = conv_p("l1_out2a", bd[1], bd[1], 3)
        self.l1_out2b = conv_p("l1_out2b", bd[1], bd[0], 3)

        def enc_layer(prefix, d):
            lin = lambda nm, din, dout: self.param(
                f"{prefix}_{nm}", init.lecun_normal(), (din, dout)
            )
            return {
                "q": lin("q", d, d),
                "k": lin("k", d, d),
                "v": lin("v", d, d),
                "merge": lin("merge", d, d),
                "mlp0": lin("mlp0", 2 * d, 2 * d),
                "mlp1": lin("mlp1", 2 * d, d),
                "norm1_s": self.param(f"{prefix}_norm1_s", init.ones, (d,)),
                "norm1_b": self.param(f"{prefix}_norm1_b", init.zeros, (d,)),
                "norm2_s": self.param(f"{prefix}_norm2_s", init.ones, (d,)),
                "norm2_b": self.param(f"{prefix}_norm2_b", init.zeros, (d,)),
            }

        self.coarse_layers = [
            enc_layer(f"coarse_{i}", conf.d_coarse)
            for i in range(2 * conf.n_coarse_layers)
        ]
        self.fine_layers = [
            enc_layer(f"fine_{i}", conf.d_fine)
            for i in range(2 * conf.n_fine_layers)
        ]
        self.down_proj = {
            "kernel": self.param(
                "down_proj_k", init.lecun_normal(), (conf.d_coarse, conf.d_fine)
            ),
            "bias": self.param("down_proj_b", init.zeros, (conf.d_fine,)),
        }
        self.merge_feat = {
            "kernel": self.param(
                "merge_feat_k", init.lecun_normal(),
                (2 * conf.d_fine, conf.d_fine),
            ),
            "bias": self.param("merge_feat_b", init.zeros, (conf.d_fine,)),
        }

    # ------------------------------------------------------------- backbone
    def _basic_block(self, x, pre, stride):
        y = jax.nn.relu(_conv(x, self.blocks[pre + "_conv1"], stride))
        y = _conv(y, self.blocks[pre + "_conv2"])
        if pre + "_down" in self.blocks:
            x = _conv(x, self.blocks[pre + "_down"], stride)
        return jax.nn.relu(x + y)

    def _backbone(self, img):
        """img (B, H, W, 1) -> (fine (B, H/2, W/2, 128), coarse (B, H/8, W/8, 256))."""
        x0 = jax.nn.relu(
            jax.lax.conv_general_dilated(
                img, self.stem["kernel"], (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + self.stem["bias"]
        )
        x1 = x0
        for bi in range(2):
            x1 = self._basic_block(x1, f"layer1_{bi}", 1)
        x2 = x1
        for bi in range(2):
            x2 = self._basic_block(x2, f"layer2_{bi}", 2 if bi == 0 else 1)
        x3 = x2
        for bi in range(2):
            x3 = self._basic_block(x3, f"layer3_{bi}", 2 if bi == 0 else 1)

        x3_out = _conv(x3, self.l3_out)
        x3_2x = _upsample2x_align_corners(x3_out)
        x2_out = _conv(x2, self.l2_out)
        x2_out = _conv(
            jax.nn.leaky_relu(_conv(x2_out + x3_2x, self.l2_out2a), 0.01),
            self.l2_out2b,
        )
        x2_2x = _upsample2x_align_corners(x2_out)
        x1_out = _conv(x1, self.l1_out)
        x1_out = _conv(
            jax.nn.leaky_relu(_conv(x1_out + x2_2x, self.l1_out2a), 0.01),
            self.l1_out2b,
        )
        return x1_out, x3_out

    # ---------------------------------------------------------- transformer
    def _enc(self, p, x, source, nhead):
        b, l, d = x.shape
        s = source.shape[1]
        dh = d // nhead
        q = (x @ p["q"]).reshape(b, l, nhead, dh)
        k = (source @ p["k"]).reshape(b, s, nhead, dh)
        v = (source @ p["v"]).reshape(b, s, nhead, dh)
        msg = _linear_attention(q, k, v).reshape(b, l, d)
        msg = msg @ p["merge"]
        msg = _ln(msg, p["norm1_s"], p["norm1_b"])
        msg = jnp.concatenate([x, msg], -1) @ p["mlp0"]
        msg = jax.nn.relu(msg) @ p["mlp1"]
        msg = _ln(msg, p["norm2_s"], p["norm2_b"])
        return x + msg

    def _transformer(self, layers, t0, t1, nhead):
        for i, p in enumerate(layers):
            if i % 2 == 0:  # self
                t0 = self._enc(p, t0, t0, nhead)
                t1 = self._enc(p, t1, t1, nhead)
            else:  # cross
                n0 = self._enc(p, t0, t1, nhead)
                t1 = self._enc(p, t1, t0, nhead)
                t0 = n0
        return t0, t1

    # -------------------------------------------------------------- forward
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        img0 = data["view0"]["image"]
        img1 = data["view1"]["image"]
        to_gray = lambda im: (
            jnp.mean(im, -1, keepdims=True) if im.shape[-1] == 3 else im
        )
        img0, img1 = to_gray(img0), to_gray(img1)
        b = img0.shape[0]

        f0, c0 = self._backbone(img0)
        f1, c1 = self._backbone(img1)
        hc0, wc0 = c0.shape[1:3]
        hc1, wc1 = c1.shape[1:3]
        pe = position_encoding_sine(
            conf.d_coarse, max(hc0, hc1), max(wc0, wc1), conf.temp_bug_fix
        )
        t0 = (c0 + pe[None, :hc0, :wc0]).reshape(b, hc0 * wc0, conf.d_coarse)
        t1 = (c1 + pe[None, :hc1, :wc1]).reshape(b, hc1 * wc1, conf.d_coarse)

        t0, t1 = self._transformer(self.coarse_layers, t0, t1, conf.nhead)

        # dual-softmax coarse matching (CoarseMatching.forward)
        s0 = t0 / conf.d_coarse**0.5
        s1 = t1 / conf.d_coarse**0.5
        sim = jnp.einsum(
            "nlc,nsc->nls", s0, s1, preferred_element_type=jnp.float32
        ) / conf.temperature
        p = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)

        best1 = jnp.argmax(p, axis=-1)
        score = jnp.max(p, axis=-1)
        best0 = jnp.argmax(p, axis=-2)
        mutual = jnp.take_along_axis(best0, best1, axis=-1) == jnp.arange(
            t0.shape[1]
        )[None]
        score = jnp.where(mutual, score, 0.0)
        k = min(conf.max_num_matches, t0.shape[1])
        topv, topi = jax.lax.top_k(score, k)
        valid = topv > conf.coarse_threshold
        j = jnp.take_along_axis(best1, topi, axis=-1)

        # official convention: coarse keypoints at cell CORNERS (idx * 8)
        kpts0 = jnp.stack(
            [(topi % wc0).astype(jnp.float32), (topi // wc0).astype(jnp.float32)],
            -1,
        ) * 8.0
        kpts1c = jnp.stack(
            [(j % wc1).astype(jnp.float32), (j // wc1).astype(jnp.float32)], -1
        ) * 8.0

        # FinePreprocess: 5x5 windows on the fine map at stride 4, zero pad 2
        W = conf.fine_window
        r = W // 2
        pad = [(0, 0), (r, r), (r, r), (0, 0)]
        f0p = jnp.pad(f0, pad)
        f1p = jnp.pad(f1, pad)

        def windows(fmap_p, idx, wc):
            cy = (idx // wc) * 4 + r  # padded fine coords of window centers
            cx = (idx % wc) * 4 + r
            dy, dx = jnp.meshgrid(
                jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"
            )
            ys = cy[..., None] + dy.reshape(-1)[None, None]  # (B, K, WW)
            xs = cx[..., None] + dx.reshape(-1)[None, None]
            bi = jnp.arange(b)[:, None, None]
            return fmap_p[bi, ys, xs]  # (B, K, WW, C)

        w0 = windows(f0p, topi, wc0)
        w1 = windows(f1p, j, wc1)
        # coarse context: down_proj of matched coarse features
        g0 = jnp.take_along_axis(t0, topi[..., None], axis=1)
        g1 = jnp.take_along_axis(t1, j[..., None], axis=1)
        dp = lambda t: t @ self.down_proj["kernel"] + self.down_proj["bias"]
        ww = W * W
        mf = lambda wf, ctx: (
            jnp.concatenate(
                [wf, jnp.repeat(ctx[:, :, None], ww, axis=2)], -1
            ) @ self.merge_feat["kernel"] + self.merge_feat["bias"]
        )
        w0 = mf(w0, dp(g0))
        w1 = mf(w1, dp(g1))

        # fine transformer over window tokens (fold K into batch)
        w0f = w0.reshape(b * k, ww, conf.d_fine)
        w1f = w1.reshape(b * k, ww, conf.d_fine)
        w0f, w1f = self._transformer(self.fine_layers, w0f, w1f, conf.nhead)

        # FineMatching: center of window0 vs all of window1, softargmax
        center = w0f[:, ww // 2]
        simf = jnp.einsum(
            "mc,mrc->mr", center, w1f, preferred_element_type=jnp.float32
        ) / conf.d_fine**0.5
        heat = jax.nn.softmax(simf, axis=1)
        dy, dx = jnp.meshgrid(
            jnp.linspace(-1, 1, W), jnp.linspace(-1, 1, W), indexing="ij"
        )
        ex = (heat * dx.reshape(-1)[None]).sum(-1)
        ey = (heat * dy.reshape(-1)[None]).sum(-1)
        offs = jnp.stack([ex, ey], -1).reshape(b, k, 2) * r * 2.0  # fine stride 2
        kpts1 = kpts1c + offs

        matches0 = jnp.where(valid, jnp.arange(k)[None], -1).astype(jnp.int32)
        mscores = jnp.where(valid, topv, 0.0)
        return {
            "keypoints0": kpts0,
            "keypoints1": kpts1,
            "keypoint_scores0": topv,
            "keypoint_scores1": topv,
            "keypoint_mask0": valid,
            "keypoint_mask1": valid,
            "matches0": matches0,
            "matches1": matches0,
            "matching_scores0": mscores,
            "matching_scores1": mscores,
            "coarse_matrix": p,
        }

    def loss(self, pred, data):
        raise NotImplementedError  # eval-only, like the reference wrapper


def _ln(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


__main_model__ = LoFTROfficial
