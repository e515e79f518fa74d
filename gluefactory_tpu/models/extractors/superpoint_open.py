"""SuperPoint detector/descriptor (open architecture), TPU-native.

Re-design of reference models/extractors/superpoint_open.py:76-210 (itself the
rpautrat TF re-implementation) for JAX/XLA:

  - NHWC layout (TPU conv-friendly); VGG backbone of Conv+ReLU+BatchNorm
    blocks, 65-channel cell softmax detector, D-dim descriptor head.
  - NMS as max-pool equality with two suppression rounds (reference
    batched_nms :32-47) — pure reduce_window ops, no loops over pixels.
  - Keypoint selection is ALWAYS fixed-size: `jax.lax.top_k` of the NMS'd
    score map to exactly `max_num_keypoints`, with a validity mask
    `score > detection_threshold` — the static-shape equivalent of the
    reference's `force_num_keypoints` padding (superpoint_open.py:172-185).
  - Bilinear descriptor sampling at keypoint centers, align_corners=False
    convention, L2-normalized (reference sample_descriptors :18-28).

Outputs: keypoints (B,K,2) xy at pixel centers (+0.5 like reference :201),
keypoint_scores (B,K), descriptors (B,K,D), keypoint_mask (B,K) bool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..base_model import BaseModel


def _shifted(a: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """a shifted left by k along axis, -inf filled (same shape)."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, k)
    ap = jnp.pad(a, pad, constant_values=-jnp.inf)
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(k, k + a.shape[axis])
    return ap[tuple(idx)]


def _axis_max(a: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Centered (2r+1) running max along axis via a log-tree of shifted
    maxes (pad + static slices): ~4 elementwise maxes for r=4 instead of a
    9-tap reduce_window, which lowers poorly on TPU."""
    length = 2 * radius + 1
    pad = [(0, 0)] * a.ndim
    pad[axis] = (radius, radius)
    g = jnp.pad(a, pad, constant_values=-jnp.inf)
    total = 1
    while total * 2 <= length:
        g = jnp.maximum(g, _shifted(g, total, axis))
        total *= 2
    if total < length:
        g = jnp.maximum(g, _shifted(g, length - total, axis))
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(0, a.shape[axis])
    return g[tuple(idx)]


def simple_nms(scores: jnp.ndarray, radius: int, iterations: int = 2) -> jnp.ndarray:
    """Fast NMS: keep local maxima of a (B, H, W) score map (reference
    batched_nms, superpoint_open.py:32-47)."""

    def max_pool(x):
        # separable (2r+1)^2 max as two shift-tree passes (exact)
        return _axis_max(_axis_max(x, radius, 1), radius, 2)

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(iterations):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def sample_descriptors(
    keypoints: jnp.ndarray, descriptors: jnp.ndarray, s: int = 8
) -> jnp.ndarray:
    """Bilinearly sample a dense (B, Hc, Wc, D) descriptor map at (B, K, 2) xy
    pixel coords of the full-resolution image (cell stride s); L2-normalize.
    align_corners=False semantics like the reference grid_sample call
    (superpoint_open.py:18-28)."""
    b, hc, wc, d = descriptors.shape
    # full-res pixel -> descriptor-map continuous coords (align_corners=False)
    x = (keypoints[..., 0] + 0.5) / s - 0.5
    y = (keypoints[..., 1] + 0.5) / s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, wc - 1)
    x1i = jnp.clip(x0i + 1, 0, wc - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, hc - 1)
    y1i = jnp.clip(y0i + 1, 0, hc - 1)

    flat = descriptors.reshape(b, hc * wc, d)

    def gather(iy, ix):
        return jnp.take_along_axis(flat, (iy * wc + ix)[..., None], axis=1)

    # blend in the map's dtype (bf16 on TPU halves gather traffic — the
    # output is re-normalized in fp32 below, so the precision loss is ~1e-3
    # on unit vectors), accumulate in fp32
    wdt = descriptors.dtype
    out = (
        gather(y0i, x0i) * ((1 - wx) * (1 - wy)).astype(wdt)[..., None]
        + gather(y0i, x1i) * (wx * (1 - wy)).astype(wdt)[..., None]
        + gather(y1i, x0i) * ((1 - wx) * wy).astype(wdt)[..., None]
        + gather(y1i, x1i) * (wx * wy).astype(wdt)[..., None]
    ).astype(jnp.float32)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-8)


# --------------------------------------------------------------- space-to-depth
# The VGG trunk's 64-channel 3x3 convs fill only half the MXU's 128 lanes
# (N = 64). A 3x3 stride-1 SAME conv is EXACTLY a 2x2 VALID conv between two
# space-to-depth layouts whose 2x2 grids are offset by one pixel:
#
#   P0 layout: s2d cell Y holds original rows (2Y, 2Y+1)         -> H/2 cells
#   P1 layout: s2d cell Y holds original rows (2Y-1, 2Y)         -> H/2+1 cells
#
# Output row 2Y+a of a 3x3 conv needs input rows 2Y+a-1..2Y+a+1, and the union
# over a in {0,1} is rows 2Y-1..2Y+2 = P1 cells Y, Y+1 — a 2-tap conv. The
# same holds in the other direction (P0 in, P1 out, with one cell of zero
# padding). So the trunk alternates P0 -> P1 -> P0 per conv pair, pays 16/9
# more FLOPs (the dense 2x2 x 4C kernel embeds the 3x3 taps with zeros), and
# runs at N = 4*64 = 256 lanes: measured 1.65x faster on the conv1b shape
# (40 -> 116 TF/s effective) and 1.47x on block1. The 2x2 max pool after each
# block is a free max over the 4 channel groups of the P0 layout.
#
# Channel group order is (dy, dx, c): s2d cell channel (dy*2+dx)*C + c holds
# original pixel (2Y+dy, 2X+dx, c) (P0) or (2Y-1+dy, 2X-1+dx, c) (P1).


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _s2d_tap_matrix() -> np.ndarray:
    """One-hot map (p,q,d,e,a,b) -> (ky,kx): which 3x3 tap feeds the 2x2 s2d
    kernel entry. Original row offset t = (2p-1+d) - a, tap ky = t+1 = 2p+d-a;
    entries with |t| > 1 fall outside the 3x3 support and stay zero."""
    T = np.zeros((2, 2, 2, 2, 2, 2, 3, 3), np.float32)
    for p in range(2):
        for q in range(2):
            for d in range(2):
                for e in range(2):
                    for a in range(2):
                        for b in range(2):
                            ky, kx = 2 * p + d - a, 2 * q + e - b
                            if 0 <= ky <= 2 and 0 <= kx <= 2:
                                T[p, q, d, e, a, b, ky, kx] = 1.0
    return T


_S2D_TAPS = _s2d_tap_matrix()


def _s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (2,2,4Cin,4Cout) with (d,e,ci)/(a,b,co) group order."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    w2 = jnp.einsum(
        "pqdeabyx,yxio->pqdeiabo", jnp.asarray(_S2D_TAPS, kernel.dtype), kernel
    )
    return w2.reshape(2, 2, 4 * cin, 4 * cout)


def _mask_p1(x: jnp.ndarray) -> jnp.ndarray:
    """Zero the P1 slots that represent out-of-image pixels (row -1 lives in
    cell 0 group a=0, row H in the last cell group a=1; same for columns).
    Consumers of P1 tensors apply this so SAME zero-padding semantics hold."""
    b, hp, wp, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hp, wp, 2, 2, c)
    row = jnp.ones((hp, 2), x.dtype).at[0, 0].set(0).at[hp - 1, 1].set(0)
    col = jnp.ones((wp, 2), x.dtype).at[0, 0].set(0).at[wp - 1, 1].set(0)
    x = x * row[:, None, :, None, None] * col[None, :, None, :, None]
    return x.reshape(b, hp, wp, c4)


def s2d_conv(x, kernel, bias, mode: str, dtype=None):
    """Apply a 3x3 SAME conv as a 2x2 VALID conv in s2d layout.

    mode 'p0_to_p1': x is P0 (B, H/2, W/2, 4Cin) -> P1 (B, H/2+1, W/2+1, 4Cout)
        (boundary slots of the result are garbage until masked — _mask_p1 runs
        on the INPUT of the next p1_to_p0 conv, after the elementwise ops).
    mode 'p1_to_p0': x is P1 -> P0 (B, H/2, W/2, 4Cout).
    """
    dt = dtype or x.dtype
    w2 = _s2d_kernel(kernel).astype(dt)
    if mode == "p0_to_p1":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        x = _mask_p1(x)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(dt)
    return y


class _S2DConv(nn.Module):
    """Drop-in for nn.Conv(3x3, SAME) operating in s2d layout; identical
    parameter names/shapes, so the tree stays checkpoint-compatible."""

    features: int
    mode: str
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return s2d_conv(x, kernel, bias, self.mode, self.dtype)


class _S2DBatchNorm(nn.Module):
    """Inference-only BatchNorm on s2d layout: per-channel affine tiled over
    the 4 pixel groups. Same parameter/batch_stats names as nn.BatchNorm."""

    dtype: object = None
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        dt = self.dtype or x.dtype
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        return x.astype(dt) * jnp.tile(mul, 4).astype(dt) + jnp.tile(add, 4).astype(dt)


class VGGBlock(nn.Module):
    channels: int
    kernel: int = 3
    relu: bool = True
    dtype: object = None  # compute dtype (bf16 puts the convs on the MXU fast path)

    @nn.compact
    def __call__(self, x, is_training: bool, s2d_mode: str = None):
        # both branches create the same Conv_0/BatchNorm_0 parameter tree, so
        # the s2d inference path and the plain training path share weights
        if s2d_mode is not None:
            x = _S2DConv(self.channels, mode=s2d_mode, dtype=self.dtype, name="Conv_0")(x)
            if self.relu:
                x = nn.relu(x)
            return _S2DBatchNorm(dtype=self.dtype, name="BatchNorm_0")(x)
        x = nn.Conv(
            self.channels, (self.kernel, self.kernel), padding="SAME",
            dtype=self.dtype, name="Conv_0",
        )(x)
        if self.relu:
            x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not is_training, epsilon=1e-3, momentum=0.9,
            dtype=self.dtype, name="BatchNorm_0",
        )(x)
        return x


class SuperPoint(BaseModel):
    default_conf = {
        "name": "superpoint_open",
        "descriptor_dim": 256,
        "nms_radius": 4,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "channels": [64, 64, 128, 128, 256],
        "dense_outputs": False,
        "is_training": False,
        "dtype": "bfloat16",  # conv compute dtype; heads renormalize in fp32
        "approx_topk": True,  # lax.approx_max_k for keypoint selection on TPU
        "s2d": True,  # space-to-depth trunk at inference (1.5-1.65x conv speed)
        # block0 as ONE Pallas megakernel (conv1a K=16 matmul + conv1b 4x
        # K=256 matmuls + BN/relu/mask/pool in VMEM, ops/pallas_conv.py).
        # MEASURED SLOWER than the XLA s2d path in the full model (10.6 vs
        # 9.5 ms/view-batch: the lax.map chunking the compile helper forces
        # serializes what XLA otherwise overlaps) — default off; kept as
        # validated infrastructure. True enables (interpret off-TPU).
        "fused_block0": False,
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        conf = self.conf
        image = data["image"]  # (B, H, W, C) in [0, 1]
        is_training = conf.is_training
        # paired training view: both views run BATCH-CONCATENATED through the
        # one trunk (shared params, shared BatchNorm batch stats) and the
        # outputs split afterwards — no parameter-tree change vs inference
        paired = is_training and "image2" in data
        if paired:
            image = jnp.concatenate([image, data["image2"]], axis=0)
        if image.shape[-1] == 3:  # RGB -> grayscale (reference :119-121)
            image = jnp.sum(
                image * jnp.asarray([0.299, 0.587, 0.114], image.dtype), -1, keepdims=True
            )

        channels = list(conf.channels)
        stride = 2 ** (len(channels) - 2)
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, None: None}[
            conf.get("dtype")
        ]
        x = image.astype(dtype) if dtype is not None else image
        # s2d needs even dims at every trunk stage (3 pools -> H,W % 16 == 0;
        # the /8-cell detector grid already implies % 8). BatchNorm batch
        # stats require the plain path during training.
        h_in, w_in = int(x.shape[1]), int(x.shape[2])
        use_s2d = (
            bool(conf.get("s2d", True))
            and not is_training
            and h_in % 16 == 0
            and w_in % 16 == 0
        )
        fused_conf = conf.get("fused_block0", "auto")
        use_fused0 = (
            use_s2d
            and (fused_conf is True or (fused_conf == "auto" and jax.default_backend() == "tpu"))
        )
        for i, c in enumerate(channels[:-1]):
            has_pool = i < len(channels) - 2
            if (
                i == 0 and use_fused0 and c == 64 and x.shape[-1] == 1
                and has_pool and (h_in // 2) % 16 == 0
            ):
                # fused block0 megakernel: declare the SAME param tree by
                # instantiating the two VGGBlocks with dummy calls (their
                # compute is dead-code-eliminated), then hand the raw
                # kernels/biases/folded-BN to the Pallas kernel.
                blk_a = VGGBlock(c, dtype=dtype)
                blk_b = VGGBlock(c, dtype=dtype)
                _ = blk_a(jnp.zeros((1, 4, 4, 1), x.dtype), False)
                _ = blk_b(jnp.zeros((1, 4, 4, c), x.dtype), False)
                pvars = self.variables["params"]
                svars = self.variables.get("batch_stats", {})

                def raw(name):
                    p = pvars[name]
                    s = svars.get(name, {}).get(
                        "BatchNorm_0",
                        {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
                    )
                    scale = p["BatchNorm_0"]["scale"]
                    bias = p["BatchNorm_0"]["bias"]
                    mul = scale * jax.lax.rsqrt(s["var"] + 1e-3)
                    add = bias - s["mean"] * mul
                    return p["Conv_0"]["kernel"], p["Conv_0"]["bias"], mul, add

                k1, cb1, mul1, add1 = raw(blk_a.name)
                k2, cb2, mul2, add2 = raw(blk_b.name)
                from ...ops.pallas_conv import block0_fused

                x = block0_fused(
                    x, k1, cb1, mul1, add1, k2, cb2, mul2, add2,
                    interpret=jax.default_backend() != "tpu",
                )
                if dtype != jnp.bfloat16:
                    # the fused kernel computes in bf16; keep the conf dtype
                    # contract for float32 (and None) configs
                    x = x.astype(jnp.float32)
                continue
            # s2d pays 16/9 FLOPs to raise output lanes 4x: a win only while
            # cout < 128 (the MXU lane width). Measured at b8/480x640:
            # block0 1.17x, block1 1.00x, 64->128 0.82x, 128->128 0.69x —
            # so the 128-channel blocks run the plain conv path.
            if use_s2d and c < 128:
                xs = _space_to_depth(x)
                xs = VGGBlock(c, dtype=dtype)(xs, is_training, s2d_mode="p0_to_p1")
                xs = VGGBlock(c, dtype=dtype)(xs, is_training, s2d_mode="p1_to_p0")
                # (a fused pool+next-s2d variant was measured in r3 and LOST
                # badly — the 8-d reshape/transpose lowers poorly; keep the
                # simple group-max pool)
                if has_pool:  # 2x2 max pool == max over the 4 P0 pixel groups
                    bb, hh, ww, _ = xs.shape
                    x = xs.reshape(bb, hh, ww, 2, 2, c).max(axis=(3, 4))
                else:
                    x = _depth_to_space(xs)
            else:
                x = VGGBlock(c, dtype=dtype)(x, is_training)
                x = VGGBlock(c, dtype=dtype)(x, is_training)
                if has_pool:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
        features = x

        c_last = channels[-1]
        # descriptor head (L2 norm in fp32)
        dx = VGGBlock(c_last, dtype=dtype)(features, is_training)
        dense_desc = VGGBlock(conf.descriptor_dim, kernel=1, relu=False, dtype=dtype)(
            dx, is_training
        ).astype(jnp.float32)
        dense_desc = dense_desc / jnp.maximum(
            jnp.linalg.norm(dense_desc, axis=-1, keepdims=True), 1e-8
        )
        if dtype is not None:
            # unit-norm map: bf16 sampling costs ~1e-3 per component and the
            # sampled descriptor is re-normalized in fp32
            dense_desc = dense_desc.astype(dtype)

        # detector head: 65-channel cell softmax -> depth-to-space (fp32 softmax)
        sx = VGGBlock(c_last, dtype=dtype)(features, is_training)
        logits = VGGBlock(stride**2 + 1, kernel=1, relu=False, dtype=dtype)(
            sx, is_training
        ).astype(jnp.float32)
        if is_training:
            # detector/descriptor training outputs (multipoint losses); the
            # NMS/top-k selection head is inference-only
            dd = dense_desc.astype(jnp.float32)
            if paired:
                bb = logits.shape[0] // 2
                return {
                    "logits": logits[:bb],
                    "logits2": logits[bb:],
                    "dense_descriptors": dd[:bb],
                    "dense_descriptors2": dd[bb:],
                }
            return {"logits": logits, "dense_descriptors": dd}

        scores = jax.nn.softmax(logits, axis=-1)[..., :-1]
        b, hc, wc, _ = scores.shape
        scores = scores.reshape(b, hc, wc, stride, stride)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * stride, wc * stride)

        if dtype is not None:
            # NMS + top-k are pure selection: bf16 scores halve the pooling /
            # sort traffic; the selected values are compared to the detection
            # threshold only (8-bit mantissa is plenty)
            scores = scores.astype(dtype)
        scores = simple_nms(scores, conf.nms_radius)

        h, w = scores.shape[-2:]
        if conf.remove_borders:
            pad = conf.remove_borders
            border = jnp.zeros((h, w), bool)
            border = border.at[pad:-pad, pad:-pad].set(True)
            scores = jnp.where(border, scores, -1.0)

        # static top-k selection with validity mask; approx_max_k uses the
        # TPU-optimized partial sort (recall ~0.95 on an NMS-sparsified map,
        # several times faster than a full sort of H*W scores)
        k = conf.max_num_keypoints
        flat = scores.reshape(b, h * w)
        if conf.get("approx_topk") and jax.default_backend() == "tpu":
            topv, topi = jax.lax.approx_max_k(flat, k)
        else:
            topv, topi = jax.lax.top_k(flat, k)
        ys = (topi // w).astype(jnp.float32)
        xs = (topi % w).astype(jnp.float32)
        keypoints = jnp.stack([xs, ys], axis=-1)
        topv = topv.astype(jnp.float32)
        mask = topv > conf.detection_threshold
        kp_scores = jnp.where(mask, topv, 0.0)

        desc = sample_descriptors(keypoints, dense_desc, stride)

        pred = {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": kp_scores,
            "descriptors": desc,
            "keypoint_mask": mask,
        }
        if conf.dense_outputs:
            pred["dense_descriptors"] = dense_desc.astype(jnp.float32)
        return pred

    def loss(self, pred, data):
        """SuperPoint-style self-supervised detector (+ paired descriptor)
        loss (multipoint/utils/losses.py; reference multipoint losses.py
        :87-213). Needs data: keypoint_map (B, H, W), valid_mask, and for
        pairs keypoint_map2/valid_mask2/H_0to1."""
        if "logits" not in pred:
            # inference-mode predictions carry no training outputs; pipelines
            # catch this like any non-trainable component
            raise NotImplementedError
        from ...multipoint.utils.losses import superpoint_loss

        return superpoint_loss(pred, data, {"cell": 8})


__main_model__ = SuperPoint
