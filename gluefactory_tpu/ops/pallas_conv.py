"""Pallas TPU megakernel for SuperPoint's block0 (the full-resolution stage).

Motivation (measured, NOTES.md r2/r3): block0 — two 64-channel 3x3 convs at
480x640 + BN/relu + 2x2 pool — costs ~3.9 ms (b8, real time) of SuperPoint's
~8.5 ms, and its FLOPs say ~2.1 ms at the bf16 peak. The XLA path loses to
(a) HBM round-trips between conv/BN/relu/mask/pool at full resolution (the
conv1a intermediate alone is 316 MB at b8) and (b) the 16/9 FLOP overhead of
the s2d embedding running at ~140 TF/s.

Design — everything stays rank-2 in VMEM, and every vector slice feeding a
matmul is SUBLANE-ALIGNED (offsets that are multiples of the (16,128) bf16
tile; unaligned slices force Mosaic relayout copies that ate r2/r3 attempts):

  - The image is space-to-depth'd (P0, 4 channels) and the receptive fields
    of a WIDENED conv1a are pre-gathered OUTSIDE the kernel into a flat tap
    matrix x24: (B, ROWS*WP, 24) — the 4x6-pixel patch (2 P0 rows x 3 P0
    cols) that covers P1 cell (Y, X) AND its column neighbor (Y, X+1). WP is
    the P1 width padded to a multiple of 16 so row offsets of multiples of WP
    stay tile-aligned. Building x24 is six shifted slices + concat in XLA.
  - Widened conv1a becomes ONE (M,24) @ (24,512) matmul per tile producing
    p1wide: channels [p1(Y,X) s2d-groups | p1(Y,X+1) s2d-groups]; + bias,
    relu, inference-BN affine, and the P1 boundary masks for BOTH column
    shifts (computed from flat-index iota; all lane-axis concats of
    offset-free slices).
  - conv1b (3x3, 64->64 == 2x2 s2d conv P1->P0) collapses to TWO row-aligned
    (M,512) @ (512,256) matmuls: tap row a of output flat row r reads p1wide
    row r + a*WP (aligned), the column taps are already in the channels.
  - bias + relu + BN2 + the 2x2 max pool (== max over the four 64-channel P0
    groups) finish in-register; the output is written FLAT (B, 240*WP, 64)
    and un-padded by the caller with one slice.
  - Grid steps per program stay <= 64 (the remote AOT compile helper dies
    above that): the batch is split into chunks launched as UNROLLED
    pallas_calls (no lax.map — r2's map serialized the pipeline).

Weight/data layout contracts (checked against the XLA reference path in
tests/test_pallas_kernels.py):
  - x24 tap rows: (ta*3 + tb)*4 + g for ta in {0,1} P0-row taps, tb in
    {0,1,2} P0-col taps, g the P0 s2d group; patch anchored at P0 cell
    (Y-1, X-1) of the (1,1)-padded P0 image.
  - W24: (24, 512) embeds _s2d_kernel(conv1a 3x3x1x64) twice (column shifts
    0 and +1); built in `_w24`.
  - W2: (2, 512, 256) = _s2d_kernel(conv1b 3x3x64x64) with the two column
    taps stacked on the input-channel axis; row tap is the leading index.
  - BN is inference-only and pre-folded to (mul, add) per 64 channels, tiled
    x4 (x8 for p1wide) onto the s2d channels.

Reference counterpart: the VGG trunk's first block,
gluefactory_nonfree/superpoint.py:202-350 (conv1a/conv1b/pool).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR_MAX = int(os.environ.get("GFT_BLOCK0_TR", "12"))
# preferred output P0 rows per grid step; the actual TR is the largest
# divisor of the P0 height <= TR_MAX. VMEM at 480x640 with TR=12:
# p1wide (14*WP,512)bf16 4.8 MB + acc (12*WP,256)f32 4.1 MB + x24/out blocks
# ~ 10.5 MB with double buffering.
MAX_GRID_STEPS = 64  # remote AOT compile helper limit (NOTES.md r2)


def _pick_tr(hc):
    for t in range(min(TR_MAX, hc), 0, -1):
        if hc % t == 0:
            return t
    return 1


def _make_kernel(wp, n_rows_p1, n_cols_p1, TR):
    def kernel(x24_ref, halo_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        t = pl.program_id(1)
        m1 = (TR + 2) * wp
        base = t * TR * wp

        lin = base + jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
        row = lin // wp
        col = lin - row * wp
        dt = o_ref.dtype
        in_rows = row < n_rows_p1
        a0 = ((row != 0) & in_rows).astype(dt)
        a1 = ((row != n_rows_p1 - 1) & in_rows).astype(dt)

        # widened conv1a on the main tile + the first 2*wp halo rows (covers
        # the conv1b row taps). The dot emits bf16 directly and the whole
        # epilogue runs in bf16 — same rounding points as the XLA s2d path
        # (conv output, bias, BN affine all bf16 there) at 2x VPU width.
        x = jnp.concatenate([x24_ref[0], halo_ref[0, : 2 * wp, :]], axis=0)
        p = jax.lax.dot_general(
            x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        p = (
            jnp.maximum(p + b1_ref[0, :][None, :].astype(dt), 0.0)
            * b1_ref[1, :][None, :].astype(dt)
            + b1_ref[2, :][None, :].astype(dt)
        )
        # P1 boundary masks (zero-pad semantics of the SAME conv): group
        # (d, e) of cell (row, c) holds original pixel (2row-1+d, 2c-1+e);
        # e==0 is invalid at c 0, e==1 at the last P1 column; anything beyond
        # the real P1 grid is zeroed. The second 256 channels are the same
        # cell shifted one P1 column right (c+1).
        def colmasks(c, valid_c):
            v = valid_c.astype(dt)
            b0 = (c != 0).astype(dt) * v
            bl = (c != n_cols_p1 - 1).astype(dt) * v
            return b0, bl

        b0, bl = colmasks(col, col < n_cols_p1)
        b0s, bls = colmasks(col + 1, col + 1 < n_cols_p1)
        p1w = jnp.concatenate(
            [
                p[:, 0:64] * (a0 * b0),
                p[:, 64:128] * (a0 * bl),
                p[:, 128:192] * (a1 * b0),
                p[:, 192:256] * (a1 * bl),
                p[:, 256:320] * (a0 * b0s),
                p[:, 320:384] * (a0 * bls),
                p[:, 384:448] * (a1 * b0s),
                p[:, 448:512] * (a1 * bls),
            ],
            axis=1,
        )

        # conv1b: two row-aligned K=512 matmuls (row tap a reads p1wide row
        # r + a*wp; wp % 16 == 0 keeps the slice tile-aligned)
        acc = None
        for a in (0, 1):
            sl = jax.lax.slice_in_dim(p1w, a * wp, a * wp + TR * wp, axis=0)
            part = jax.lax.dot_general(
                sl, w2_ref[a],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        y = (
            jnp.maximum(acc + b2_ref[0, :][None, :], 0.0) * b2_ref[1, :][None, :]
            + b2_ref[2, :][None, :]
        )
        o = jnp.maximum(
            jnp.maximum(y[:, 0:64], y[:, 64:128]),
            jnp.maximum(y[:, 128:192], y[:, 192:256]),
        )
        o_ref[0, :, :] = o.astype(o_ref.dtype)

    return kernel


def _round_up(x, m):
    return (x + m - 1) // m * m


def _w24(w1_33, s2d_kernel_fn):
    """(3,3,1,64) -> (24, 512): widened conv1a weights; see module docstring."""
    w16 = s2d_kernel_fn(w1_33).reshape(2, 2, 4, 256)  # (ta, tb, g, out)
    w24 = jnp.zeros((2, 3, 4, 2, 256), w16.dtype)
    # shift 0 (output channels 0:256): patch cols tb in {0,1}
    w24 = w24.at[:, 0:2, :, 0, :].set(w16)
    # shift +1 (output channels 256:512): patch cols tb in {1,2}
    w24 = w24.at[:, 1:3, :, 1, :].set(w16)
    return w24.reshape(24, 512)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block0_fused(
    image, w1_33, b1, mul1, add1, w2_33, b2, mul2, add2, interpret=False
):
    """Fused SuperPoint block0: image (B, H, W, 1) f32 in [0,1] ->
    (B, H/2, W/2, 64) pooled features (bf16).

    w*_33: the plain 3x3 conv kernels ((3,3,1,64) and (3,3,64,64));
    b*: conv biases (64,); mul/add: folded inference BN (64,).
    Numerics match the XLA s2d path (s2d_conv + _mask_p1 + group max).
    """
    from ..models.extractors.superpoint_open import _s2d_kernel, _space_to_depth

    b, h, w, _ = image.shape
    hc, wc = h // 2, w // 2  # P0 grid
    rows_p1, cols_p1 = hc + 1, wc + 1
    wp = _round_up(cols_p1, 16)  # multiple of the bf16 sublane tile

    dt = jnp.bfloat16
    x0 = _space_to_depth(image.astype(dt))  # (B, hc, wc, 4)
    # padded P0 (one cell halo each side, two on the right for the widened
    # column taps) -> conv1a tap matrix (ta, tb, cin)
    xp = jnp.pad(x0, ((0, 0), (1, 1), (1, 2), (0, 0)))  # (B, hc+2, wc+3, 4)
    taps = [
        xp[:, ta : ta + rows_p1, tb : tb + cols_p1, :]
        for ta in (0, 1)
        for tb in (0, 1, 2)
    ]
    x24 = jnp.concatenate(taps, axis=-1)  # (B, rows_p1, cols_p1, 24)
    x24 = jnp.pad(x24, ((0, 0), (0, 0), (0, wp - cols_p1), (0, 0)))
    # pad rows to one EXTRA full tile so the halo block (index t+1) is
    # always in range
    TR = _pick_tr(hc)
    n_tiles = hc // TR
    rowsp = (n_tiles + 1) * TR
    x24 = jnp.pad(x24, ((0, 0), (0, rowsp - rows_p1), (0, 0), (0, 0)))
    x24f = x24.reshape(b, rowsp * wp, 24)

    w1 = _w24(w1_33, _s2d_kernel).astype(dt)
    w2 = _s2d_kernel(w2_33)  # (2, 2, 256, 256): (row tap, col tap, in, out)
    w2 = w2.transpose(0, 1, 2, 3).reshape(2, 512, 256).astype(dt)
    pack = lambda cb, mu, ad, rep: jnp.stack(
        [jnp.tile(cb, rep), jnp.tile(mu, rep), jnp.tile(ad, rep)]
    ).astype(jnp.float32)
    b1p = pack(b1, mul1, add1, 8)  # (3, 512)
    b2p = pack(b2, mul2, add2, 4)  # (3, 256)

    kernel = _make_kernel(wp, rows_p1, cols_p1, TR)

    def run_chunk(xf):
        bc = xf.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bc, hc * wp, 64), dt),
            grid=(bc, n_tiles),
            in_specs=[
                pl.BlockSpec((1, TR * wp, 24), lambda i, t: (i, t, 0)),
                pl.BlockSpec((1, TR * wp, 24), lambda i, t: (i, t + 1, 0)),
                pl.BlockSpec((24, 512), lambda i, t: (0, 0)),
                pl.BlockSpec((3, 512), lambda i, t: (0, 0)),
                pl.BlockSpec((2, 512, 256), lambda i, t: (0, 0, 0)),
                pl.BlockSpec((3, 256), lambda i, t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TR * wp, 64), lambda i, t: (i, t, 0)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bc * hc * wp * (24 * 512 + 2 * 512 * 256),
                bytes_accessed=bc * (rowsp * wp * 24 * 2 + hc * wp * 64 * 2),
                transcendentals=0,
            ),
        )(xf, xf, w1, b1p, w2, b2p)

    # keep every program's grid under the remote-compile-helper step limit by
    # launching UNROLLED batch-chunk calls (any batch size; remainder chunks
    # just lower a second kernel shape)
    chunk = max(1, MAX_GRID_STEPS // max(n_tiles, 1))
    if b > chunk and not interpret:
        parts = [
            run_chunk(x24f[i : min(i + chunk, b)]) for i in range(0, b, chunk)
        ]
        out_flat = jnp.concatenate(parts, axis=0)
    else:
        out_flat = run_chunk(x24f)
    out = out_flat.reshape(b, hc, wp, 64)[:, :, :wc, :]
    return out


__all__ = ["block0_fused"]
