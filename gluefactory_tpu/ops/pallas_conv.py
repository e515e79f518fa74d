"""Pallas TPU megakernel for SuperPoint's block0 (the full-resolution stage).

Motivation (measured, NOTES.md r2): block0 — two 64-channel 3x3 convs at
480x640 + BN/relu + 2x2 pool — costs ~5.3 ms of SuperPoint's 9.4 ms at b8,
and its FLOPs say it should cost well under 1 ms. The XLA path loses to
(a) the first conv's pathological layouts (C_in=1/4 on the 128-lane minor
dim), (b) HBM round-trips between conv/BN/relu/mask/pool ops at full
resolution (the conv1 intermediate alone is 95 MB), and (c) odd spatial dims
(241x321) in the space-to-depth P1 layout.

Design — everything stays rank-2 in VMEM (no Mosaic reshapes):

  - The image is space-to-depth'd (P0, 4 channels) and its conv1a receptive
    fields are pre-gathered OUTSIDE the kernel into a flat tap matrix
    x16: (B, ROWS*WP, 16) where WP is the width padded to a multiple of 8 and
    row r of the flat axis is P1 cell (r // WP, r % WP). Building x16 is four
    cheap shifted slices + concat in XLA.
  - conv1a (3x3, 1->64 at full res == 2x2 s2d conv of the P0 image) becomes
    ONE (M,16) @ (16,256) matmul per tile; + bias, relu, inference-BN affine,
    and the P1 boundary masks (computed from flat-index iota).
  - conv1b (3x3, 64->64 == 2x2 s2d conv P1->P0) becomes FOUR row-shifted
    (M,256) @ (256,256) matmuls: in the flat layout, tap (a,b) of output row
    r is input row r + a*WP + b — a pure 2D dynamic slice. K=N=256: full MXU.
  - bias + relu + BN2 + the 2x2 max pool (== max over the four 64-channel P0
    groups) finish in-register; the output is written FLAT (B, 240*WP, 64)
    and un-padded by the caller with one slice.

Weight/data layout contracts (all checked against the XLA reference path in
tests/test_pallas_kernels.py):
  - W1: (16, 256) = _s2d_kernel(conv1a 3x3x1x64).reshape — input index order
    (tap_a, tap_b, cin), output (group_a, group_b, cout).
  - W2: (4, 256, 256) = _s2d_kernel(conv1b 3x3x64x64) taps, index a*2+b;
    input channels are P1 groups (d, e, ci), output P0 groups (a, b, co).
  - BN is inference-only and pre-folded to (mul, add) per 64 channels, tiled
    x4 onto the 256 s2d channels.

Reference counterpart: the VGG trunk's first block,
gluefactory_nonfree/superpoint.py:202-350 (conv1a/conv1b/pool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 8  # output P0 rows per grid step (240 % TR == 0); VMEM at 480x640:
# 2x p1 (10*WP,256)bf16 + acc (8*WP,256)f32 + 4 input blocks + out ~ 10 MB


def _make_kernel(wp, n_rows_p1, col_last):
    def kernel(
        x16_ref, halo_ref, x16s_ref, halos_ref, w1_ref, b1_ref, w2_ref,
        b2_ref, o_ref,
    ):
        t = pl.program_id(1)
        m1 = (TR + 2) * wp
        base = t * TR * wp

        lin = base + jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
        row = lin // wp
        col = lin - row * wp
        in_rows = row < n_rows_p1
        a0 = ((row != 0) & in_rows).astype(jnp.float32)
        a1 = ((row != n_rows_p1 - 1) & in_rows).astype(jnp.float32)
        dt = o_ref.dtype

        def conv1a(main_ref, h_ref, e_shift):
            # main tile (TR*wp rows) + first 2*wp rows of the next tile
            # (halo for the conv2 row taps); both non-overlapping BlockSpec
            # fetches (lane-padded (M,16) blocks stay small)
            x = jnp.concatenate([main_ref[0], h_ref[0, : 2 * wp, :]], axis=0)
            p = jax.lax.dot_general(
                x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = (
                jnp.maximum(p + b1_ref[0, :][None, :], 0.0)
                * b1_ref[1, :][None, :]
                + b1_ref[2, :][None, :]
            )
            # P1 boundary masks: this buffer holds cell (row, col+e_shift)
            c = col + e_shift
            b0 = (c != 0).astype(jnp.float32)
            bl = (c != col_last).astype(jnp.float32)
            return jnp.concatenate(
                [
                    p[:, 0:64] * (a0 * b0),
                    p[:, 64:128] * (a0 * bl),
                    p[:, 128:192] * (a1 * b0),
                    p[:, 192:256] * (a1 * bl),
                ],
                axis=1,
            ).astype(dt)

        # two conv1a passes: p1 and its one-column-shifted sibling (shifted in
        # XLA on the tap matrix, so every conv2 tap offset below is a multiple
        # of wp — unaligned 1-row sublane shifts hang the Mosaic compiler)
        p1 = conv1a(x16_ref, halo_ref, 0)
        p1s = conv1a(x16s_ref, halos_ref, 1)

        acc = None
        for a in (0, 1):
            for src in (p1, p1s):  # src==p1 -> tap b=0, p1s -> tap b=1
                b = 0 if src is p1 else 1
                sl = jax.lax.slice_in_dim(src, a * wp, a * wp + TR * wp, axis=0)
                part = jax.lax.dot_general(
                    sl, w2_ref[a * 2 + b],
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
    wp = _round_up(cols_p1, 8)

    dt = jnp.bfloat16
    x0 = _space_to_depth(image.astype(dt))  # (B, hc, wc, 4)
    # padded P0 (one cell halo) -> conv1a tap matrix (ta, tb, cin)
    xp = jnp.pad(x0, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, hc+2, wc+2, 4)
    taps = [
        xp[:, ta : ta + rows_p1, tb : tb + cols_p1, :]
        for ta in (0, 1)
        for tb in (0, 1)
    ]
    x16 = jnp.concatenate(taps, axis=-1)  # (B, rows_p1, cols_p1, 16)
    x16 = jnp.pad(x16, ((0, 0), (0, 0), (0, wp - cols_p1), (0, 0)))
    # pad rows to one EXTRA full tile so the halo block (index t+1) is
    # always in range
    n_tiles = hc // TR
    rowsp = (n_tiles + 1) * TR
    x16 = jnp.pad(x16, ((0, 0), (0, rowsp - rows_p1), (0, 0), (0, 0)))
    x16f = x16.reshape(b, rowsp * wp, 16)
    # one-flat-row (== one P1 column) shifted copy, so the kernel's conv2
    # column taps become wp-aligned row offsets
    x16s = jnp.concatenate([x16f[:, 1:], jnp.zeros_like(x16f[:, :1])], axis=1)

    w1 = _s2d_kernel(w1_33).reshape(16, 256).astype(dt)
    w2 = _s2d_kernel(w2_33).astype(jnp.float32)  # (2,2,256,256)
    w2 = w2.reshape(4, 256, 256).astype(dt)
    pack = lambda cb, mu, ad: jnp.stack(
        [jnp.tile(cb, 4), jnp.tile(mu, 4), jnp.tile(ad, 4)]
    ).astype(jnp.float32)  # (3, 256)
    b1p = pack(b1, mul1, add1)
    b2p = pack(b2, mul2, add2)

    kernel = _make_kernel(wp, rows_p1, cols_p1 - 1)

    def run_chunk(args):
        xf, xs_ = args
        bc = xf.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bc, hc * wp, 64), dt),
            grid=(bc, n_tiles),
            in_specs=[
                pl.BlockSpec((1, TR * wp, 16), lambda i, t: (i, t, 0)),
                pl.BlockSpec((1, TR * wp, 16), lambda i, t: (i, t + 1, 0)),
                pl.BlockSpec((1, TR * wp, 16), lambda i, t: (i, t, 0)),
                pl.BlockSpec((1, TR * wp, 16), lambda i, t: (i, t + 1, 0)),
                pl.BlockSpec((16, 256), lambda i, t: (0, 0)),
                pl.BlockSpec((3, 256), lambda i, t: (0, 0)),
                pl.BlockSpec((4, 256, 256), lambda i, t: (0, 0, 0)),
                pl.BlockSpec((3, 256), lambda i, t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TR * wp, 64), lambda i, t: (i, t, 0)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bc * hc * wp * (16 * 256 + 4 * 256 * 256),
                bytes_accessed=bc * (rowsp * wp * 16 * 2 + hc * wp * 64 * 2),
                transcendentals=0,
            ),
        )(xf, xf, xs_, xs_, w1, b1p, w2, b2p)

    # the remote AOT compile helper dies (exit 1, no diagnostic) when one
    # program carries more than ~64 total grid steps of this kernel — chunk
    # the batch and lax.map over chunks: ONE kernel lowering, sequential
    # execution, any batch size.
    max_steps = 64
    chunk = max(1, min(b, max_steps // max(n_tiles, 1)))
    if b > chunk and b % chunk == 0 and not interpret:
        xf_c = x16f.reshape(b // chunk, chunk, *x16f.shape[1:])
        xs_c = x16s.reshape(b // chunk, chunk, *x16s.shape[1:])
        out_flat = jax.lax.map(run_chunk, (xf_c, xs_c))
        out_flat = out_flat.reshape(b, hc * wp, 64)
    else:
        out_flat = run_chunk((x16f, x16s))
    out = out_flat.reshape(b, hc, wp, 64)[:, :, :wc, :]
    return out


__all__ = ["block0_fused"]
