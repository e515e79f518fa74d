"""Pallas TPU kernels for LightGlue attention.

The TPU replacement for the reference's FlashAttention path
(gluefactory/models/matchers/lightglue.py:139-156, torch SDPA). Design for the
LightGlue regime (N <= 4096 keypoints, head_dim 64):

  - K and V for one (batch, head) fit comfortably in VMEM (N=4096, D=64 fp32 =
    1 MB each), so the kernel tiles only over QUERY blocks: one
    (BQ, D) @ (D, N) MXU pass, masked softmax in-register, then
    (BQ, N) @ (N, D). No online-softmax bookkeeping is needed, unlike
    HBM-resident flash attention — the LightGlue-specific win.
  - Masked softmax uses exp(sim - rowmax) * col_mask with an explicit
    denominator, so fully-padded rows produce exact zeros (same semantics as
    ops/attention.py masked XLA path).
  - Bidirectional cross-attention is SINGLE-PASS: each similarity tile is
    computed once and consumed by both directions — full row softmax for
    messages into set 0, and an online column softmax (running max/denom/
    accumulator in VMEM scratch across the sequential q-block grid steps)
    for messages into set 1 (`_bidir_cross_kernel*`). The stacked entry
    (`fused_cross_attention_stacked`) reads both keypoint sets of a pair
    from one (2B, N, D) array via BlockSpec index maps: one kernel call per
    layer, no HBM slicing. (At inference the whole-block layer megakernels
    in ops/pallas_lightglue_block.py subsume these; these kernels remain the
    training path — they carry the custom-VJP backward — and the adaptive
    compact phase.)

Falls back to interpret mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The packed kernels run their dots in the INPUT dtype (softmax statistics
# always f32): bf16 activations flow straight through — the counterpart of
# the reference's half-cast attention (lightglue.py:143,483-485). On the old
# per-head (minor dim 64) layout bf16 I/O lost to (16,128) tile relayouts;
# the packed 256-channel layout tiles bf16 cleanly and halves kernel HBM
# traffic. Measured MXU-only bf16 (f32 I/O, in-kernel cast) was a wash, so
# I/O dtype is the lever that matters.


def _attention_kernel(q_ref, k_ref, v_ref, maskq_ref, maskk_ref, o_ref, *, scale):
    # f32 operands: measured FASTER than bf16 here — at head_dim 64 the
    # bf16 packing/relayout costs more than the extra f32 MXU passes save.
    # VPU economy: scale is folded into q (BQxD mults, not BQxN), and the
    # softmax normalization is applied AFTER the AV matmul ((BQ,D) mults,
    # not (BQ,N)) — the (BQ,N) tile is touched only by exp and one select.
    q = q_ref[0] * scale  # (BQ, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)
    mask_q = maskq_ref[0, :, 0]  # (BQ,) int32 (bool as int)
    mask_k = maskk_ref[0, 0, :]  # (N,)

    sim = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N) f32

    # Masking by ADDITIVE bias, one (BQ, N) pass: masked columns get -1e9,
    # and after the (clamped) rowmax subtraction their exp underflows to an
    # EXACT f32 zero (e^(-1e9+1e4) == 0), so no select/multiply passes are
    # needed on the (BQ, N) tile. The -1e4 clamp keeps sim - rowmax <= 0 on
    # any row that has at least one valid column (no exp overflow) and sends
    # fully-masked rows to e == 0 everywhere (denom 0 -> o 0).
    colbias = (mask_k.astype(jnp.float32) - 1.0) * 1e9  # (N,)
    sim = sim + colbias[None, :]
    rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), -1e4)
    e = jnp.exp(sim - rowmax)
    denom = jnp.sum(e, axis=-1, keepdims=True)

    o = jax.lax.dot_general(
        e.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = o * (mask_q.astype(jnp.float32)[:, None] / (denom + 1e-30))
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _fused_attention_bhnd(
    q, k, v, mask_q, mask_k, block_q: int = 256, interpret: bool = False
):
    """Core entry on (BH, N, D) tensors with (BH, N) int32 masks."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5

    # pad to hardware-friendly sizes
    nq_p = _round_up(nq, block_q)
    nk_p = _round_up(nk, 128)
    if nq_p != nq:
        q = jnp.pad(q, ((0, 0), (0, nq_p - nq), (0, 0)))
        mask_q = jnp.pad(mask_q, ((0, 0), (0, nq_p - nq)))
    if nk_p != nk:
        k = jnp.pad(k, ((0, 0), (0, nk_p - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_p - nk), (0, 0)))
        mask_k = jnp.pad(mask_k, ((0, 0), (0, nk_p - nk)))
    # TPU block shapes: masks as 3D so last-two-dims tiling rules hold
    mask_q = mask_q[:, :, None]   # (BH, NQ, 1)
    mask_k = mask_k[:, None, :]   # (BH, 1, NK)

    grid = (bh, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, nk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, nk_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
        # every (batch*head, q-block) cell is independent -> megacore can
        # split both grid axes across cores
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nq_p * nk_p * d * 2,
            bytes_accessed=4 * bh * (nq_p * d * 2 + 2 * nk_p * d),
            transcendentals=bh * nq_p * nk_p,
        ),
    )(q, k, v, mask_q, mask_k)
    return out[:, :nq]


def _attention_bwd_kernel(
    q_ref, k_ref, v_ref, maskq_ref, maskk_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale,
):
    """Backward: recompute p for the q-block, then
    dv += p^T do ; dp = do v^T ; ds = p*(dp - rowsum(p*dp)) ;
    dq = ds k * scale ; dk += ds^T q * scale.
    dk/dv accumulate across the sequential q-block grid steps."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    mask_q = maskq_ref[0, :, 0]
    mask_k = maskk_ref[0, 0, :]

    sim = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    neg = jnp.float32(-1e9)
    colmask = (mask_k > 0)[None, :]
    sim = jnp.where(colmask, sim, neg)
    rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), neg)
    e = jnp.where(colmask, jnp.exp(sim - rowmax), 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / (denom + 1e-30)
    p = p * (mask_q > 0)[:, None]
    do = do * (mask_q > 0)[:, None]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    cdt = q.dtype  # matmul operand dtype (bf16 full-rate on the MXU)
    p_c = p.astype(cdt)
    do_c = do.astype(cdt)
    dv_ref[0] += jax.lax.dot_general(
        p_c, do_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(
        do_c, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True)) * scale).astype(cdt)

    dq_ref[0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _fused_attention_bwd_bhnd(
    q, k, v, mask_q, mask_k, do, block_q: int = 256, interpret: bool = False
):
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5
    nq_p = _round_up(nq, block_q)
    nk_p = _round_up(nk, 128)
    if nq_p != nq:
        q = jnp.pad(q, ((0, 0), (0, nq_p - nq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, nq_p - nq), (0, 0)))
        mask_q = jnp.pad(mask_q, ((0, 0), (0, nq_p - nq)))
    if nk_p != nk:
        k = jnp.pad(k, ((0, 0), (0, nk_p - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_p - nk), (0, 0)))
        mask_k = jnp.pad(mask_k, ((0, 0), (0, nk_p - nk)))
    mask_q3 = mask_q[:, :, None]
    mask_k3 = mask_k[:, None, :]

    grid = (bh, nq_p // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, d), v.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, nk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, nk_p), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nk_p, d), lambda b, i: (b, 0, 0)),  # accumulated
            pl.BlockSpec((1, nk_p, d), lambda b, i: (b, 0, 0)),  # accumulated
        ),
        interpret=interpret,
        # dk/dv accumulate across q-blocks -> that axis must stay sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(q, k, v, mask_q3, mask_k3, do)
    return dq[:, :nq], dk[:, :nk], dv[:, :nk]


@jax.custom_vjp
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_q: Optional[jnp.ndarray] = None,
    mask_k: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked multi-head attention via the Pallas kernel.

    Args:
        q: (B, H, Nq, D); k, v: (B, H, Nk, D).
        mask_q: (B, Nq) bool or None; mask_k: (B, Nk) bool or None.
    Returns (B, H, Nq, D), zeros at invalid query rows.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if mask_q is None:
        mask_q = jnp.ones((b, nq), jnp.int32)
    if mask_k is None:
        mask_k = jnp.ones((b, nk), jnp.int32)
    mask_q = jnp.repeat(mask_q.astype(jnp.int32), h, axis=0)  # (B*H, Nq)
    mask_k = jnp.repeat(mask_k.astype(jnp.int32), h, axis=0)
    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(nq, 128))
    out = _fused_attention_bhnd(
        qf, kf, vf, mask_q, mask_k, block_q=block_q, interpret=interpret
    )
    return out.reshape(b, h, nq, d)


def _flatten_masks(q, k, mask_q, mask_k):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    mq = jnp.ones((b, nq), jnp.int32) if mask_q is None else mask_q.astype(jnp.int32)
    mk = jnp.ones((b, nk), jnp.int32) if mask_k is None else mask_k.astype(jnp.int32)
    return jnp.repeat(mq, h, axis=0), jnp.repeat(mk, h, axis=0)


def _fused_attention_fwd(q, k, v, mask_q, mask_k):
    out = fused_attention(q, k, v, mask_q, mask_k)
    return out, (q, k, v, mask_q, mask_k)


def _fused_attention_bwd(residuals, g):
    q, k, v, mask_q, mask_k = residuals
    b, h, nq, d = q.shape
    nk = k.shape[2]
    mq, mk = _flatten_masks(q, k, mask_q, mask_k)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(nq, 128))
    dq, dk, dv = _fused_attention_bwd_bhnd(
        q.reshape(b * h, nq, d), k.reshape(b * h, nk, d), v.reshape(b * h, nk, d),
        mq, mk, g.reshape(b * h, nq, d), block_q=block_q, interpret=interpret,
    )
    return (
        dq.reshape(b, h, nq, d), dk.reshape(b, h, nk, d), dv.reshape(b, h, nk, d),
        None, None,
    )


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def _attention_kernel_packed(
    q_ref, k_ref, v_ref, maskq_ref, maskk_ref, o_ref, *, scale, num_heads
):
    """Multi-head attention on the PACKED (B, N, H*Dh) layout: heads are
    static channel slices processed by an unrolled in-kernel loop, so the
    caller never materializes the (B, H, N, Dh) transpose (the XLA relayouts
    around the per-head kernel cost more than the in-register lane shifts
    here). Same additive-bias masking as _attention_kernel."""
    d_total = q_ref.shape[-1]
    dh = d_total // num_heads
    mask_q = maskq_ref[0, :, 0]
    mask_k = maskk_ref[0, 0, :]
    colbias = (mask_k.astype(jnp.float32) - 1.0) * 1e9  # (N,)
    rowscale = mask_q.astype(jnp.float32)[:, None]

    # NOTE (measured, r2): a bf16-exp-emitting-bf16 variant was tried here to
    # kill the cast before the AV dot — ablation says it's NEUTRAL-to-worse
    # (7.32 vs 7.17 ms / 27 calls): Mosaic's f32 exp + cast cost only ~0.3 ms
    # at these shapes; the dots dominate. Keeping the f32 softmax.

    # scale folds into q in the I/O dtype (for LightGlue's head_dim 64 the
    # 0.125 scale is a power of two — exact even in bf16)
    for h in range(num_heads):
        q = q_ref[0, :, h * dh:(h + 1) * dh] * scale  # (BQ, Dh)
        k = k_ref[0, :, h * dh:(h + 1) * dh]  # (N, Dh)
        v = v_ref[0, :, h * dh:(h + 1) * dh]
        sim = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sim = sim + colbias[None, :]
        rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), -1e4)
        e = jnp.exp(sim - rowmax)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o * (rowscale / (denom + 1e-30))
        o_ref[0, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "interpret"))
def _fused_attention_packed_bnd(
    q, k, v, mask_q, mask_k, num_heads, block_q: int = 256, interpret: bool = False
):
    """Packed entry on (B, N, H*Dh) tensors with (B, N) int32 masks."""
    b, nq, d_total = q.shape
    nk = k.shape[1]
    scale = (d_total // num_heads) ** -0.5
    nq_p = _round_up(nq, block_q)
    nk_p = _round_up(nk, 128)
    if nq_p != nq:
        q = jnp.pad(q, ((0, 0), (0, nq_p - nq), (0, 0)))
        mask_q = jnp.pad(mask_q, ((0, 0), (0, nq_p - nq)))
    if nk_p != nk:
        k = jnp.pad(k, ((0, 0), (0, nk_p - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_p - nk), (0, 0)))
        mask_k = jnp.pad(mask_k, ((0, 0), (0, nk_p - nk)))
    mask_q = mask_q[:, :, None]
    mask_k = mask_k[:, None, :]

    grid = (b, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel_packed, scale=scale, num_heads=num_heads
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_p, d_total), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nk_p, d_total), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, nk_p, d_total), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, nk_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq_p * nk_p * d_total * 2,
            bytes_accessed=4 * b * (nq_p * d_total * 2 + 2 * nk_p * d_total),
            transcendentals=b * nq_p * nk_p * num_heads,
        ),
    )(q, k, v, mask_q, mask_k)
    return out[:, :nq]


def _packed_to_heads(x, num_heads):
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _heads_to_packed(x):
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_packed(q, k, v, mask_q=None, mask_k=None, num_heads: int = 4):
    """Masked multi-head attention on the packed (B, N, H*Dh) layout.

    Heads never leave the channel axis: no (B, H, N, Dh) transpose on either
    side. mask_q/(B,Nq), mask_k/(B,Nk) bool or None. Returns (B, Nq, H*Dh)
    with zeros at invalid query rows.
    """
    b, nq, _ = q.shape
    nk = k.shape[1]
    mq = jnp.ones((b, nq), jnp.int32) if mask_q is None else mask_q.astype(jnp.int32)
    mk = jnp.ones((b, nk), jnp.int32) if mask_k is None else mask_k.astype(jnp.int32)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(nq, 128))
    return _fused_attention_packed_bnd(
        q, k, v, mq, mk, num_heads, block_q=block_q, interpret=interpret
    )


def _fused_attention_packed_fwd(q, k, v, mask_q, mask_k, num_heads):
    out = fused_attention_packed(q, k, v, mask_q, mask_k, num_heads)
    return out, (q, k, v, mask_q, mask_k)


def _fused_attention_packed_bwd(num_heads, residuals, g):
    # backward reuses the per-head kernel (transposes acceptable off the
    # inference hot path)
    q, k, v, mask_q, mask_k = residuals
    qh = _packed_to_heads(q, num_heads)
    kh = _packed_to_heads(k, num_heads)
    vh = _packed_to_heads(v, num_heads)
    mq, mk = _flatten_masks(qh, kh, mask_q, mask_k)
    b, h, nq, dh = qh.shape
    nk = kh.shape[2]
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(nq, 128))
    dq, dk, dv = _fused_attention_bwd_bhnd(
        qh.reshape(b * h, nq, dh), kh.reshape(b * h, nk, dh),
        vh.reshape(b * h, nk, dh), mq, mk,
        _packed_to_heads(g, num_heads).reshape(b * h, nq, dh),
        block_q=block_q, interpret=interpret,
    )
    return (
        _heads_to_packed(dq.reshape(b, h, nq, dh)),
        _heads_to_packed(dk.reshape(b, h, nk, dh)),
        _heads_to_packed(dv.reshape(b, h, nk, dh)),
        None, None,
    )


fused_attention_packed.defvjp(_fused_attention_packed_fwd, _fused_attention_packed_bwd)


def _bidir_cross_kernel(
    qk0_ref, qk1_ref, v0_ref, v1_ref, mask0_ref, mask1_ref,
    m0_ref, m1_ref,
    colmax_ref, coldenom_ref, colacc_ref,
    *, scale,
):
    """Single similarity pass per tile: the row direction (messages into set
    0) is a full softmax over the resident set-1 axis; the column direction
    (messages into set 1) runs an ONLINE softmax accumulated across the
    sequential q-block grid steps in VMEM scratch, finalized on the last
    step. Saves the second QK^T of the two-pass formulation
    (reference materializes sim twice, lightglue.py:236-242)."""
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    q = qk0_ref[0]  # (BQ, D): f32 operands, measured faster than bf16
    k = qk1_ref[0]  # (N, D)   at head_dim 64 (packing overhead dominates)
    v1 = v1_ref[0]  # (N, D)
    v0b = v0_ref[0]  # (BQ, D)
    mask0 = mask0_ref[0, :, 0]  # (BQ,)
    mask1 = mask1_ref[0, 0, :]  # (N,)

    sim = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    # Masking by ADDITIVE bias (see _attention_kernel): one broadcast add on
    # the (BQ, N) tile covers BOTH directions — masked rows/columns carry
    # -1e9 and their exp underflows to an exact zero after the clamped max
    # subtraction, so no pair-mask multiply passes are needed.
    # (Masks arrive as f32-compatible ints; Mosaic only supports non-trivial
    # minor-dim insertion for 32-bit types, hence the f32 casts.)
    row_f = mask0.astype(jnp.float32)[:, None]  # (BQ, 1)
    col_f = mask1.astype(jnp.float32)[None, :]  # (1, N)
    sim = sim + ((row_f - 1.0) * 1e9 + (col_f - 1.0) * 1e9)

    # direction 0<-1: full row softmax (set-1 axis resident). The softmax
    # normalization is applied AFTER the AV matmul ((BQ,D) mults instead of
    # a (BQ,N) divide) — same VPU economy as _attention_kernel.
    rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), -1e4)
    e_row = jnp.exp(sim - rowmax)
    denom_row = jnp.sum(e_row, axis=-1, keepdims=True)
    m0 = jax.lax.dot_general(
        e_row.astype(v1.dtype), v1, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m0 = m0 * (row_f / (denom_row + 1e-30))
    m0_ref[0] = m0.astype(m0_ref.dtype)

    # direction 1<-0: online column softmax across q blocks
    @pl.when(i == 0)
    def _init():
        colmax_ref[0, :] = jnp.full_like(colmax_ref[0, :], -1e9)
        coldenom_ref[0, :] = jnp.zeros_like(coldenom_ref[0, :])
        colacc_ref[...] = jnp.zeros_like(colacc_ref)

    block_colmax = jnp.max(sim, axis=0)  # (N,)
    old_m = colmax_ref[0, :]
    # clamp at -1e4: if every row of this block is masked, e_col must
    # underflow to zero rather than exp(0) == 1
    new_m = jnp.maximum(jnp.maximum(old_m, block_colmax), -1e4)
    factor = jnp.exp(old_m - new_m)
    e_col = jnp.exp(sim - new_m[None, :])
    colacc_ref[...] = colacc_ref[...] * factor[:, None] + jax.lax.dot_general(
        e_col.astype(v0b.dtype), v0b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    coldenom_ref[0, :] = coldenom_ref[0, :] * factor + jnp.sum(e_col, axis=0)
    colmax_ref[0, :] = new_m

    @pl.when(i == n_steps - 1)
    def _finalize():
        m1 = colacc_ref[...] / (coldenom_ref[0, :][:, None] + 1e-30)
        m1_ref[0] = (m1 * mask1.astype(jnp.float32)[:, None]).astype(m1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _bidir_cross_bhnd(qk0, qk1, v0, v1, mask0, mask1, block_q=256, interpret=False):
    bh, m, d = qk0.shape
    n = qk1.shape[1]
    scale = d**-0.5
    m_p = _round_up(m, block_q)
    n_p = _round_up(n, 128)
    if m_p != m:
        qk0 = jnp.pad(qk0, ((0, 0), (0, m_p - m), (0, 0)))
        v0 = jnp.pad(v0, ((0, 0), (0, m_p - m), (0, 0)))
        mask0 = jnp.pad(mask0, ((0, 0), (0, m_p - m)))
    if n_p != n:
        qk1 = jnp.pad(qk1, ((0, 0), (0, n_p - n), (0, 0)))
        v1 = jnp.pad(v1, ((0, 0), (0, n_p - n), (0, 0)))
        mask1 = jnp.pad(mask1, ((0, 0), (0, n_p - n)))
    mask0_3 = mask0[:, :, None]
    mask1_3 = mask1[:, None, :]

    grid = (bh, m_p // block_q)
    m0, m1 = pl.pallas_call(
        functools.partial(_bidir_cross_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, m_p, d), qk0.dtype),
            jax.ShapeDtypeStruct((bh, n_p, d), qk1.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, n_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_p, d), lambda b, i: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n_p), jnp.float32),  # colmax
            pltpu.VMEM((1, n_p), jnp.float32),  # coldenom
            pltpu.VMEM((n_p, d), jnp.float32),  # colacc
        ],
        interpret=interpret,
        # the online column softmax accumulates across q-blocks
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qk0, qk1, v0, v1, mask0_3, mask1_3)
    return m0[:, :m], m1[:, :n]


def _bidir_cross_kernel_packed(
    qk0_ref, qk1_ref, v0_ref, v1_ref, mask0_ref, mask1_ref,
    m0_ref, m1_ref,
    colmax_ref, coldenom_ref, colacc_ref,
    *, scale, num_heads,
):
    """Packed-layout bidirectional cross attention: per-head channel slices,
    one similarity pass per head per tile (see _bidir_cross_kernel for the
    online column softmax scheme)."""
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    d_total = qk0_ref.shape[-1]
    dh = d_total // num_heads
    mask0 = mask0_ref[0, :, 0]
    mask1 = mask1_ref[0, 0, :]
    row_f = mask0.astype(jnp.float32)[:, None]
    col_f = mask1.astype(jnp.float32)[None, :]
    bias = (row_f - 1.0) * 1e9 + (col_f - 1.0) * 1e9

    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = qk0_ref[0, :, sl]
        k = qk1_ref[0, :, sl]
        v1 = v1_ref[0, :, sl]
        v0b = v0_ref[0, :, sl]

        sim = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        sim = sim + bias

        # direction 0<-1: full row softmax
        rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), -1e4)
        e_row = jnp.exp(sim - rowmax)
        denom_row = jnp.sum(e_row, axis=-1, keepdims=True)
        m0 = jax.lax.dot_general(
            e_row.astype(v1.dtype), v1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m0 = m0 * (row_f / (denom_row + 1e-30))
        m0_ref[0, :, sl] = m0.astype(m0_ref.dtype)

        # direction 1<-0: online column softmax across q blocks
        @pl.when(i == 0)
        def _init():
            colmax_ref[h, :] = jnp.full_like(colmax_ref[h, :], -1e9)
            coldenom_ref[h, :] = jnp.zeros_like(coldenom_ref[h, :])
            colacc_ref[:, sl] = jnp.zeros_like(colacc_ref[:, sl])

        block_colmax = jnp.max(sim, axis=0)
        old_m = colmax_ref[h, :]
        new_m = jnp.maximum(jnp.maximum(old_m, block_colmax), -1e4)
        factor = jnp.exp(old_m - new_m)
        e_col = jnp.exp(sim - new_m[None, :])
        colacc_ref[:, sl] = colacc_ref[:, sl] * factor[:, None] + jax.lax.dot_general(
            e_col.astype(v0b.dtype), v0b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        coldenom_ref[h, :] = coldenom_ref[h, :] * factor + jnp.sum(e_col, axis=0)
        colmax_ref[h, :] = new_m

        @pl.when(i == n_steps - 1)
        def _finalize():
            m1 = colacc_ref[:, sl] / (coldenom_ref[h, :][:, None] + 1e-30)
            m1_ref[0, :, sl] = (
                m1 * mask1.astype(jnp.float32)[:, None]
            ).astype(m1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "interpret"))
def _bidir_cross_packed_bnd(
    qk0, qk1, v0, v1, mask0, mask1, num_heads, block_q=256, interpret=False
):
    b, m, d_total = qk0.shape
    n = qk1.shape[1]
    scale = (d_total // num_heads) ** -0.5
    m_p = _round_up(m, block_q)
    n_p = _round_up(n, 128)
    if m_p != m:
        qk0 = jnp.pad(qk0, ((0, 0), (0, m_p - m), (0, 0)))
        v0 = jnp.pad(v0, ((0, 0), (0, m_p - m), (0, 0)))
        mask0 = jnp.pad(mask0, ((0, 0), (0, m_p - m)))
    if n_p != n:
        qk1 = jnp.pad(qk1, ((0, 0), (0, n_p - n), (0, 0)))
        v1 = jnp.pad(v1, ((0, 0), (0, n_p - n), (0, 0)))
        mask1 = jnp.pad(mask1, ((0, 0), (0, n_p - n)))
    mask0_3 = mask0[:, :, None]
    mask1_3 = mask1[:, None, :]

    grid = (b, m_p // block_q)
    m0, m1 = pl.pallas_call(
        functools.partial(
            _bidir_cross_kernel_packed, scale=scale, num_heads=num_heads
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m_p, d_total), qk0.dtype),
            jax.ShapeDtypeStruct((b, n_p, d_total), qk1.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_p, d_total), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_p, d_total), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, n_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_p, d_total), lambda b, i: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_heads, n_p), jnp.float32),
            pltpu.VMEM((num_heads, n_p), jnp.float32),
            pltpu.VMEM((n_p, d_total), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qk0, qk1, v0, v1, mask0_3, mask1_3)
    return m0[:, :m], m1[:, :n]


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "interpret"))
def _bidir_cross_stacked_bnd(qk, v, mask, num_heads, block_q=256, interpret=False):
    """Stacked-sets bidirectional cross attention: qk/v hold BOTH keypoint
    sets stacked on the batch axis ((2B, N, D); pair i is rows i and i+B).
    BlockSpec index maps read both halves from the SAME arrays — the two
    sets never get sliced apart in HBM. One kernel call per layer instead of
    per direction."""
    b2, n, d_total = qk.shape
    b = b2 // 2
    scale = (d_total // num_heads) ** -0.5
    n_p = _round_up(n, block_q)  # block_q is a multiple of 128
    if n_p != n:
        qk = jnp.pad(qk, ((0, 0), (0, n_p - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_p - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_p - n)))
    mask_q3 = mask[:, :, None]
    mask_k3 = mask[:, None, :]

    grid = (b, n_p // block_q)
    m0, m1 = pl.pallas_call(
        functools.partial(
            _bidir_cross_kernel_packed, scale=scale, num_heads=num_heads
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_p, d_total), qk.dtype),
            jax.ShapeDtypeStruct((b, n_p, d_total), qk.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_total), lambda i, j: (i, j, 0)),  # qk0
            pl.BlockSpec((1, n_p, d_total), lambda i, j: (i + b, 0, 0)),  # qk1
            pl.BlockSpec((1, block_q, d_total), lambda i, j: (i, j, 0)),  # v0
            pl.BlockSpec((1, n_p, d_total), lambda i, j: (i + b, 0, 0)),  # v1
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, n_p), lambda i, j: (i + b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_total), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_p, d_total), lambda i, j: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_heads, n_p), jnp.float32),
            pltpu.VMEM((num_heads, n_p), jnp.float32),
            pltpu.VMEM((n_p, d_total), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qk, qk, v, v, mask_q3, mask_k3)
    return m0[:, :n], m1[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_cross_attention_stacked(qk, v, mask=None, num_heads: int = 4):
    """Bidirectional cross attention over stacked sets (see
    _bidir_cross_stacked_bnd). Returns (m0, m1), each (B, N, D)."""
    b2, n, _ = qk.shape
    mk = jnp.ones((b2, n), jnp.int32) if mask is None else mask.astype(jnp.int32)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(n, 128))
    return _bidir_cross_stacked_bnd(
        qk, v, mk, num_heads, block_q=block_q, interpret=interpret
    )


def _fused_cross_stacked_fwd(qk, v, mask, num_heads):
    out = fused_cross_attention_stacked(qk, v, mask, num_heads)
    return out, (qk, v, mask)


def _fused_cross_stacked_bwd(num_heads, residuals, grads):
    qk, v, mask = residuals
    b = qk.shape[0] // 2
    mask0 = None if mask is None else mask[:b]
    mask1 = None if mask is None else mask[b:]
    to_h = lambda x: _packed_to_heads(x, num_heads)
    d0, d1, dv0, dv1, _, _ = _fused_cross_bwd(
        (to_h(qk[:b]), to_h(qk[b:]), to_h(v[:b]), to_h(v[b:]), mask0, mask1),
        (to_h(grads[0]), to_h(grads[1])),
    )
    dqk = jnp.concatenate([_heads_to_packed(d0), _heads_to_packed(d1)], 0)
    dv = jnp.concatenate([_heads_to_packed(dv0), _heads_to_packed(dv1)], 0)
    return dqk, dv, None


fused_cross_attention_stacked.defvjp(_fused_cross_stacked_fwd, _fused_cross_stacked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_cross_attention_packed(
    qk0, qk1, v0, v1, mask0=None, mask1=None, num_heads: int = 4
):
    """Bidirectional cross-attention on the packed (B, N, H*Dh) layout;
    heads stay channel slices end to end (see fused_cross_attention)."""
    b, m, _ = qk0.shape
    n = qk1.shape[1]
    mq = jnp.ones((b, m), jnp.int32) if mask0 is None else mask0.astype(jnp.int32)
    mk = jnp.ones((b, n), jnp.int32) if mask1 is None else mask1.astype(jnp.int32)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(m, 128))
    return _bidir_cross_packed_bnd(
        qk0, qk1, v0, v1, mq, mk, num_heads, block_q=block_q, interpret=interpret
    )


def _fused_cross_packed_fwd(qk0, qk1, v0, v1, mask0, mask1, num_heads):
    out = fused_cross_attention_packed(qk0, qk1, v0, v1, mask0, mask1, num_heads)
    return out, (qk0, qk1, v0, v1, mask0, mask1)


def _fused_cross_packed_bwd(num_heads, residuals, grads):
    qk0, qk1, v0, v1, mask0, mask1 = residuals
    h = num_heads
    to_h = lambda x: _packed_to_heads(x, h)
    d0, d1, dv0, dv1, _, _ = _fused_cross_bwd(
        (to_h(qk0), to_h(qk1), to_h(v0), to_h(v1), mask0, mask1),
        (to_h(grads[0]), to_h(grads[1])),
    )
    return (
        _heads_to_packed(d0), _heads_to_packed(d1),
        _heads_to_packed(dv0), _heads_to_packed(dv1), None, None,
    )


fused_cross_attention_packed.defvjp(_fused_cross_packed_fwd, _fused_cross_packed_bwd)


@jax.custom_vjp
def fused_cross_attention(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
):
    """Bidirectional cross-attention (LightGlue CrossBlock semantics): both
    directions share the projection, so sim(1->0) = sim(0->1)^T. The
    single-pass kernel computes the similarity ONCE per tile. The internal
    D^-1/2 scaling equals the reference's per-side D^-1/4 (lightglue.py:235).
    """
    b, h, m, d = qk0.shape
    n = qk1.shape[2]
    mq, mk = _flatten_masks(qk0, qk1, mask0, mask1)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(m, 128))
    m0, m1 = _bidir_cross_bhnd(
        qk0.reshape(b * h, m, d), qk1.reshape(b * h, n, d),
        v0.reshape(b * h, m, d), v1.reshape(b * h, n, d),
        mq, mk, block_q=block_q, interpret=interpret,
    )
    return m0.reshape(b, h, m, d), m1.reshape(b, h, n, d)


def _fused_cross_fwd(qk0, qk1, v0, v1, mask0, mask1):
    out = fused_cross_attention(qk0, qk1, v0, v1, mask0, mask1)
    return out, (qk0, qk1, v0, v1, mask0, mask1)


def _fused_cross_bwd(residuals, grads):
    """Backward via the two per-direction attention backward kernels."""
    qk0, qk1, v0, v1, mask0, mask1 = residuals
    g0, g1 = grads
    b, h, m, d = qk0.shape
    n = qk1.shape[2]
    mq, mk = _flatten_masks(qk0, qk1, mask0, mask1)
    interpret = jax.default_backend() != "tpu"

    def bwd(q, k, v, mq_, mk_, g, nq):
        blk = min(256, _round_up(nq, 128))
        return _fused_attention_bwd_bhnd(
            q.reshape(b * h, -1, d), k.reshape(b * h, -1, d),
            v.reshape(b * h, -1, d), mq_, mk_, g.reshape(b * h, -1, d),
            block_q=blk, interpret=interpret,
        )

    dq0a, dk1a, dv1 = bwd(qk0, qk1, v1, mq, mk, g0, m)
    dq1b, dk0b, dv0 = bwd(qk1, qk0, v0, mk, mq, g1, n)
    dqk0 = dq0a.reshape(b, h, m, d) + dk0b.reshape(b, h, m, d)
    dqk1 = dk1a.reshape(b, h, n, d) + dq1b.reshape(b, h, n, d)
    return (
        dqk0, dqk1, dv0.reshape(b, h, m, d), dv1.reshape(b, h, n, d), None, None
    )


fused_cross_attention.defvjp(_fused_cross_fwd, _fused_cross_bwd)


__all__ = [
    "fused_attention",
    "fused_cross_attention",
    "fused_attention_packed",
    "fused_cross_attention_packed",
]
