"""Pallas TPU kernel for the fused LightGlue match assignment.

The reference computes the assignment in several HBM-materialized steps
(gluefactory/models/matchers/lightglue.py:284-318): sim einsum, two
log_softmax passes, certainty add, padded-matrix assembly, then two more
full-matrix argmax reads inside filter_matches (:321-337). At M=N=1024 each
materialization is a 4 MB fp32 tensor per pair — the op is HBM-bound.

This kernel fuses the whole chain into two MXU passes over the similarity
tile (sim is never stored):

  pass A (stats):   sim block -> row logsumexp written per block; column
                    max/sumexp accumulated online in VMEM scratch across the
                    sequential M-block grid steps.
  pass B (write):   recompute the sim block (MXU FLOPs are free at this
                    size), emit the final padded log-assignment rows
                    including the dustbin column, plus the row-direction
                    max/argmax and the column-direction max/argmax
                    (accumulated online) that filter_matches needs — so the
                    (M+1)x(N+1) matrix is written ONCE and never re-read.

`filter_matches_from_stats` reproduces ops/assignment.filter_matches exactly
from the small per-row/per-column stats vectors.

Forward-only (inference): training recomputes assignments through the XLA
path in the loss, which keeps gradients defined.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # python float: jnp scalars would be captured as kernel constants


def _round_up(x, m):
    return -(-x // m) * m


def _stats_kernel(
    d0_ref, d1_ref, m0_ref, m1_ref,
    rowlse_ref, collse_ref,
    colmax_s, colsum_s,
):
    """Row logsumexp per M-block; online column logsumexp across blocks."""
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    d0 = d0_ref[0].astype(jnp.float32)  # (BQ, D)
    d1 = d1_ref[0].astype(jnp.float32)  # (N, D)
    row_f = m0_ref[0, :, 0].astype(jnp.float32)[:, None]  # (BQ, 1)
    col_f = m1_ref[0, 0, :].astype(jnp.float32)[None, :]  # (1, N)

    sim = jax.lax.dot_general(
        d0, d1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pair_f = row_f * col_f
    sim = sim * pair_f + _NEG * (1.0 - pair_f)

    # row logsumexp (N axis fully resident)
    rowmax = jnp.maximum(jnp.max(sim, axis=1, keepdims=True), _NEG)
    e_row = jnp.exp(sim - rowmax) * pair_f
    rowlse = jnp.log(jnp.maximum(jnp.sum(e_row, axis=1), 1e-30)) + rowmax[:, 0]
    rowlse_ref[0, :, 0] = rowlse

    # online column logsumexp
    @pl.when(i == 0)
    def _init():
        colmax_s[0, :] = jnp.full_like(colmax_s[0, :], _NEG)
        colsum_s[0, :] = jnp.zeros_like(colsum_s[0, :])

    bmax = jnp.max(sim, axis=0)  # (N,)
    old_m = colmax_s[0, :]
    new_m = jnp.maximum(old_m, bmax)
    factor = jnp.exp(old_m - new_m)
    e_col = jnp.exp(sim - new_m[None, :]) * pair_f
    colsum_s[0, :] = colsum_s[0, :] * factor + jnp.sum(e_col, axis=0)
    colmax_s[0, :] = new_m

    @pl.when(i == n_steps - 1)
    def _final():
        collse_ref[0, 0, :] = (
            jnp.log(jnp.maximum(colsum_s[0, :], 1e-30)) + colmax_s[0, :]
        )


def _write_kernel(
    d0_ref, d1_ref, z0_ref, z1_ref, m0_ref, m1_ref,
    rowlse_ref, collse_ref,
    out_ref, rowmax_ref, rowarg_ref, colmax_ref, colarg_ref,
    cmax_s, carg_s,
    *, m_valid, n_valid, block_q,
):
    """Write padded log-assignment rows; emit row/col max+argmax stats."""
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    d0 = d0_ref[0].astype(jnp.float32)
    d1 = d1_ref[0].astype(jnp.float32)
    z0 = z0_ref[0, :, 0]  # (BQ,)
    z1 = z1_ref[0, 0, :]  # (Np,)
    row_f = m0_ref[0, :, 0].astype(jnp.float32)[:, None]
    col_f = m1_ref[0, 0, :].astype(jnp.float32)[None, :]
    rowlse = rowlse_ref[0, :, 0]
    collse = collse_ref[0, 0, :]

    sim = jax.lax.dot_general(
        d0, d1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pair_f = row_f * col_f
    sim = sim * pair_f + _NEG * (1.0 - pair_f)

    cert = (jax.nn.log_sigmoid(z0) - rowlse)[:, None] + (
        jax.nn.log_sigmoid(z1) - collse
    )[None, :]
    inner = 2.0 * sim + cert
    inner = inner * pair_f + _NEG * (1.0 - pair_f)  # (BQ, Np)

    # row stats over the true N columns only
    rowmax = jnp.max(inner, axis=1)
    bq, npad = inner.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bq, npad), 1)
    big = jnp.int32(npad + 1)
    rowarg = jnp.min(
        jnp.where(inner >= rowmax[:, None], col_ids, big), axis=1
    )
    rowmax_ref[0, :, 0] = rowmax
    rowarg_ref[0, :, 0] = rowarg

    # online column stats (first-index argmax like torch/jnp.argmax)
    @pl.when(i == 0)
    def _init():
        cmax_s[0, :] = jnp.full_like(cmax_s[0, :], _NEG)
        carg_s[0, :] = jnp.zeros_like(carg_s[0, :])

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bq, npad), 0) + i * block_q
    bmax = jnp.max(inner, axis=0)
    barg = jnp.min(jnp.where(inner >= bmax[None, :], row_ids, jnp.int32(1 << 30)), axis=0)
    beats = bmax > cmax_s[0, :]
    cmax_s[0, :] = jnp.where(beats, bmax, cmax_s[0, :])
    carg_s[0, :] = jnp.where(beats, barg, carg_s[0, :])

    @pl.when(i == n_steps - 1)
    def _final_stats():
        colmax_ref[0, 0, :] = cmax_s[0, :]
        colarg_ref[0, 0, :] = carg_s[0, :]

    # assemble output rows: [inner | bin0 at col n_valid | NEG pad], and the
    # bin row at global row m_valid: [bin1 | 0 at corner | NEG pad]
    is_bin_col = col_ids == n_valid
    pad_col = col_ids > n_valid
    bin0 = jnp.where(row_f[:, 0] > 0, jax.nn.log_sigmoid(-z0), _NEG)
    rows = jnp.where(is_bin_col, bin0[:, None], inner)
    rows = jnp.where(pad_col, _NEG, rows)

    grow = jax.lax.broadcasted_iota(jnp.int32, (bq, npad), 0) + i * block_q
    is_bin_row = grow == m_valid
    bin1 = jnp.where(col_f[0, :] > 0, jax.nn.log_sigmoid(-z1), _NEG)
    bin_row_vals = jnp.where(
        is_bin_col, 0.0, jnp.where(pad_col, _NEG, bin1[None, :])
    )
    rows = jnp.where(is_bin_row, bin_row_vals, rows)
    rows = jnp.where(grow > m_valid, _NEG, rows)
    out_ref[0] = rows.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _fused_assignment_bnd(
    d0, d1, z0, z1, mask0, mask1, block_q: int = 256, interpret: bool = False
):
    """Core on (B, M, D)/(B, N, D) with (B, M)/(B, N) int32 masks.

    Returns scores (B, M+1, N+1) and filter stats
    (rowmax, rowarg (B, M); colmax, colarg (B, N)) over the inner block.
    """
    b, m, d = d0.shape
    n = d1.shape[1]
    # output includes the dustbin row/col -> pad M+1 rows up to blocks
    m_out = _round_up(m + 1, block_q)
    n_out = _round_up(n + 1, 128)
    pad0 = m_out - m
    pad1 = n_out - n
    d0 = jnp.pad(d0, ((0, 0), (0, pad0), (0, 0)))
    d1 = jnp.pad(d1, ((0, 0), (0, pad1), (0, 0)))
    z0p = jnp.pad(z0, ((0, 0), (0, pad0)))[:, :, None]
    z1p = jnp.pad(z1, ((0, 0), (0, pad1)))[:, None, :]
    mask0 = jnp.pad(mask0, ((0, 0), (0, pad0)))[:, :, None]
    mask1 = jnp.pad(mask1, ((0, 0), (0, pad1)))[:, None, :]

    grid = (b, m_out // block_q)
    semantics = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    rowlse, collse = pl.pallas_call(
        _stats_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, m_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_out), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, n_out, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n_out), jnp.float32),
            pltpu.VMEM((1, n_out), jnp.float32),
        ],
        compiler_params=semantics,
        interpret=interpret,
    )(d0, d1, mask0, mask1)

    scores, rowmax, rowarg, colmax, colarg = pl.pallas_call(
        functools.partial(
            _write_kernel, m_valid=m, n_valid=n, block_q=block_q
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m_out, n_out), jnp.float32),
            jax.ShapeDtypeStruct((b, m_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, m_out, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n_out), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_out), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, n_out, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, n_out), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, 1, n_out), lambda b_, i: (b_, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n_out), jnp.float32),
            pltpu.VMEM((1, n_out), jnp.int32),
        ],
        compiler_params=semantics,
        interpret=interpret,
    )(d0, d1, z0p, z1p, mask0, mask1, rowlse, collse)

    return (
        scores[:, : m + 1, : n + 1],
        rowmax[:, :m, 0],
        rowarg[:, :m, 0],
        colmax[:, 0, :n],
        colarg[:, 0, :n],
    )


def fused_log_assignment(
    mdesc0: jnp.ndarray,
    mdesc1: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
):
    """Fused sigmoid-log-double-softmax assignment (forward only).

    Args:
        mdesc0: (B, M, D) projected descriptors, ALREADY scaled by d**-0.25.
        mdesc1: (B, N, D) likewise.
        z0, z1: (B, M), (B, N) matchability logits.
        mask0, mask1: bool validity or None.
    Returns:
        scores (B, M+1, N+1) log assignment (== ops.assignment XLA path) and
        stats (rowmax, rowarg, colmax, colarg) for filter_matches_from_stats.
    """
    b, m, _ = mdesc0.shape
    n = mdesc1.shape[1]
    mask0 = jnp.ones((b, m), jnp.int32) if mask0 is None else mask0.astype(jnp.int32)
    mask1 = jnp.ones((b, n), jnp.int32) if mask1 is None else mask1.astype(jnp.int32)
    interpret = jax.default_backend() != "tpu"
    block_q = min(256, _round_up(m + 1, 128))
    return _fused_assignment_bnd(
        mdesc0, mdesc1, z0, z1, mask0, mask1,
        block_q=block_q, interpret=interpret,
    )


def filter_matches_from_stats(
    rowmax: jnp.ndarray,
    rowarg: jnp.ndarray,
    colmax: jnp.ndarray,
    colarg: jnp.ndarray,
    th: float,
) -> Tuple[jnp.ndarray, ...]:
    """ops.assignment.filter_matches from per-row/col stats — no re-read of
    the (M+1)x(N+1) matrix."""
    m0, m1 = rowarg, colarg
    indices0 = jnp.arange(m0.shape[1])[None]
    indices1 = jnp.arange(m1.shape[1])[None]
    mutual0 = indices0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = indices1 == jnp.take_along_axis(m0, m1, axis=1)
    max0_exp = jnp.exp(rowmax)
    mscores0 = jnp.where(mutual0, max0_exp, 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    m0 = jnp.where(valid0, m0, -1).astype(jnp.int32)
    m1 = jnp.where(valid1, m1, -1).astype(jnp.int32)
    return m0, m1, mscores0, mscores1


__all__ = ["fused_log_assignment", "filter_matches_from_stats"]
