"""Match assignment ops: sigmoid log double-softmax scores and match filtering.

Counterpart of reference lightglue.py:284-337 (sigmoid_log_double_softmax,
filter_matches), extended with explicit validity masks for the static-shape
TPU regime: padded rows/columns never receive or emit probability mass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # finite ninf: keeps softmax/log well-defined on padded rows


def masked_log_softmax(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int) -> jnp.ndarray:
    """log_softmax that excludes masked entries and stays finite on empty rows."""
    if mask is None:
        return jax.nn.log_softmax(x, axis=axis)
    x = jnp.where(mask, x, _NEG_INF)
    m = jnp.max(x, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask, jnp.exp(x - m), 0.0)
    lse = jnp.log(jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-30)) + m
    return jnp.where(mask, x - lse, _NEG_INF)


def sigmoid_log_double_softmax(
    sim: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Log assignment matrix (B, M+1, N+1) from similarity + matchability.

    scores[:, :M, :N] = log_softmax(sim, rows) + log_softmax(sim, cols)
                        + logsigmoid(z0) + logsigmoid(z1)^T
    last column / row  = logsigmoid(-z0) / logsigmoid(-z1)   (unmatched bins)
    (reference lightglue.py:284-296). Padded keypoints (mask=False) get
    _NEG_INF scores everywhere including their dustbin entry.
    """
    b, m, n = sim.shape
    pair = None
    if mask0 is not None and mask1 is not None:
        pair = mask0[:, :, None] & mask1[:, None, :]
    certainties = jax.nn.log_sigmoid(z0) + jax.nn.log_sigmoid(z1).transpose(0, 2, 1)
    scores0 = masked_log_softmax(sim, pair, axis=2)
    scores1 = masked_log_softmax(sim, pair, axis=1)
    inner = scores0 + scores1 + certainties
    if pair is not None:
        inner = jnp.where(pair, inner, _NEG_INF)

    scores = jnp.zeros((b, m + 1, n + 1), dtype=sim.dtype)
    scores = scores.at[:, :m, :n].set(inner)
    bin0 = jax.nn.log_sigmoid(-z0[..., 0])
    bin1 = jax.nn.log_sigmoid(-z1[..., 0])
    if mask0 is not None:
        bin0 = jnp.where(mask0, bin0, _NEG_INF)
    if mask1 is not None:
        bin1 = jnp.where(mask1, bin1, _NEG_INF)
    scores = scores.at[:, :-1, -1].set(bin0)
    scores = scores.at[:, -1, :-1].set(bin1)
    return scores


def filter_matches(scores: jnp.ndarray, th: float) -> Tuple[jnp.ndarray, ...]:
    """Mutual-argmax + threshold matches from a log assignment matrix
    (B, M+1, N+1) (reference lightglue.py:321-337).

    Returns m0 (B, M) int32 with -1 for unmatched, m1 (B, N), and the
    matching scores (exp of the log-assignment at the chosen entries).
    """
    inner = scores[:, :-1, :-1]
    m0 = jnp.argmax(inner, axis=2)
    m1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)
    indices0 = jnp.arange(m0.shape[1])[None]
    indices1 = jnp.arange(m1.shape[1])[None]
    mutual0 = indices0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = indices1 == jnp.take_along_axis(m0, m1, axis=1)
    max0_exp = jnp.exp(max0)
    mscores0 = jnp.where(mutual0, max0_exp, 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    m0 = jnp.where(valid0, m0, -1).astype(jnp.int32)
    m1 = jnp.where(valid1, m1, -1).astype(jnp.int32)
    return m0, m1, mscores0, mscores1


__all__ = ["masked_log_softmax", "sigmoid_log_double_softmax", "filter_matches"]
