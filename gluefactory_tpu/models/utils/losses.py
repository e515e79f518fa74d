"""Assignment NLL loss for matchers.

Counterpart of reference gluefactory/models/utils/losses.py:6-73: balanced
negative log-likelihood over the (M+1)x(N+1) log-assignment matrix with GT
weights built from gt_assignment / gt_matches (-1 rows/cols feed the dustbin
terms; -2 entries contribute nothing).
"""

from __future__ import annotations

import jax.numpy as jnp


def nll_weights(log_assignment: jnp.ndarray, data) -> jnp.ndarray:
    """Build the (B, M+1, N+1) weight matrix from GT labels
    (reference losses.py:62-73)."""
    gt_assignment = data["gt_assignment"].astype(jnp.float32)
    b, m, n = gt_assignment.shape
    neg0 = (data["gt_matches0"] == -1).astype(jnp.float32)
    neg1 = (data["gt_matches1"] == -1).astype(jnp.float32)
    weights = jnp.zeros_like(log_assignment)
    weights = weights.at[:, :m, :n].set(gt_assignment)
    weights = weights.at[:, :m, -1].set(neg0)
    weights = weights.at[:, -1, :n].set(neg1)
    return weights


def weight_loss(log_assignment: jnp.ndarray, weights: jnp.ndarray):
    """Split weighted NLL into positive / negative parts
    (reference losses.py:6-25)."""
    m = log_assignment.shape[-2] - 1
    n = log_assignment.shape[-1] - 1
    loss_sc = log_assignment * weights

    num_neg0 = jnp.maximum(weights[:, :m, -1].sum(-1), 1.0)
    num_neg1 = jnp.maximum(weights[:, -1, :n].sum(-1), 1.0)
    num_pos = jnp.maximum(weights[:, :m, :n].sum((-1, -2)), 1.0)

    nll_pos = -loss_sc[:, :m, :n].sum((-1, -2)) / num_pos
    nll_neg0 = -loss_sc[:, :m, -1].sum(-1)
    nll_neg1 = -loss_sc[:, -1, :n].sum(-1)
    nll_neg = (nll_neg0 + nll_neg1) / (num_neg0 + num_neg1)
    return nll_pos, nll_neg, num_pos, (num_neg0 + num_neg1) / 2.0


def nll_loss(pred, data, weights=None, nll_balancing: float = 0.5):
    """Balanced assignment NLL (reference NLLLoss.forward, losses.py:39-60).

    Returns (nll (B,), weights, metrics dict).
    """
    log_assignment = pred["log_assignment"]
    if weights is None:
        weights = nll_weights(log_assignment, data)
    nll_pos, nll_neg, num_pos, num_neg = weight_loss(log_assignment, weights)
    nll = nll_balancing * nll_pos + (1 - nll_balancing) * nll_neg
    return (
        nll,
        weights,
        {
            "assignment_nll": nll,
            "nll_pos": nll_pos,
            "nll_neg": nll_neg,
            "num_matchable": num_pos,
            "num_unmatchable": num_neg,
        },
    )


__all__ = ["nll_loss", "nll_weights", "weight_loss"]
