"""Batched small-matrix eigensolver for the RANSAC hot path.

XLA's generic `eigh` on TPU lowers to an iterative routine that is slow for
thousands of tiny (9x9) problems and weak in fp32 near-degenerate spectra.
This module implements a fixed-sweep cyclic Jacobi eigensolver as pure
batched jnp — rotations are applied to ALL matrices in the batch
simultaneously with vectorized elementwise algebra (no per-matrix LAPACK
loop), which is exactly the shape TPUs like.

Used by the DLT/8-point null-space solves (smallest eigenvector of A^T A).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(A: jnp.ndarray, sweeps: int = 10):
    """Eigendecomposition of symmetric (..., n, n) matrices by cyclic Jacobi.

    Returns (eigenvalues (..., n) ascending, eigenvectors (..., n, n) with
    columns as vectors). n is static and small (<= ~16).
    """
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def rotate(carry, pq):
        A, V = carry
        p, q = pq
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # stable Jacobi rotation angle
        tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
        c = (1.0 / jnp.sqrt(1.0 + t * t))[..., None]
        s = (t / jnp.sqrt(1.0 + t * t))[..., None]

        # apply rotation to rows/cols p and q of A and columns of V
        Ap = A[..., p, :]
        Aq = A[..., q, :]
        A = A.at[..., p, :].set(c * Ap - s * Aq)
        A = A.at[..., q, :].set(s * Ap + c * Aq)
        Ap = A[..., :, p]
        Aq = A[..., :, q]
        A = A.at[..., :, p].set(c * Ap - s * Aq)
        A = A.at[..., :, q].set(s * Ap + c * Aq)
        Vp = V[..., :, p]
        Vq = V[..., :, q]
        V = V.at[..., :, p].set(c * Vp - s * Vq)
        V = V.at[..., :, q].set(s * Vp + c * Vq)
        return (A, V), None

    def sweep(carry, _):
        for pq in pairs:  # unrolled: n(n-1)/2 rotations, n static
            carry, _ = rotate(carry, pq)
        return carry, None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
    evals = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(evals, axis=-1)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return evals, V


def smallest_eigenvector(A: jnp.ndarray, sweeps: int = 10) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric (..., n, n)."""
    _, V = jacobi_eigh(A, sweeps=sweeps)
    return V[..., :, 0]


__all__ = ["jacobi_eigh", "smallest_eigenvector"]


def svd3x3(A: jnp.ndarray, sweeps: int = 8):
    """SVD of batched 3x3 matrices via Jacobi eigendecomposition of A^T A.

    Tailored to (near-)rank-2 inputs like essential matrices: the smallest
    left singular vector is recovered as u0 x u1 (always well-defined for
    rank >= 2), avoiding the 0/0 of A v / s. Returns (U, s, Vt) with s
    descending and U, V proper orthonormal (det sign NOT enforced).
    """
    AtA = jnp.einsum("...ki,...kj->...ij", A, A, precision="highest")
    evals, V = jacobi_eigh(AtA, sweeps=sweeps)  # ascending
    # descending order
    evals = evals[..., ::-1]
    V = V[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(evals, 0.0))
    u0 = jnp.einsum("...ij,...j->...i", A, V[..., :, 0], precision="highest") / jnp.maximum(
        s[..., 0:1], 1e-12
    )
    u1 = jnp.einsum("...ij,...j->...i", A, V[..., :, 1], precision="highest") / jnp.maximum(
        s[..., 1:2], 1e-12
    )
    # re-orthonormalize u1 against u0 (fp noise), then complete the frame
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-12)
    u2 = jnp.cross(u0, u1)
    # resolve the cross-product sign against A v2 (only matters when s2 > 0)
    av2 = jnp.einsum("...ij,...j->...i", A, V[..., :, 2], precision="highest")
    sign = jnp.where(jnp.sum(av2 * u2, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    u2 = u2 * sign
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)
