"""Attention ops for the matcher transformer.

The reference relies on FlashAttention via torch SDPA
(gluefactory/models/matchers/lightglue.py:139-156) and materializes the cross
similarity twice (lightglue.py:236-242). Here:

  - `self_attention`: masked multi-head SDPA with rotary position encoding
    applied to q/k; XLA path fuses well at LightGlue sizes (n<=4096, d=64).
  - `bidirectional_cross_attention`: both directions from ONE similarity
    matrix — sim is computed once, softmaxed over rows (0->1) and columns
    (1->0); this halves the QK^T FLOPs compared to two SDPA calls.

Each op has a Pallas TPU kernel (ops/pallas_attention.py) selected via
`impl="pallas"`; the XLA path doubles as the numerics reference for kernel
tests and as the CPU fallback.

All shapes are static; masks are boolean with True = valid token.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation used by rotary embeddings
    (lightglue.py:36-39): (x1, x2) -> (-x2, x1) per feature pair."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def apply_rotary(t: jnp.ndarray, encoding: jnp.ndarray) -> jnp.ndarray:
    """Apply a cached rotary embedding `encoding` of shape (2, ..., N, D) to
    features t (..., N, D): t*cos + rotate_half(t)*sin (lightglue.py:42-43)."""
    return t * encoding[0] + rotate_half(t) * encoding[1]


def _sdpa(q, k, v, mask, compute_dtype=jnp.float32):
    """Masked scaled-dot-product attention on (..., H, N, Dh) tensors."""
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum(
        "...id,...jd->...ij", q, k, preferred_element_type=compute_dtype
    ) * scale
    if mask is not None:
        sim = jnp.where(mask, sim, -jnp.inf)
    attn = jax.nn.softmax(sim, axis=-1)
    if mask is not None:
        # rows with no valid key produce NaN after softmax -> zero them
        attn = jnp.where(jnp.any(mask, axis=-1, keepdims=True), attn, 0.0)
    return jnp.einsum(
        "...ij,...jd->...id", attn.astype(v.dtype), v,
        preferred_element_type=compute_dtype,
    ).astype(v.dtype)


def self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention over one keypoint set.

    Args:
        q, k, v: (B, H, N, Dh); rotary encoding already applied to q/k.
        mask: (B, N) bool validity of tokens, or None.
        impl: "xla" | "pallas".
    Returns (B, H, N, Dh).
    """
    attn_mask = None
    if mask is not None:
        attn_mask = (mask[:, None, :, None] & mask[:, None, None, :])
    if impl == "pallas":
        from .pallas_attention import fused_attention

        # kernel I/O stays f32: at head_dim 64 the bf16 (16,128) tile layout
        # forces lane-padding relayouts that cost more than the MXU saves
        # (measured on v5e-class hw); the surrounding dense ops run bf16.
        out = fused_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            mask, mask,
        )
        return out.astype(q.dtype)
    return _sdpa(q, k, v, attn_mask)


def cross_attention_bidirectional(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    impl: str = "xla",
):
    """Bidirectional cross-attention with a single similarity computation.

    LightGlue's CrossBlock shares the q/k projection between both images
    (lightglue.py:203,223), so sim(0->1) = sim(1->0)^T. We exploit that:
    one einsum produces sim; softmax over axis -1 gives messages into set 0,
    softmax over axis -2 gives messages into set 1.

    Args:
        qk0: (B, H, M, Dh), qk1: (B, H, N, Dh) — already scaled is NOT assumed,
            we scale by Dh^-1/2 internally (split as Dh^-1/4 per side like the
            reference for fp16 safety, lightglue.py:235).
        v0: (B, H, M, Dh), v1: (B, H, N, Dh).
        mask0: (B, M), mask1: (B, N).
    Returns:
        m0 (B, H, M, Dh): messages for set 0 (attending over set 1),
        m1 (B, H, N, Dh): messages for set 1 (attending over set 0).
    """
    if impl == "pallas":
        from .pallas_attention import fused_cross_attention

        f32 = jnp.float32
        m0, m1 = fused_cross_attention(
            qk0.astype(f32), qk1.astype(f32), v0.astype(f32), v1.astype(f32),
            mask0, mask1,
        )
        return m0.astype(qk0.dtype), m1.astype(qk1.dtype)
    s = qk0.shape[-1] ** -0.25
    sim = jnp.einsum(
        "...id,...jd->...ij", qk0 * s, qk1 * s, preferred_element_type=jnp.float32
    )  # (B, H, M, N)
    if mask0 is not None and mask1 is not None:
        pair = mask0[:, None, :, None] & mask1[:, None, None, :]
        sim = jnp.where(pair, sim, -jnp.inf)
    attn01 = jax.nn.softmax(sim, axis=-1)
    attn10 = jax.nn.softmax(sim, axis=-2)
    if mask0 is not None and mask1 is not None:
        attn01 = jnp.where(jnp.any(pair, axis=-1, keepdims=True), attn01, 0.0)
        attn10 = jnp.where(jnp.any(pair, axis=-2, keepdims=True), attn10, 0.0)
    m0 = jnp.einsum(
        "...ij,...jd->...id", attn01.astype(v1.dtype), v1,
        preferred_element_type=jnp.float32,
    ).astype(v1.dtype)
    m1 = jnp.einsum(
        "...ij,...id->...jd", attn10.astype(v0.dtype), v0,
        preferred_element_type=jnp.float32,
    ).astype(v0.dtype)
    return m0, m1


def masked_attention(q, k, v, mask_q=None, mask_k=None, impl: str = "xla"):
    """General attention with independent query/key validity masks
    (cross-set attention where the two sets have different padding)."""
    if impl == "pallas":
        from .pallas_attention import fused_attention

        return fused_attention(q, k, v, mask_q, mask_k)
    attn_mask = None
    if mask_q is not None or mask_k is not None:
        b, _, nq, _ = q.shape
        nk = k.shape[2]
        mq = jnp.ones((b, nq), bool) if mask_q is None else mask_q
        mk = jnp.ones((b, nk), bool) if mask_k is None else mask_k
        attn_mask = mq[:, None, :, None] & mk[:, None, None, :]
    out = _sdpa(q, k, v, attn_mask)
    if mask_q is not None:
        out = out * mask_q[:, None, :, None]
    return out


def self_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    num_heads: int = 4,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention on the packed (B, N, H*Dh) layout.

    Heads stay channel slices end to end: the Pallas kernel loops over head
    slices in-register, so neither side pays the (B, H, N, Dh) relayout that
    the per-head entry needs (~12 transposes per LightGlue layer).
    """
    if impl == "pallas":
        from .pallas_attention import fused_attention_packed

        # I/O stays in the activation dtype: bf16 flows straight through
        # (softmax statistics are f32 inside the kernel) — the counterpart of
        # the reference's half-cast attention (lightglue.py:143,483-485)
        return fused_attention_packed(q, k, v, mask, mask, num_heads)
    b, n, d = q.shape
    to_h = lambda x: x.reshape(b, -1, num_heads, d // num_heads).transpose(0, 2, 1, 3)
    attn_mask = None
    if mask is not None:
        attn_mask = mask[:, None, :, None] & mask[:, None, None, :]
    out = _sdpa(to_h(q), to_h(k), to_h(v), attn_mask)
    return out.transpose(0, 2, 1, 3).reshape(b, n, d)


def cross_attention_bidirectional_packed(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    num_heads: int = 4,
    impl: str = "xla",
):
    """Bidirectional cross-attention on the packed (B, N, H*Dh) layout
    (see cross_attention_bidirectional / self_attention_packed)."""
    if impl == "pallas":
        from .pallas_attention import fused_cross_attention_packed

        return fused_cross_attention_packed(
            qk0, qk1, v0, v1, mask0, mask1, num_heads
        )
    b, m, d = qk0.shape
    n = qk1.shape[1]
    to_h = lambda x: x.reshape(b, -1, num_heads, d // num_heads).transpose(0, 2, 1, 3)
    m0, m1 = cross_attention_bidirectional(
        to_h(qk0), to_h(qk1), to_h(v0), to_h(v1), mask0, mask1, impl="xla"
    )
    back = lambda x, nn_: x.transpose(0, 2, 1, 3).reshape(b, nn_, d)
    return back(m0, m), back(m1, n)


def cross_attention_bidirectional_stacked(
    qk: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    num_heads: int = 4,
    impl: str = "xla",
):
    """Bidirectional cross-attention with BOTH sets stacked on the batch axis
    (pair i = rows i and i+B of (2B, N, D) tensors). The Pallas path reads
    the two halves via BlockSpec index maps — no slicing in HBM, one kernel
    call per layer. Returns (m0, m1), each (B, N, D)."""
    if impl == "pallas":
        from .pallas_attention import fused_cross_attention_stacked

        return fused_cross_attention_stacked(qk, v, mask, num_heads)
    b = qk.shape[0] // 2
    mask0 = None if mask is None else mask[:b]
    mask1 = None if mask is None else mask[b:]
    return cross_attention_bidirectional_packed(
        qk[:b], qk[b:], v[:b], v[b:], mask0, mask1, num_heads=num_heads, impl="xla"
    )


@partial(jax.jit, static_argnames=())
def reference_self_attention(q, k, v, mask=None):
    """Jitted XLA reference used by Pallas kernel tests."""
    return self_attention(q, k, v, mask, impl="xla")


__all__ = [
    "rotate_half",
    "apply_rotary",
    "self_attention",
    "cross_attention_bidirectional",
    "self_attention_packed",
    "cross_attention_bidirectional_packed",
    "cross_attention_bidirectional_stacked",
]
