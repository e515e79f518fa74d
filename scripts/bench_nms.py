"""NMS implementation shootout at bench shape (8,480,640) bf16."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models.extractors.superpoint_open import simple_nms

B, H, W = 8, 480, 640
R = 4


def timed(fn, *args, iters=30, warmup=2, label=""):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {ms:7.3f} ms", flush=True)
    return ms


def shift_max_1d(x, radius, axis):
    """Max over a (2r+1) window via log-tree of shifted maxes with -inf edges.

    pad+static slices instead of roll (no wraparound); tree doubling:
    m_k = max over window [0, 2^k); combine to reach 2r+1 = 9: window 9 =
    max(m8[i-4... ]) — simpler: do r steps of doubling then one final merge.
    """
    # build running max of length L=2r+1 anchored left: f[i] = max x[i : i+L]
    # via doubling: g1=x; g2=max(g1, shift(g1,1)); g4=max(g2, shift(g2,2)); g8=max(g4, shift(g4,4)); g9=max(g8, shift(g1,8))
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 2 * radius)
    xp = jnp.pad(x, pad, constant_values=-jnp.inf)

    def shift(a, k):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(k, k + x.shape[axis] + (a.shape[axis] - x.shape[axis] - k))
        return a[tuple(idx)]

    g = xp
    total = 1
    L = 2 * radius + 1
    while total * 2 <= L:
        g = jnp.maximum(g, shift_pad(g, total, axis))
        total *= 2
    if total < L:
        g = jnp.maximum(g, shift_pad(g, L - total, axis))
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, x.shape[axis])
    # f[i] = max x[i:i+L]; we want centered: c[i] = max x[i-r:i+r+1] = f[i-r]
    # with the (0,2r) right pad, f[i-r] for i<r reads x[<0] → use left pad r instead
    return g[tuple(idx)]


def shift_pad(a, k, axis):
    """a shifted left by k along axis, -inf filled (same shape)."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, k)
    ap = jnp.pad(a, pad, constant_values=-jnp.inf)
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(k, k + a.shape[axis])
    return ap[tuple(idx)]


def max_pool_shift(x, radius):
    """(B,H,W) centered (2r+1)^2 max via shift trees on both axes."""
    L = 2 * radius + 1

    def axis_max(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (radius, radius)
        ap = jnp.pad(a, pad, constant_values=-jnp.inf)
        g = ap
        total = 1
        while total * 2 <= L:
            g = jnp.maximum(g, shift_pad(g, total, axis))
            total *= 2
        if total < L:
            g = jnp.maximum(g, shift_pad(g, L - total, axis))
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(0, a.shape[axis])
        return g[tuple(idx)]

    return axis_max(axis_max(x, 1), 2)


def nms_shift(scores, radius, iterations=2):
    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool_shift(scores, radius)
    for _ in range(iterations):
        supp_mask = max_pool_shift(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool_shift(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def main():
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.rand(B, H, W), jnp.bfloat16)

    a = jax.jit(lambda x: simple_nms(x, R))(s)
    b = jax.jit(lambda x: nms_shift(x, R))(s)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"nms_shift vs simple_nms max err: {err:.2e}", flush=True)

    def f_cur(x):
        return simple_nms(x, R).astype(jnp.float32).sum()

    def f_new(x):
        return nms_shift(x, R).astype(jnp.float32).sum()

    def noop(x):
        return x[0, 0, 0] + 1.0

    for rep in range(2):
        timed(f_cur, s, label=f"[{rep}] simple_nms (reduce_window)")
        timed(f_new, s, label=f"[{rep}] nms_shift (pad+slice tree)")
    timed(noop, s, label="noop floor")


if __name__ == "__main__":
    main()
