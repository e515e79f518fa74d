"""Lower-bound experiment for LightGlue layer time.

Times (a) the 18 per-layer dense matmuls alone, (b) the 3 attention kernel
calls alone, (c) matmuls+kernels+rotary+LN+gelu chained like the real layer
— all x9 layers in one jit. Gap between (a)+(b) and the real 12 ms tells how
much a fused megakernel could reclaim.
"""

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

from gluefactory_tpu.ops.pallas_attention import (
    fused_attention_packed,
    fused_cross_attention_packed,
)

B, N, D, H, L = 8, 1024, 256, 4, 9
DT = jnp.bfloat16


def timed(fn, *args, iters=20):
    for _ in range(2):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, N, D) * 0.1, DT)
    x1 = jnp.asarray(rng.randn(B, N, D) * 0.1, DT)
    Wqkv = jnp.asarray(rng.randn(L, D, 3 * D) * 0.05, DT)
    Wo = jnp.asarray(rng.randn(L, D, D) * 0.05, DT)
    W1 = jnp.asarray(rng.randn(L, 2 * D, 2 * D) * 0.05, DT)
    W2 = jnp.asarray(rng.randn(L, 2 * D, D) * 0.05, DT)
    Wqk = jnp.asarray(rng.randn(L, D, D) * 0.05, DT)
    Wv = jnp.asarray(rng.randn(L, D, D) * 0.05, DT)
    enc = jnp.asarray(rng.randn(2, B, N, D) * 0.1, DT)

    @jax.jit
    def matmuls_only(x0, x1):
        def layer(carry, i):
            a, b = carry
            for x in (a, b):  # self-ish matmuls per set
                qkv = x @ Wqkv[i]
                m = qkv[..., :D] @ Wo[i]
                y = jnp.concatenate([x, m], -1) @ W1[i]
                _ = y @ W2[i]
            qk0, qk1 = a @ Wqk[i], b @ Wqk[i]
            v0, v1 = a @ Wv[i], b @ Wv[i]
            m0 = qk0 @ Wo[i]
            m1 = qk1 @ Wo[i]
            a = a + (jnp.concatenate([a, m0], -1) @ W1[i]) @ W2[i]
            b = b + (jnp.concatenate([b, m1], -1) @ W1[i]) @ W2[i]
            return (a, b), ()

        (a, b), _ = jax.lax.scan(layer, (x0, x1), jnp.arange(L))
        return (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum())

    @jax.jit
    def kernels_only(x0, x1):
        def layer(carry, i):
            a, b = carry
            f32 = jnp.float32
            a2 = fused_attention_packed(
                a.astype(f32), a.astype(f32), a.astype(f32), None, None, H
            ).astype(DT)
            b2 = fused_attention_packed(
                b.astype(f32), b.astype(f32), b.astype(f32), None, None, H
            ).astype(DT)
            m0, m1 = fused_cross_attention_packed(
                a2.astype(f32), b2.astype(f32), a2.astype(f32), b2.astype(f32),
                None, None, H,
            )
            return (a + m0.astype(DT) * 0.01, b + m1.astype(DT) * 0.01), ()

        (a, b), _ = jax.lax.scan(layer, (x0, x1), jnp.arange(L))
        return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

    t_mm = timed(matmuls_only, x0, x1)
    t_k = timed(kernels_only, x0, x1)
    print(f"matmuls only (9L)   {t_mm:7.2f} ms", flush=True)
    print(f"kernels only (9L)   {t_k:7.2f} ms", flush=True)
    print(f"sum                 {t_mm + t_k:7.2f} ms  (real LightGlue: ~12.1)", flush=True)


if __name__ == "__main__":
    main()
