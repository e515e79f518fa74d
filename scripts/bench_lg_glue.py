"""Attribute LightGlue's non-kernel 'glue' time at bench shapes.

Round-3: matmuls 2.08 + kernels 6.76 = 8.83 vs full 12.18 -> glue ~3.3 ms.
Suspects: FFN concat materialization, exact-erf GELU, fp32 LN, ref_descriptor
collection in inference, final assignment+filter.
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

from gluefactory_tpu.models import get_model

B, N, D = 8, 1024, 256


def timed(fn, *args, iters=30, warmup=2, label=""):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:46s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 500, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, N, 2) * 500, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, D), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, N, D), jnp.float32),
        "view0": {"image_size": jnp.asarray([[640.0, 480.0]] * B)},
        "view1": {"image_size": jnp.asarray([[640.0, 480.0]] * B)},
    }
    matcher = get_model("lightglue").from_conf({"filter_threshold": 0.1, "mp": True})
    mv = matcher.init(jax.random.PRNGKey(0), data)

    def full(v, d):
        out = matcher.apply(v, d)
        return out["matching_scores0"].sum()

    def no_assign(v, d):
        # run scan layers only via ref_descriptors (cheap sum epilogue)
        out = matcher.apply(v, d)
        return out["ref_descriptors0"][:, -1].astype(jnp.float32).sum()

    timed(jax.jit(full), mv, data, label="lightglue full")

    # GELU variants on the FFN shape
    x = jnp.asarray(rng.randn(2 * B, N, 2 * D), jnp.bfloat16)

    def g_exact(x):
        return jax.nn.gelu(x, approximate=False).astype(jnp.float32).sum()

    def g_tanh(x):
        return jax.nn.gelu(x, approximate=True).astype(jnp.float32).sum()

    timed(jax.jit(g_exact), x, label="gelu exact erf (2B,N,512) x1")
    timed(jax.jit(g_tanh), x, label="gelu tanh       (2B,N,512) x1")

    # concat+dense vs split dense
    w1 = jnp.asarray(rng.randn(2 * D, 2 * D) * 0.05, jnp.bfloat16)
    xa = jnp.asarray(rng.randn(2 * B, N, D), jnp.bfloat16)
    xb = jnp.asarray(rng.randn(2 * B, N, D), jnp.bfloat16)

    def f_concat(xa, xb, w1):
        y = jnp.einsum("...d,de->...e", jnp.concatenate([xa, xb], -1), w1)
        return y.astype(jnp.float32).sum()

    def f_split(xa, xb, w1):
        y = jnp.einsum("...d,de->...e", xa, w1[:D]) + jnp.einsum(
            "...d,de->...e", xb, w1[D:]
        )
        return y.astype(jnp.float32).sum()

    timed(jax.jit(f_concat), xa, xb, w1, iters=50, label="ffn1 concat+dense x1")
    timed(jax.jit(f_split), xa, xb, w1, iters=50, label="ffn1 split dense   x1")

    # layernorm fp32 vs bf16-native
    s = jnp.ones((2 * D,), jnp.float32)
    bb = jnp.zeros((2 * D,), jnp.float32)

    def ln32(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * s + bb).astype(x.dtype).astype(jnp.float32).sum()

    timed(jax.jit(ln32), x, iters=50, label="layernorm fp32-stats x1")

    def noop(x):
        return x[0, 0, 0] + 1.0

    timed(jax.jit(noop), x, label="noop floor")


if __name__ == "__main__":
    main()
