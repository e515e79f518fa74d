"""Per-block timing: plain VGG block vs s2d block with ALL glue included
(pad, mask, BN affine, relu, pool / group-max, layout transforms)."""

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
from flax import linen as nn

from gluefactory_tpu.models.extractors.superpoint_open import (
    _space_to_depth,
    s2d_conv,
)

B = 8
DT = jnp.bfloat16


def timed(fn, *args, iters=20):
    for _ in range(2):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_block(h, w, cin, c, label):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, h, w, cin), DT)
    w1 = jnp.asarray(rng.randn(3, 3, cin, c) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.float32)
    b1 = jnp.zeros((c,), jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    mul = jnp.ones((c,), jnp.float32)
    add = jnp.zeros((c,), jnp.float32)

    @jax.jit
    def plain(x):
        def conv(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w.astype(DT), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b.astype(DT)

        y = jax.nn.relu(conv(x, w1, b1)) * mul.astype(DT) + add.astype(DT)
        y = jax.nn.relu(conv(y, w2, b2)) * mul.astype(DT) + add.astype(DT)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return y.astype(jnp.float32).sum()

    @jax.jit
    def s2d(x):
        xs = _space_to_depth(x)
        y = s2d_conv(xs, w1.astype(DT), b1.astype(DT), "p0_to_p1")
        y = jax.nn.relu(y) * jnp.tile(mul, 4).astype(DT) + jnp.tile(add, 4).astype(DT)
        y = s2d_conv(y, w2.astype(DT), b2.astype(DT), "p1_to_p0")
        y = jax.nn.relu(y) * jnp.tile(mul, 4).astype(DT) + jnp.tile(add, 4).astype(DT)
        bb, hh, ww, _ = y.shape
        y = y.reshape(bb, hh, ww, 2, 2, c).max(axis=(3, 4))
        return y.astype(jnp.float32).sum()

    tp = timed(plain, x)
    ts = timed(s2d, x)
    print(f"{label:28s} plain {tp:7.3f} ms   s2d {ts:7.3f} ms   ({tp/ts:4.2f}x)", flush=True)


def main():
    bench_block(480, 640, 1, 64, "block0 1->64 @480x640")
    bench_block(240, 320, 64, 64, "block1 64->64 @240x320")
    bench_block(120, 160, 64, 128, "block2 64->128 @120x160")
    bench_block(60, 80, 128, 128, "block3 128->128 @60x80")


if __name__ == "__main__":
    main()
