"""Cumulative per-stage timing of the SuperPoint-open trunk at bench shapes.

Mirrors superpoint_open.py's inference path (s2d gating, bf16) with random
weights; prefix k times blocks 0..k so differences attribute time per stage.
All prefixes are separate jitted programs; subtract the near-noop dispatch
floor (~0.7 ms) once per number, not per stage difference.
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

from gluefactory_tpu.models.extractors.superpoint_open import (
    _space_to_depth,
    _depth_to_space,
    s2d_conv,
    simple_nms,
    sample_descriptors,
)

B, H, W, NK = 8, 480, 640, 1024
DT = jnp.bfloat16


def timed(fn, *args, iters=30, warmup=2, label=""):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:36s} {ms:7.3f} ms", flush=True)
    return ms


def make_weights(rng):
    ws = {}

    def conv(name, ci, co, k=3):
        ws[name] = (
            jnp.asarray(rng.randn(k, k, ci, co) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(co) * 0.1, jnp.float32),
        )

    conv("c0a", 1, 64)
    conv("c0b", 64, 64)
    conv("c1a", 64, 64)
    conv("c1b", 64, 64)
    conv("c2a", 64, 128)
    conv("c2b", 128, 128)
    conv("c3a", 128, 128)
    conv("c3b", 128, 128)
    conv("da", 128, 256)
    conv("db", 256, 256, 1)
    conv("sa", 128, 256)
    conv("sb", 256, 65, 1)
    return ws


def plain_conv(x, k, b, dt=DT):
    y = jax.lax.conv_general_dilated(
        x.astype(dt), k.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(dt)


def stages(ws, n, img):
    """Run the first n stages; stage list:
    0 block0(s2d+pool) 1 block1(s2d+pool) 2 block2(+pool) 3 block3
    4 desc head 5 det head(softmax+d2s) 6 nms 7 topk 8 sample"""
    x = img
    outs = []
    # block0 s2d
    p0 = _space_to_depth(x)
    y = jax.nn.relu(s2d_conv(p0, *ws["c0a"], "p0_to_p1", dtype=DT))
    z = jax.nn.relu(s2d_conv(y, *ws["c0b"], "p1_to_p0", dtype=DT))
    bb, hh, wwn, _ = z.shape
    x = z.reshape(bb, hh, wwn, 2, 2, 64).max(axis=(3, 4))
    if n == 0:
        return x
    # block1 s2d
    p0 = _space_to_depth(x)
    y = jax.nn.relu(s2d_conv(p0, *ws["c1a"], "p0_to_p1", dtype=DT))
    z = jax.nn.relu(s2d_conv(y, *ws["c1b"], "p1_to_p0", dtype=DT))
    bb, hh, wwn, _ = z.shape
    x = z.reshape(bb, hh, wwn, 2, 2, 64).max(axis=(3, 4))
    if n == 1:
        return x
    x = jax.nn.relu(plain_conv(x, *ws["c2a"]))
    x = jax.nn.relu(plain_conv(x, *ws["c2b"]))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    if n == 2:
        return x
    x = jax.nn.relu(plain_conv(x, *ws["c3a"]))
    x = jax.nn.relu(plain_conv(x, *ws["c3b"]))
    if n == 3:
        return x
    d = jax.nn.relu(plain_conv(x, *ws["da"]))
    d = plain_conv(d, *ws["db"]).astype(jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    d = d.astype(DT)
    if n == 4:
        return d
    s = jax.nn.relu(plain_conv(x, *ws["sa"]))
    logits = plain_conv(s, *ws["sb"]).astype(jnp.float32)
    scores = jax.nn.softmax(logits, axis=-1)[..., :-1]
    b2, hc, wc, _ = scores.shape
    scores = scores.reshape(b2, hc, wc, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(b2, hc * 8, wc * 8)
    scores = scores.astype(DT)
    if n == 5:
        return (d, scores)
    scores = simple_nms(scores, 4)
    if n == 6:
        return (d, scores)
    hh, wwn = scores.shape[-2:]
    border = jnp.zeros((hh, wwn), bool).at[4:-4, 4:-4].set(True)
    scores = jnp.where(border, scores, -1.0)
    flat = scores.reshape(b2, hh * wwn)
    if jax.default_backend() != "cpu":
        topv, topi = jax.lax.approx_max_k(flat, NK)
    else:
        topv, topi = jax.lax.top_k(flat, NK)
    ys = (topi // wwn).astype(jnp.float32)
    xs = (topi % wwn).astype(jnp.float32)
    kps = jnp.stack([xs, ys], axis=-1)
    if n == 7:
        return (d, kps, topv)
    desc = sample_descriptors(kps, d, 8)
    return (desc, kps, topv)


def main():
    rng = np.random.RandomState(0)
    ws = make_weights(rng)
    img = jnp.asarray(rng.rand(B, H, W, 1), jnp.float32)

    def run(n):
        def f(i):
            out = stages(ws, n, i)
            return sum(o.astype(jnp.float32).sum() for o in jax.tree_util.tree_leaves(out))
        return f

    labels = [
        "block0", "+block1", "+block2", "+block3", "+desc head",
        "+det head", "+nms", "+topk", "+sample(full)",
    ]
    prev = 0.0
    for n, lbl in enumerate(labels):
        t = timed(run(n), img, label=lbl)
        if n:
            print(f"{'':36s}   delta {t-prev:6.3f}", flush=True)
        prev = t

    def noop(i):
        return i[0, 0, 0, 0] + 1.0

    timed(noop, img, label="near-noop floor")


if __name__ == "__main__":
    main()
