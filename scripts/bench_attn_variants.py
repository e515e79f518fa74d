"""Pinpoint where time goes INSIDE the packed attention kernel.

bench_lg_bound.py showed the attention kernels are 6.8 of LightGlue's
12.1 ms while all 18 dense matmuls take 2.2 ms. This times ablated kernel
variants (same grid/BlockSpecs, bench shapes, 27 calls like 9 layers x
(2 self + 1 cross-ish)) to attribute the cost:

  full      — the production kernel body
  noexp     — exp replaced by identity (VPU transcendental cost)
  nosoftmax — sim @ v directly (all (BQ,N) VPU passes cost)
  dot1      — only QK^T per head (second matmul cost)
  bigdot    — one K=256 all-heads dot + softmax + AV per head-slice
              (wrong numerics; measures the K=64 MXU penalty)
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, D, HEADS, CALLS = 16, 1024, 256, 4, 27
DT = jnp.bfloat16
BQ = 256


def kernel(q_ref, k_ref, v_ref, o_ref, *, variant):
    dh = D // HEADS
    if variant == "bigdot":
        q = q_ref[0] * 0.125
        k = k_ref[0]
        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        rowmax = jnp.max(sim, -1, keepdims=True)
        e = jnp.exp(sim - rowmax)
        denom = jnp.sum(e, -1, keepdims=True)
        for h in range(HEADS):
            v = v_ref[0, :, h * dh:(h + 1) * dh]
            o = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, h * dh:(h + 1) * dh] = (o / (denom + 1e-30)).astype(o_ref.dtype)
        return
    # production-kernel mask work (colbias add + clamped rowmax), so the
    # 'full' baseline matches _attention_kernel_packed's body exactly
    # (ADVICE r1: the earlier variant omitted it and understated VPU cost)
    colbias = jnp.zeros((N,), jnp.float32)
    for h in range(HEADS):
        q = q_ref[0, :, h * dh:(h + 1) * dh] * 0.125
        k = k_ref[0, :, h * dh:(h + 1) * dh]
        v = v_ref[0, :, h * dh:(h + 1) * dh]
        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if variant == "dot1":
            # consume ALL of sim via a reduction matmul (Mosaic rejects the
            # (BQ,N)->(BQ,N/dh,dh) reshape) so the compiler cannot
            # dead-code-eliminate part of the QK^T dot (ADVICE r1)
            ones = jnp.ones((N, dh), sim.dtype)
            red = jax.lax.dot_general(
                sim, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, h * dh:(h + 1) * dh] = red.astype(o_ref.dtype)
            continue
        sim = sim + colbias[None, :]
        if variant == "nosoftmax":
            e = sim
            denom = 1.0
        elif variant == "bf16exp":
            # exp on bf16 lanes (2/cycle) emitting bf16 directly: kills both
            # the f32 exp and the separate f32->bf16 cast before the AV dot;
            # denominator still accumulated in f32
            rowmax = jnp.maximum(jnp.max(sim, -1, keepdims=True), -1e4)
            e = jnp.exp((sim - rowmax).astype(jnp.bfloat16))
            denom = jnp.sum(e.astype(jnp.float32), -1, keepdims=True)
        elif variant == "noexp":
            rowmax = jnp.max(sim, -1, keepdims=True)
            e = sim - rowmax
            denom = jnp.sum(e, -1, keepdims=True)
        else:
            rowmax = jnp.maximum(jnp.max(sim, -1, keepdims=True), -1e4)
            e = jnp.exp(sim - rowmax)
            denom = jnp.sum(e, -1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * dh:(h + 1) * dh] = (o / (denom + 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(q, k, v, variant):
    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B, N // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )

    def body(x, _):
        # damp the carry so ablated variants ('nosoftmax', 'dot1') with
        # unnormalized outputs cannot blow up to inf across the 27 chained
        # calls (ADVICE r1; timings are value-independent either way)
        return (f(x, k, v) * jnp.asarray(0.01, x.dtype)), None

    out, _ = jax.lax.scan(body, q, None, length=CALLS)
    return out.astype(jnp.float32).sum()


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, D) * 0.1, DT)
    k = jnp.asarray(rng.randn(B, N, D) * 0.1, DT)
    v = jnp.asarray(rng.randn(B, N, D) * 0.1, DT)
    for variant in ("full", "bf16exp", "noexp", "nosoftmax", "dot1", "bigdot"):
        float(run(q, k, v, variant))
        t0 = time.perf_counter()
        for _ in range(20):
            out = run(q, k, v, variant)
        float(out)
        t = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{variant:10s} {t:7.2f} ms / {CALLS} calls", flush=True)


if __name__ == "__main__":
    main()
