"""QK head-pair (Hadamard-2) packing experiment for the attention kernels.

Per-head (BQ,64)@(64,N) QK dots measure ~18 TF/s effective (the K=64
contraction underfills the MXU depth and Mosaic's half-lane handling is
poor). For a head pair (h0,h1) packed contiguously on channels:
  qA = [q0, q1], qB = [q0, -q1]  (both K=128)
  simA = qA.kP^T = s0 + s1 ; simB = qB.kP^T = s0 - s1
  s0 = (simA+simB)/2 ; s1 = (simA-simB)/2    (fold the /2 into q's scale)
Two K=128 full-depth dots per pair: 2x the MACs of the two K=64 dots but at
full MXU depth, with kP a raw 128-channel slice of k. Exact numerics.
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

from gluefactory_tpu.ops.pallas_attention import (
    _attention_kernel_packed,
    _fused_attention_packed_bnd,
    _round_up,
)

B, N, D, HEADS = 8, 1024, 256, 4
DT = jnp.bfloat16


def _pairqk_kernel(q_ref, k_ref, v_ref, maskq_ref, maskk_ref, o_ref, *, scale, num_heads):
    d_total = q_ref.shape[-1]
    dh = d_total // num_heads
    mask_q = maskq_ref[0, :, 0]
    mask_k = maskk_ref[0, 0, :]
    colbias = (mask_k.astype(jnp.float32) - 1.0) * 1e9
    rowscale = mask_q.astype(jnp.float32)[:, None]

    for p in range(num_heads // 2):
        sl = slice(2 * p * dh, (2 * p + 2) * dh)
        qp = q_ref[0, :, sl] * (scale * 0.5)  # (BQ, 2Dh), /2 folded
        kp = k_ref[0, :, sl]  # (N, 2Dh)
        # qB: negate the second head's half
        neg = jnp.concatenate(
            [qp[:, :dh], -qp[:, dh:]], axis=-1
        )
        qab = jnp.concatenate([qp, neg], axis=0)  # (2BQ, 2Dh)
        simab = jax.lax.dot_general(
            qab, kp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2BQ, N)
        bq = qp.shape[0]
        sim_a = simab[:bq]
        sim_b = simab[bq:]
        for hh, sim in ((0, sim_a + sim_b), (1, sim_a - sim_b)):
            h = 2 * p + hh
            sim = sim + colbias[None, :]
            rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), -1e4)
            e = jnp.exp(sim - rowmax)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            v = v_ref[0, :, h * dh:(h + 1) * dh]
            o = jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = o * (rowscale / (denom + 1e-30))
            o_ref[0, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q"))
def pairqk_attention(q, k, v, mask_q, mask_k, num_heads, block_q=256):
    b, nq, d_total = q.shape
    nk = k.shape[1]
    scale = (d_total // num_heads) ** -0.5
    mask_q = mask_q[:, :, None]
    mask_k = mask_k[:, None, :]
    grid = (b, nq // block_q)
    return pl.pallas_call(
        functools.partial(_pairqk_kernel, scale=scale, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, nq, d_total), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nk, d_total), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, nk, d_total), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, nk), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_total), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )(q, k, v, mask_q, mask_k)


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, D), DT)
    k = jnp.asarray(rng.randn(B, N, D), DT)
    v = jnp.asarray(rng.randn(B, N, D), DT)
    mq = jnp.ones((B, N), jnp.int32)
    mk = jnp.ones((B, N), jnp.int32)

    # numerics vs current kernel
    cur = _fused_attention_packed_bnd(q, k, v, mq, mk, HEADS)
    new = pairqk_attention(q, k, v, mq, mk, HEADS)
    err = float(jnp.abs(cur.astype(jnp.float32) - new.astype(jnp.float32)).max())
    ref_mag = float(jnp.abs(cur.astype(jnp.float32)).max())
    print(f"pairqk vs current: max abs err {err:.2e} (mag {ref_mag:.2f})", flush=True)

    def loop27(fn):
        def f(q, k, v):
            def body(x, _):
                o = fn(x, k, v, mq, mk, HEADS)
                # damped carry keeps values bounded and defeats DCE
                return (x + 0.001 * o).astype(x.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=27)
            return out.astype(jnp.float32).sum()
        return jax.jit(f)

    f_cur = loop27(lambda *a: _fused_attention_packed_bnd(*a))
    f_new = loop27(lambda *a: pairqk_attention(*a))

    for fn, lbl in ((f_cur, "current x27"), (f_new, "pairqk x27")):
        float(fn(q, k, v)); float(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(q, k, v)
        float(out)
        print(f"{lbl:14s} {(time.perf_counter()-t0)/10*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
