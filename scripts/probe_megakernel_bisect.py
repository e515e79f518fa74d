"""Bisect which construct in the fused-layer kernels crashes the Mosaic
compile helper (HTTP 500 / subprocess exit 1) on the real TPU."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D = 1024, 256
DT = jnp.bfloat16
rs = np.random.RandomState(0)


def run(name, kernel, out_shape, *args, scratch=None):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            scratch_shapes=scratch or [],
        )(*args)
        print(f"[OK] {name}", float(jnp.asarray(out, jnp.float32).sum()
                                    if not isinstance(out, tuple) else 0.0))
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")


x = jnp.asarray(rs.randn(N, D) * 0.1, DT)
w3 = jnp.asarray(rs.randn(D, 3 * D) * 0.05, DT)
b3 = jnp.asarray(rs.randn(1, 3 * D) * 0.05, DT)
tab = jnp.asarray(rs.randn(N, D) * 0.1, DT)


# 1. column slice of a weight ref in a dot
def k_colslice(x_ref, w_ref, o_ref):
    y = jnp.dot(x_ref[:], w_ref[:, :D], preferred_element_type=jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


run("col-slice weight dot", k_colslice,
    jax.ShapeDtypeStruct((N, D), DT), x, w3)


# 2. sliced 1D bias read b_ref[0, lo:hi]
def k_biasslice(x_ref, b_ref, o_ref):
    o_ref[:] = (x_ref[:].astype(jnp.float32)
                + b_ref[0, :D].astype(jnp.float32)).astype(o_ref.dtype)


run("bias row slice", k_biasslice, jax.ShapeDtypeStruct((N, D), DT), x, b3)


# 3. roll on f32 (N, D) derived from a dot
def k_roll_after_dot(x_ref, w_ref, o_ref):
    y = jnp.dot(x_ref[:], w_ref[:, :D], preferred_element_type=jnp.float32)
    r = pltpu.roll(y, shift=1, axis=1) + pltpu.roll(y, shift=D - 1, axis=1)
    o_ref[:] = r.astype(o_ref.dtype)


run("roll after dot f32", k_roll_after_dot,
    jax.ShapeDtypeStruct((N, D), DT), x, w3)


# 4. scratch row-slice read/write
def k_scratch_rows(x_ref, o_ref, s_ref):
    for c in range(4):
        rows = slice(c * 256, (c + 1) * 256)
        s_ref[rows] = (x_ref[rows] * 2.0).astype(s_ref.dtype)
    for c in range(4):
        rows = slice(c * 256, (c + 1) * 256)
        o_ref[rows] = s_ref[rows]


run("scratch row slices", k_scratch_rows, jax.ShapeDtypeStruct((N, D), DT),
    x, scratch=[pltpu.VMEM((N, D), DT)])


# 5. online column accumulators in registers across a python chunk loop
def k_online(x_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    colmax = jnp.full((1, N), -jnp.inf, jnp.float32)
    coldenom = jnp.zeros((1, N), jnp.float32)
    colacc = jnp.zeros((N, 64), jnp.float32)
    for c in range(4):
        rows = slice(c * 256, (c + 1) * 256)
        sim = jnp.dot(xf[rows, :64].astype(DT), xf[:, :64].astype(DT).T,
                      preferred_element_type=jnp.float32)
        new_m = jnp.maximum(
            jnp.maximum(colmax, jnp.max(sim, axis=0, keepdims=True)), -1e4)
        factor = jnp.exp(colmax - new_m)
        e_col = jnp.exp(sim - new_m)
        colacc = colacc * factor[0][:, None] + jax.lax.dot_general(
            e_col.astype(DT), xf[rows, :64].astype(DT),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        coldenom = coldenom * factor + jnp.sum(e_col, axis=0, keepdims=True)
        colmax = new_m
    o_ref[:, :64] = (colacc / (coldenom[0][:, None] + 1e-30)).astype(o_ref.dtype)
    o_ref[:, 64:] = jnp.zeros((N, D - 64), o_ref.dtype)


run("online col softmax", k_online, jax.ShapeDtypeStruct((N, D), DT), x)


# 6. rowscale (N,1) f32 chunk slicing
def k_rowscale(x_ref, o_ref):
    rowscale = jnp.ones((N, 1), jnp.float32)
    for c in range(4):
        rows = slice(c * 256, (c + 1) * 256)
        o_ref[rows] = (x_ref[rows].astype(jnp.float32)
                       * rowscale[rows]).astype(o_ref.dtype)


run("rowscale chunk slice", k_rowscale, jax.ShapeDtypeStruct((N, D), DT), x)


# 7. 1D bias slice from (1,N) mask then [:, None]
def k_maskbias(x_ref, m_ref, o_ref):
    mask = m_ref[0, 0, :].astype(jnp.float32)
    rowbias = (mask - 1.0) * 1e9
    for c in range(4):
        rows = slice(c * 256, (c + 1) * 256)
        o_ref[rows] = (x_ref[rows].astype(jnp.float32)
                       + rowbias[rows][:, None]).astype(o_ref.dtype)


m3 = jnp.ones((1, 1, N), jnp.int32)


def run3(name, kernel, out_shape, *args, scratch=None):
    run(name, kernel, out_shape, *args, scratch=scratch)


run3("mask rowbias chunk", k_maskbias, jax.ShapeDtypeStruct((N, D), DT), x, m3)
