"""Probe the primitives the LightGlue layer megakernel needs, on the real TPU.

Checks, each in a tiny standalone pallas_call:
  1. pltpu.roll on the minor axis of a bf16 (N, D) tile (rotary via rolls).
  2. static row/col slices of a weight ref ((2D, 2D) -> [:D] rows).
  3. a chain of dots + layernorm + gelu in one kernel body (Mosaic health).
Run: PYTHONPATH=/root/repo JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 590 python scripts/probe_megakernel_prims.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D = 256, 256


def _report(name, ok, err=None):
    print(f"[{'OK' if ok else 'FAIL'}] {name}" + (f" err={err}" for _ in ())
          .__next__() if False else f"[{'OK' if ok else 'FAIL'}] {name}"
          + (f"  max_abs_err={err:.3e}" if err is not None else ""))


def probe_roll(dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        r = pltpu.roll(x, shift=1, axis=1)      # out[j] = in[j-1]
        l = pltpu.roll(x, shift=D - 1, axis=1)  # out[j] = in[j+1]
        o_ref[:] = (r + 2.0 * l).astype(o_ref.dtype)

    x = jnp.asarray(np.random.RandomState(0).randn(N, D), dtype)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((N, D), dtype),
    )(x)
    ref = jnp.roll(x, 1, axis=1) + 2.0 * jnp.roll(x, -1, axis=1)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    _report(f"pltpu.roll minor axis {dtype.__name__}", err < 1e-2, err)


def probe_weight_row_slice(dtype):
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]  # (N, D)
        w1 = w_ref[:D, :]   # rows 0..D
        w2 = w_ref[D:, :]   # rows D..2D
        y = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        y = y + jnp.dot(x, w2, preferred_element_type=jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(N, D), dtype)
    w = jnp.asarray(rs.randn(2 * D, D), dtype)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((N, D), dtype),
    )(x, w)
    ref = x.astype(jnp.float32) @ w[:D].astype(jnp.float32) + (
        x.astype(jnp.float32) @ w[D:].astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) /
                (float(jnp.max(jnp.abs(ref))) + 1e-9))
    _report(f"weight row slices {dtype.__name__}", err < 2e-2, err)


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation, |err| <= 1.5e-7.
    Mosaic has no erf/erfc lowering; this is VPU-only (exp + polynomial)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def probe_fused_chain(dtype):
    def kernel(x_ref, w1_ref, w2_ref, o_ref):
        x = x_ref[:]
        h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        g = _gelu_exact(h)
        y = jnp.dot(g.astype(dtype), w2_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(N, D) * 0.1, dtype)
    w1 = jnp.asarray(rs.randn(D, 2 * D) * 0.05, dtype)
    w2 = jnp.asarray(rs.randn(2 * D, D) * 0.05, dtype)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((N, D), dtype),
    )(x, w1, w2)
    xf, w1f, w2f = (t.astype(jnp.float32) for t in (x, w1, w2))
    h = xf @ w1f
    h = (h - h.mean(-1, keepdims=True)) * jax.lax.rsqrt(h.var(-1, keepdims=True) + 1e-5)
    ref = xf + jax.nn.gelu(h, approximate=False).astype(dtype).astype(jnp.float32) @ w2f
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) /
                (float(jnp.max(jnp.abs(ref))) + 1e-9))
    _report(f"dot+LN+gelu+dot chain {dtype.__name__}", err < 2e-2, err)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for dt in (jnp.float32, jnp.bfloat16):
        for probe in (probe_roll, probe_weight_row_slice, probe_fused_chain):
            try:
                probe(dt)
            except Exception as e:  # noqa: BLE001
                print(f"[FAIL] {probe.__name__} {dt.__name__}: {type(e).__name__}: "
                      + str(e).splitlines()[0][:200])
