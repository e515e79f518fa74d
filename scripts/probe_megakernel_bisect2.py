"""Second-stage bisect: ablate sections of the fused self-block kernel body
at N=1024 to find what crashes the Mosaic compile helper."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, H = 1024, 256, 4
BQ = 256
DT = jnp.bfloat16
rs = np.random.RandomState(0)


def _erf(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _rot(y, cos, sina, sinb):
    fwd = pltpu.roll(y, shift=D - 1, axis=1)
    bwd = pltpu.roll(y, shift=1, axis=1)
    return y * cos + fwd * sina + bwd * sinb


def make_kernel(variant):
    def kernel(x_ref, cos_ref, sina_ref, sinb_ref, mask_ref,
               wqkv_ref, bqkv_ref, wout_ref, bout_ref,
               wff1_ref, bff1_ref, lns_ref, lnb_ref, wff2_ref, bff2_ref,
               o_ref, ctx_ref):
        x = x_ref[0]
        cd = x.dtype
        dh = D // H
        scale = dh ** -0.5
        mask = mask_ref[0, 0, :]
        colbias = (mask.astype(jnp.float32) - 1.0) * 1e9
        rowscale = mask.astype(jnp.float32)[:, None]
        cos = cos_ref[0].astype(jnp.float32)
        sina = sina_ref[0].astype(jnp.float32)
        sinb = sinb_ref[0].astype(jnp.float32)

        def rot_proj(lo, hi, post_scale):
            y = jnp.dot(x, wqkv_ref[:, lo:hi], preferred_element_type=jnp.float32)
            y += bqkv_ref[0, lo:hi].astype(jnp.float32)
            if variant != "norot":
                y = _rot(y, cos, sina, sinb)
            return (y * post_scale).astype(cd)

        q = rot_proj(0, D, scale)
        k = rot_proj(D, 2 * D, 1.0)
        v = jnp.dot(x, wqkv_ref[:, 2 * D:], preferred_element_type=jnp.float32)
        v = (v + bqkv_ref[0, 2 * D:].astype(jnp.float32)).astype(cd)

        if variant in ("noattn",):
            ctx_ref[...] = v
        else:
            for h in range(H):
                sl = slice(h * dh, (h + 1) * dh)
                kh = k[:, sl]
                vh = v[:, sl]
                for c in range(N // BQ):
                    rows = slice(c * BQ, (c + 1) * BQ)
                    sim = jnp.dot(q[rows, sl], kh.T,
                                  preferred_element_type=jnp.float32)
                    sim += colbias[None, :]
                    rowmax = jnp.maximum(
                        jnp.max(sim, axis=-1, keepdims=True), -1e4)
                    e = jnp.exp(sim - rowmax)
                    denom = jnp.sum(e, axis=-1, keepdims=True)
                    o = jnp.dot(e.astype(cd), vh,
                                preferred_element_type=jnp.float32)
                    o = o * (rowscale[rows] / (denom + 1e-30))
                    ctx_ref[rows, sl] = o.astype(cd)

        if variant == "noffn":
            o_ref[0] = ctx_ref[...]
            return
        for c in range(N // BQ):
            rows = slice(c * BQ, (c + 1) * BQ)
            msg = jnp.dot(ctx_ref[rows], wout_ref[:],
                          preferred_element_type=jnp.float32)
            msg = (msg + bout_ref[0].astype(jnp.float32)).astype(cd)
            h1 = jnp.dot(x[rows], wff1_ref[:D, :],
                         preferred_element_type=jnp.float32)
            h1 += jnp.dot(msg, wff1_ref[D:, :],
                          preferred_element_type=jnp.float32)
            h1 += bff1_ref[0].astype(jnp.float32)
            mean = jnp.mean(h1, axis=-1, keepdims=True)
            var = jnp.var(h1, axis=-1, keepdims=True)
            h1 = (h1 - mean) * jax.lax.rsqrt(var + 1e-5)
            h1 = h1 * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
            if variant != "nogelu":
                h1 = _gelu(h1)
            g = h1.astype(cd)
            y = jnp.dot(g, wff2_ref[:], preferred_element_type=jnp.float32)
            y += bff2_ref[0].astype(jnp.float32)
            o_ref[0, rows] = (x[rows].astype(jnp.float32) + y).astype(cd)

    return kernel


def try_variant(variant):
    x = jnp.asarray(rs.randn(1, N, D) * 0.1, DT)
    cos = jnp.asarray(rs.randn(1, N, D) * 0.1, DT)
    mask = jnp.ones((1, 1, N), jnp.int32)
    w = lambda *sh: jnp.asarray(rs.randn(*sh) * 0.05, DT)
    row = lambda i: (i, 0, 0)
    full = lambda i: (0, 0)
    try:
        out = pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((1, N, D), DT),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, N, D), row),
                pl.BlockSpec((1, N, D), row),
                pl.BlockSpec((1, N, D), row),
                pl.BlockSpec((1, N, D), row),
                pl.BlockSpec((1, 1, N), row),
                pl.BlockSpec((D, 3 * D), full),
                pl.BlockSpec((1, 3 * D), full),
                pl.BlockSpec((D, D), full),
                pl.BlockSpec((1, D), full),
                pl.BlockSpec((2 * D, 2 * D), full),
                pl.BlockSpec((1, 2 * D), full),
                pl.BlockSpec((1, 2 * D), full),
                pl.BlockSpec((1, 2 * D), full),
                pl.BlockSpec((2 * D, D), full),
                pl.BlockSpec((1, D), full),
            ],
            out_specs=pl.BlockSpec((1, N, D), row),
            scratch_shapes=[pltpu.VMEM((N, D), DT)],
        )(x, cos, cos, cos, mask,
          w(D, 3 * D), w(1, 3 * D), w(D, D), w(1, D), w(2 * D, 2 * D),
          w(1, 2 * D), w(1, 2 * D), w(1, 2 * D), w(2 * D, D), w(1, D))
        print(f"[OK] {variant}", float(out.astype(jnp.float32).sum()))
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {variant}: {type(e).__name__}: "
              + str(e).splitlines()[0][:160])


for v in ("full", "norot", "noattn", "noffn", "nogelu"):
    try_variant(v)
