"""Third-stage bisect: the attention loop at N=1024 crashes Mosaic. Ablate
its internals one at a time."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, H = 1024, 256, 4
BQ = 256
DT = jnp.bfloat16
rs = np.random.RandomState(0)


def make_kernel(variant):
    nheads = 1 if "1head" in variant else H

    def kernel(x_ref, wqkv_ref, o_ref, ctx_ref):
        x = x_ref[0]
        cd = x.dtype
        dh = D // H
        scale = dh ** -0.5

        def proj(lo, hi):
            y = jnp.dot(x, wqkv_ref[:, lo:hi], preferred_element_type=jnp.float32)
            return y.astype(cd)

        q = proj(0, D)
        k = proj(D, 2 * D)
        v = proj(2 * D, 3 * D)

        for h in range(nheads):
            sl = slice(h * dh, (h + 1) * dh)
            kh = k[:, sl]
            vh = v[:, sl]
            for c in range(N // BQ):
                rows = slice(c * BQ, (c + 1) * BQ)
                sim = jax.lax.dot_general(
                    q[rows, sl] * scale, kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if variant == "simonly":
                    ctx_ref[rows, sl] = jnp.max(sim, axis=-1, keepdims=True).astype(cd) * jnp.ones((BQ, dh), cd)
                    continue
                rowmax = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), -1e4)
                e = jnp.exp(sim - rowmax)
                if variant == "noav":
                    ctx_ref[rows, sl] = e[:, :dh].astype(cd)
                    continue
                denom = jnp.sum(e, axis=-1, keepdims=True)
                o = jnp.dot(e.astype(cd), vh, preferred_element_type=jnp.float32)
                if variant != "nodiv":
                    o = o / (denom + 1e-30)
                ctx_ref[rows, sl] = o.astype(cd)
        o_ref[0] = ctx_ref[...]

    return kernel


def try_variant(variant):
    x = jnp.asarray(rs.randn(1, N, D) * 0.1, DT)
    w = jnp.asarray(rs.randn(D, 3 * D) * 0.05, DT)
    try:
        out = pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((1, N, D), DT),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((N, D), DT)],
        )(x, w)
        print(f"[OK] {variant}", float(out.astype(jnp.float32).sum()))
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {variant}: {type(e).__name__}: "
              + str(e).splitlines()[0][:160])


for v in ("full", "full-1head", "nodiv", "noav", "simonly", "simonly-1head"):
    try_variant(v)
