"""block_q sweep for the cross-attention kernels (packed + stacked).

The online column softmax serializes the q-block grid axis; at LightGlue
sizes K/V fit in VMEM, so bigger blocks (fewer sequential steps) may win
despite larger tiles. Times 9 chained calls per config (one jit, one fetch).
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
    _bidir_cross_stacked_bnd,
    _fused_attention_packed_bnd,
)

B, N, D, H, L = 8, 1024, 256, 4, 9


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
    for dt in (jnp.float32, jnp.bfloat16):
        qk = jnp.asarray(rng.randn(2 * B, N, D) * 0.1, dt)
        v = jnp.asarray(rng.randn(2 * B, N, D) * 0.1, dt)
        mask = jnp.ones((2 * B, N), jnp.int32)

        for block_q in (256, 512, 1024):
            @jax.jit
            def run(qk, v):
                def step(c, _):
                    m0, m1 = _bidir_cross_stacked_bnd(
                        c, v, mask, H, block_q=block_q, interpret=False
                    )
                    return c + 0.001 * jnp.concatenate([m0, m1], 0).astype(dt), ()

                c, _ = jax.lax.scan(step, qk, None, length=L)
                return c.astype(jnp.float32).sum()

            t = timed(run, qk, v)
            print(f"cross stacked {dt.__name__:9s} block_q={block_q:5d}  "
                  f"{t:6.2f} ms/9calls", flush=True)

        for block_q in (256, 1024):
            mask1 = jnp.ones((B, N), jnp.int32)

            @jax.jit
            def run_self(qk, v):
                def step(c, _):
                    o = _fused_attention_packed_bnd(
                        c[:B], c[:B], v[:B], mask1, mask1, H,
                        block_q=block_q, interpret=False,
                    )
                    return c.at[:B].add(0.001 * o.astype(dt)), ()

                c, _ = jax.lax.scan(step, qk, None, length=L)
                return c.astype(jnp.float32).sum()

            t = timed(run_self, qk, v)
            print(f"self packed   {dt.__name__:9s} block_q={block_q:5d}  "
                  f"{t:6.2f} ms/9calls", flush=True)


if __name__ == "__main__":
    main()
