"""Micro-experiment: is a space-to-depth 2x2x256 conv faster than 3x3x64?

Hypothesis: SuperPoint's 64-channel convs fill only half the MXU lanes
(N=64); packing 2x2 pixel blocks into channels raises N to 256 at the cost
of 16/9 more FLOPs. Chains many conv steps inside one jit to amortize the
~1 ms relay dispatch overhead.
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

B = 8
STEPS = 30  # conv applications chained per jit call


def time_call(fn, *args, iters=10):
    for _ in range(2):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def conv_chain(shape, cin, cout, k, label, flops_per_step):
    x = jnp.asarray(np.random.rand(B, *shape, cin), jnp.bfloat16)
    w = jnp.asarray(np.random.rand(k, k, cin, cout) * 0.01, jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def step(x, _):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            return y, ()

        y, _ = jax.lax.scan(step, x, None, length=STEPS)
        return y.astype(jnp.float32).sum()

    dt = time_call(run, x, w) / STEPS
    tf = flops_per_step * B / dt / 1e12
    print(f"{label:38s} {dt*1e3:7.3f} ms/step  {tf:6.1f} TF/s", flush=True)
    return dt


def main():
    h, w = 480, 640
    f_3x3_64 = 2 * h * w * 9 * 64 * 64
    # baseline: SuperPoint conv1b shape
    t_base = conv_chain((h, w), 64, 64, 3, "3x3 64->64 @480x640 (conv1b)", f_3x3_64)
    # s2d equivalent compute shape (alignment ignored; same matmul dims)
    f_2x2_256 = 2 * (h // 2) * (w // 2) * 4 * 256 * 256
    t_s2d = conv_chain((h // 2, w // 2), 256, 256, 2, "2x2 256->256 @240x320 (s2d equiv)", f_2x2_256)
    # what would a 3x3 dense s2d kernel cost (if alignment forces it)
    f_3x3_256 = 2 * (h // 2) * (w // 2) * 9 * 256 * 256
    conv_chain((h // 2, w // 2), 256, 256, 3, "3x3 256->256 @240x320 (dense s2d)", f_3x3_256)
    # block1 shape for reference
    conv_chain((240, 320), 64, 64, 3, "3x3 64->64 @240x320 (block1)", 2 * 240 * 320 * 9 * 64 * 64)
    conv_chain((120, 160), 256, 256, 2, "2x2 256->256 @120x160 (block1 s2d)", 2 * 120 * 160 * 4 * 256 * 256)
    # high-channel reference point
    conv_chain((120, 160), 256, 256, 3, "3x3 256->256 @120x160 (ref)", 2 * 120 * 160 * 9 * 256 * 256)
    print(f"\ns2d speedup on conv1b shape: {t_base / t_s2d:.2f}x", flush=True)


if __name__ == "__main__":
    main()
