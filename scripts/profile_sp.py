"""SuperPoint trunk profiling: plain vs s2d, and stage isolation."""

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

from gluefactory_tpu.models import get_model

B, H, W, NK = 8, 480, 640, 1024


def timed(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    data = {"image": jnp.asarray(rng.rand(B, H, W, 1), jnp.float32)}

    for s2d in (False, True):
        sp = get_model("superpoint_open").from_conf(
            {"max_num_keypoints": NK, "s2d": s2d}
        )
        v = sp.init(jax.random.PRNGKey(0), data)

        def full(v, d):
            out = sp.apply(v, d)
            return out["keypoints"].sum() + out["descriptors"].sum()

        t = timed(jax.jit(full), v, data)
        print(f"sp full      s2d={s2d}   {t:7.2f} ms", flush=True)

        sp_d = get_model("superpoint_open").from_conf(
            {"max_num_keypoints": NK, "s2d": s2d, "dense_outputs": True}
        )

        def trunk_only(v, d):
            # dense descriptor path exercises trunk + desc head, skipping
            # nothing; to isolate convs vs selection, compare with `full`
            out = sp_d.apply(v, d)
            return out["dense_descriptors"].astype(jnp.float32).sum()

        t2 = timed(jax.jit(trunk_only), v, data)
        print(f"  trunk+heads(dense)      {t2:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
