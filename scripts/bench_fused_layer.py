"""A/B the whole-block LightGlue layer megakernels vs the unfused scan path.

Same-session comparison at bench shapes (B=8, N=1024, D=256, bf16 mp path):
matcher-stage forward only, random weights, identical inputs. Also checks
numerical parity of the two paths on the same params.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" \
     JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 590 python scripts/bench_fused_layer.py [B N]
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

from gluefactory_tpu.models import get_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
D = 256


def timed(fn, *args, iters=30):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend())
    rs = np.random.RandomState(0)
    data = {
        "keypoints0": jnp.asarray(rs.rand(B, N, 2) * 500, jnp.float32),
        "keypoints1": jnp.asarray(rs.rand(B, N, 2) * 500, jnp.float32),
        "descriptors0": jnp.asarray(rs.randn(B, N, D), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(B, N, D), jnp.float32),
        "view0": {"image_size": jnp.full((B, 2), 500.0)},
        "view1": {"image_size": jnp.full((B, 2), 500.0)},
    }
    base = {"filter_threshold": 0.1, "mp": True, "collect_layers": False}
    m_off = get_model("lightglue").from_conf({**base, "fused_layer": False})
    params = m_off.init(jax.random.PRNGKey(0), data)
    m_on = get_model("lightglue").from_conf({**base, "fused_layer": "auto"})

    @jax.jit
    def f_off(p, d):
        out = m_off.apply(p, d)
        return out["matching_scores0"].astype(jnp.float32).sum()

    @jax.jit
    def f_on(p, d):
        out = m_on.apply(p, d)
        return out["matching_scores0"].astype(jnp.float32).sum()

    # parity first
    o_off = m_off.apply(params, data)
    o_on = m_on.apply(params, data)
    la = float(jnp.max(jnp.abs(o_off["log_assignment"] - o_on["log_assignment"])))
    agree = float((o_off["matches0"] == o_on["matches0"]).mean())
    print(f"parity: log_assignment max_abs_diff={la:.3e} matches0 agree={agree:.4f}")

    t_off = timed(f_off, params, data)
    t_on = timed(f_on, params, data)
    print(f"unfused matcher fwd: {t_off:.3f} ms/iter (B={B}, N={N})")
    print(f"fused   matcher fwd: {t_on:.3f} ms/iter")
    print(f"speedup: {t_off / t_on:.3f}x")


if __name__ == "__main__":
    main()
