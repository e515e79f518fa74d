"""Adaptive-inference perf: while_loop early-exit path vs full-depth scan.

VERDICT r1 weak #3: the adaptive depth/width path (lax.while_loop with
dynamically sliced layer params, models/matchers/lightglue.py) had no on-TPU
measurement. This times LightGlue matching at the reference's adaptive use
case (batch 1, SURVEY: adaptivity is b==1-only upstream too) in three modes:

  scan       — full 9 layers, lax.scan (the batched production path)
  adaptive   — depth_confidence=0.95 + width_confidence=0.99 on EASY pairs
               (descriptors nearly identical -> early exit fires)
  adaptive-h — same thresholds on HARD pairs (random descriptors -> runs
               deep; measures the while_loop overhead when adaptivity
               cannot help)

Findings land in NOTES.md. The while_loop executes layers sequentially with
dynamic parameter slices, so even with no exit it should be within ~20% of
the scan; the win comes from exiting at layer ~2-4 on easy pairs.
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

N, D = 1024, 256


def make_data(rng, easy: bool):
    kp0 = rng.uniform(0, 640, (1, N, 2)).astype(np.float32)
    if easy:
        kp1 = kp0 + rng.randn(1, N, 2).astype(np.float32)
        d0 = rng.randn(1, N, D).astype(np.float32)
        d1 = d0 + 0.02 * rng.randn(1, N, D).astype(np.float32)
    else:
        kp1 = rng.uniform(0, 640, (1, N, 2)).astype(np.float32)
        d0 = rng.randn(1, N, D).astype(np.float32)
        d1 = rng.randn(1, N, D).astype(np.float32)
    norm = lambda d: d / np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "keypoints0": jnp.asarray(kp0), "keypoints1": jnp.asarray(kp1),
        "descriptors0": jnp.asarray(norm(d0)), "descriptors1": jnp.asarray(norm(d1)),
        "view0": {"image_size": jnp.asarray([[640.0, 480.0]])},
        "view1": {"image_size": jnp.asarray([[640.0, 480.0]])},
    }


def timed(fn, *args, iters=50):
    for _ in range(3):
        jax.tree.leaves(fn(*args))[0].block_until_ready()
        float(jnp.sum(fn(*args)["matching_scores0"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out["matching_scores0"]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    easy = make_data(rng, easy=True)
    hard = make_data(rng, easy=False)

    base = {"filter_threshold": 0.1, "mp": True}
    scan_model = get_model("lightglue").from_conf(base)
    params = scan_model.init(jax.random.PRNGKey(0), easy)
    # random-init confidence heads never clear the ~0.85 thresholds, so the
    # "confident" variant biases them hard positive — the same surgery as
    # tests/test_models.py's confident-exit parity test — to measure the
    # upper bound of the adaptivity win (exit after layer 0).
    p_conf = {"params": dict(params["params"])}
    p_conf["params"]["conf_head_b"] = jnp.full_like(
        p_conf["params"]["conf_head_b"], 10.0
    )
    adapt_model = get_model("lightglue").from_conf(
        {**base, "depth_confidence": 0.95, "width_confidence": 0.99}
    )

    scan_fn = jax.jit(lambda d: scan_model.apply(params, d))
    adapt_fn = jax.jit(lambda d: adapt_model.apply(params, d))
    adapt_conf_fn = jax.jit(lambda d: adapt_model.apply(p_conf, d))

    t_scan = timed(scan_fn, easy)
    t_conf = timed(adapt_conf_fn, easy)
    stop_conf = int(adapt_conf_fn(easy)["stop_layer"])
    t_deep = timed(adapt_fn, hard)
    stop_deep = int(adapt_fn(hard)["stop_layer"])

    print(f"scan (9 layers, b1)            {t_scan:7.2f} ms   {1e3/t_scan:6.1f} pairs/s")
    print(f"adaptive confident (exit@{stop_conf})    {t_conf:7.2f} ms   {1e3/t_conf:6.1f} pairs/s")
    print(f"adaptive no-exit  (exit@{stop_deep})     {t_deep:7.2f} ms   {1e3/t_deep:6.1f} pairs/s")


def make_data_b(rng, b, easy=True):
    d1 = make_data(rng, easy)
    rep = lambda t: jnp.repeat(t, b, axis=0) if hasattr(t, "ndim") and t.ndim >= 1 else t
    return jax.tree.map(rep, d1)


def width_section():
    """Width pruning with the compact-prefix engine (r3): same pruning
    decisions as mask-only, but layers after compaction run at C=N/2."""
    rng = np.random.RandomState(0)
    base = {"filter_threshold": 0.1, "mp": True}
    scan_model = get_model("lightglue").from_conf(base)
    data1 = make_data_b(rng, 1)
    params = scan_model.init(jax.random.PRNGKey(0), data1)
    # matchability head biased negative -> a real fraction of tokens prunes
    # (random-init matchability never drops below the keep threshold)
    p = {"params": dict(params["params"])}
    p["params"]["assign_match_b"] = jnp.full_like(p["params"]["assign_match_b"], -1.4)

    masked_model = get_model("lightglue").from_conf(
        {**base, "width_confidence": 0.8, "width_capacity": -1}
    )
    compact_model = get_model("lightglue").from_conf(
        {**base, "width_confidence": 0.8, "width_capacity": 0.5}
    )

    for b in (1, 8):
        data = make_data_b(np.random.RandomState(0), b)
        scan_fn = jax.jit(lambda d: scan_model.apply(params, d))
        masked_fn = jax.jit(lambda d: masked_model.apply(p, d))
        compact_fn = jax.jit(lambda d: compact_model.apply(p, d))
        t_scan = timed(scan_fn, data)
        t_masked = timed(masked_fn, data)
        t_compact = timed(compact_fn, data)
        out = compact_fn(data)
        pruned = float((np.asarray(out["prune0"]) < 9).mean())
        print(f"[b{b}] scan            {t_scan:7.2f} ms")
        print(f"[b{b}] width masked    {t_masked:7.2f} ms  (pruned frac {pruned:.2f})")
        print(f"[b{b}] width compact   {t_compact:7.2f} ms  ({t_masked/t_compact:.2f}x vs masked, {t_scan/t_compact:.2f}x vs scan)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "width":
        width_section()
    else:
        main()
