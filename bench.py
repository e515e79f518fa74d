"""Headline benchmark: SuperPoint + LightGlue matching throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's HPatches setting (SURVEY §6): 480x640 images,
1024 keypoints, LightGlue 9 layers x 256 dims. The reference publishes no
throughput numbers (BASELINE.md); the baseline constant below is the
LightGlue-paper-reported end-to-end speed of SuperPoint+LightGlue on an RTX
3090 with FlashAttention (~33 ms/pair at this size => ~30 pairs/s), the same
hardware class the reference trained on (README.md:235).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

BASELINE_PAIRS_PER_S = 30.0  # SP+LG on RTX 3090 w/ FlashAttention (paper-scale estimate)

BATCH = 8
H, W = 480, 640
NUM_KPTS = 1024


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    rng = np.random.RandomState(0)
    pipe = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {"name": "superpoint_open", "max_num_keypoints": NUM_KPTS},
            "matcher": {"name": "lightglue", "filter_threshold": 0.1, "mp": True},
        }
    )
    data = {
        "view0": {
            "image": jnp.asarray(rng.rand(BATCH, H, W, 1), jnp.float32),
            "image_size": jnp.asarray([[W * 1.0, H * 1.0]] * BATCH),
        },
        "view1": {
            "image": jnp.asarray(rng.rand(BATCH, H, W, 1), jnp.float32),
            "image_size": jnp.asarray([[W * 1.0, H * 1.0]] * BATCH),
        },
    }
    variables = pipe.init(jax.random.PRNGKey(0), data)

    # IMPORTANT: on the axon relay backend jax.block_until_ready returns
    # without waiting, so we time with a forced scalar fetch. A single fetch
    # after N dispatches is enough: device execution is in-order, so the last
    # result transfers only after all N executions completed.
    def fwd_scalar(v, d):
        out = pipe.apply(v, d)
        return out["matching_scores0"].sum() + out["keypoints0"].sum()

    fwd = jax.jit(fwd_scalar)
    float(fwd(variables, data))  # warmup / compile
    float(fwd(variables, data))  # settle caches

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, data)
    float(out)  # forces completion of the whole in-order queue
    dt = time.perf_counter() - t0

    pairs_per_s = BATCH * n_iters / dt
    print(
        json.dumps(
            {
                "metric": (
                    "SP+LightGlue end-to-end matching throughput (480x640, "
                    "1024 kpts, batch 8); vs_baseline is relative to an "
                    "ESTIMATED 30 pairs/s for the reference on its RTX 3090 "
                    "class hardware (no published throughput, BASELINE.md)"
                ),
                "value": round(pairs_per_s, 2),
                "unit": "image pairs/s/chip",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
