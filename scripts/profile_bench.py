"""Stage decomposition of the headline bench on the real chip.

Times (with forced scalar fetches — the axon relay does not block on
block_until_ready) each stage of the SP+LightGlue pipeline at the bench
config so optimization effort goes where the milliseconds are.
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

BATCH, H, W, NK = 8, 480, 640, 1024


def timed(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.RandomState(0)
    pipe = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {"name": "superpoint_open", "max_num_keypoints": NK},
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

    # full pipeline
    def full(v, d):
        out = pipe.apply(v, d)
        return out["matching_scores0"].sum() + out["keypoints0"].sum()

    t_full = timed(jax.jit(full), variables, data)
    print(f"full pipeline          {t_full:7.2f} ms  ({BATCH/t_full*1e3:6.1f} pairs/s)", flush=True)

    # extractor alone (one view)
    extractor = get_model("superpoint_open").from_conf({"max_num_keypoints": NK})
    ev = extractor.init(jax.random.PRNGKey(0), data["view0"])

    def ext(v, d):
        out = extractor.apply(v, d)
        return out["keypoints"].sum() + out["descriptors"].sum()

    t_ext = timed(jax.jit(ext), ev, data["view0"])
    print(f"superpoint (1 view)    {t_ext:7.2f} ms", flush=True)

    # superpoint backbone only (shared VGG trunk)
    def ext_backbone(v, d):
        import flax.linen as fnn

        out = extractor.apply(v, d, method=getattr(type(extractor), "backbone", None))
        return sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))

    # matcher alone on extracted features
    feats = jax.jit(lambda v, d: extractor.apply(v, d))(ev, data["view0"])
    lg_data = {
        "keypoints0": feats["keypoints"],
        "keypoints1": feats["keypoints"],
        "descriptors0": feats["descriptors"],
        "descriptors1": feats["descriptors"],
        "view0": {"image_size": data["view0"]["image_size"]},
        "view1": {"image_size": data["view1"]["image_size"]},
    }
    matcher = get_model("lightglue").from_conf({"filter_threshold": 0.1, "mp": True})
    mv = matcher.init(jax.random.PRNGKey(0), lg_data)

    def mat(v, d):
        out = matcher.apply(v, d)
        return out["matching_scores0"].sum()

    t_mat = timed(jax.jit(mat), mv, lg_data)
    print(f"lightglue (9L)         {t_mat:7.2f} ms", flush=True)
    print(f"2*ext + match          {2*t_ext + t_mat:7.2f} ms (vs full {t_full:.2f})", flush=True)


if __name__ == "__main__":
    main()
