"""Export-phase model application helper.

Host-side extractors (SIFT, LSD, wireframe — OpenCV behind pure_callback)
cannot run under jit on the axon TPU relay (no host-callback support). This
helper splits the pipeline: extractors run eagerly on host, their outputs are
attached as view caches, and ONLY the matcher graph is jitted on device —
which is also the faster arrangement (the reference reaches the same split
through its feature-cache workflow, scripts/export_local_features.py).
Device-native extractors (SuperPoint & friends) keep the single fully-jitted
program.
"""

from __future__ import annotations

import jax
import numpy as np

from ..models import get_model
from ..train.trainer import batch_to_device
from ..utils.config import to_dict

HOST_EXTRACTORS = {"sift", "lsd", "wireframe"}


def make_export_apply_fn(model_conf: dict, live_params=None):
    """Returns apply_fn(batch)->pred for the export phase, handling host
    extractors. Lazily initializes parameters from the first batch.

    `live_params`: optional params dict from a live training run (reference
    passes the in-memory model to run_benchmark, eval/__init__.py:11-20);
    matching top-level component subtrees override both the random init and
    any checkpoint overlay."""
    model_conf = to_dict(model_conf)
    extractor_conf = model_conf.get("extractor") or {}
    host_extract = extractor_conf.get("name") in HOST_EXTRACTORS
    checkpoint = model_conf.pop("checkpoint", None)

    state = {"variables": None, "jit_fn": None, "ext": None, "ext_vars": None}

    if host_extract:
        matcher_conf = dict(model_conf)
        matcher_conf["extractor"] = {"name": None}
        matcher_conf["allow_no_extract"] = True
        pipe = get_model(model_conf.get("name", "two_view_pipeline")).from_conf(
            matcher_conf
        )
        ext = get_model(extractor_conf["name"]).from_conf(extractor_conf)
        state["ext"] = ext
    else:
        pipe = get_model(model_conf.get("name", "two_view_pipeline")).from_conf(
            model_conf
        )

    def apply_fn(batch):
        dev = batch_to_device(batch)
        if host_extract:
            ext = state["ext"]
            if state["ext_vars"] is None:
                state["ext_vars"] = ext.init(
                    jax.random.PRNGKey(0), {"image": np.asarray(batch["view0"]["image"])}
                )
            for v in ("view0", "view1"):
                img = np.asarray(batch[v]["image"])
                pred_v = ext.apply(state["ext_vars"], {"image": img})
                dev[v]["cache"] = pred_v
        if state["variables"] is None:
            variables = pipe.init(jax.random.PRNGKey(0), dev)
            if checkpoint:
                # overlay trained params from an experiment checkpoint or a
                # flat f16 .npz artifact (matcher-only training stores params
                # under the same component names the eval pipeline uses)
                from ..models.matchers.lightglue_pretrained import (
                    overlay_npz_variables,
                    overlay_restored_variables,
                )

                if str(checkpoint).endswith(".npz"):
                    variables = overlay_npz_variables(variables, checkpoint)
                else:
                    from ..utils.experiments import (
                        get_best_checkpoint,
                        load_checkpoint,
                    )

                    try:
                        path = get_best_checkpoint(checkpoint)
                    except FileNotFoundError:
                        from ..utils.experiments import get_last_checkpoint

                        path = get_last_checkpoint(checkpoint)
                    restored, _ = load_checkpoint(path)
                    variables = overlay_restored_variables(variables, restored)
            if live_params is not None and "params" in variables:
                import jax as _jax

                live = dict(live_params)
                params = dict(variables["params"])
                for k in params:
                    if k in live:
                        params[k] = _jax.tree.map(np.asarray, live[k])
                variables = {**variables, "params": params}
            state["variables"] = variables
        if state["jit_fn"] is None:
            state["jit_fn"] = jax.jit(lambda vars_, d: pipe.apply(vars_, d))
        return state["jit_fn"](state["variables"], dev)

    return apply_fn, state


def match_pair_with_weights(
    superpoint_pth: str,
    lightglue_pth: str,
    work_dir,
    image0: np.ndarray | None = None,
    image1: np.ndarray | None = None,
    H_0to1: np.ndarray | None = None,
    max_num_keypoints: int = 2048,
    filter_threshold: float = 0.1,
):
    """Run official SuperPoint+LightGlue checkpoints on one image pair.

    The executable form of the reference's integration test
    (tests/test_integration.py:73-108): convert the checkpoints, build the
    pipeline, match, and measure precision@3px against the known homography.
    Without images, a reproducible textured synthetic pair is generated
    (zero-egress stand-in for the boat pair).

    Returns {"num_matches", "prec@3px", "matches0", "keypoints0/1"}.
    """
    import jax.numpy as jnp

    from ..scripts.convert_weights import (
        convert_lightglue,
        convert_superpoint,
        rename_lightglue_v01,
    )
    from ..utils import torch_io

    sp_tree = convert_superpoint(torch_io.load_state_dict(superpoint_pth))
    lg_state = rename_lightglue_v01(torch_io.load_state_dict(lightglue_pth))
    lg_tree = convert_lightglue(lg_state)
    posenc = (
        "conditional_fourier" if "posenc_cond_w" in lg_tree["params"] else "fourier"
    )

    if image0 is None:
        rng = np.random.RandomState(0)
        h, w = 480, 640
        # textured synthetic: sum of random low-frequency gratings + blobs
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.zeros((h, w), np.float32)
        for _ in range(24):
            fx, fy = rng.uniform(0.01, 0.2, 2)
            img += rng.uniform(0.2, 1.0) * np.sin(
                2 * np.pi * (fx * xx + fy * yy) + rng.uniform(0, 6.28)
            )
        img = (img - img.min()) / (np.ptp(img) + 1e-8)
        image0 = img
        H_0to1 = np.array(
            [[0.95, 0.05, 12.0], [-0.04, 0.98, -7.0], [1e-5, -2e-5, 1.0]], np.float32
        )
        from ..multipoint.utils.homographies import warp_image_bilinear

        image1 = np.asarray(
            warp_image_bilinear(
                jnp.asarray(img)[None, ..., None], jnp.asarray(H_0to1)[None]
            )
        )[0, ..., 0]
    assert H_0to1 is not None, "need H_0to1 with custom images"

    pipe = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint_magicleap",
                "max_num_keypoints": max_num_keypoints,
                "detection_threshold": 0.0005,
            },
            "matcher": {
                "name": "lightglue",
                "filter_threshold": filter_threshold,
                "posenc": posenc,
            },
        }
    )

    def view(img):
        arr = jnp.asarray(img, jnp.float32)[None, ..., None]
        hh, ww = img.shape[:2]
        return {"image": arr, "image_size": jnp.asarray([[float(ww), float(hh)]])}

    data = {"view0": view(image0), "view1": view(image1)}
    variables = pipe.init(jax.random.PRNGKey(0), data)
    params = dict(variables["params"])
    params["extractor"] = jax.tree.map(jnp.asarray, sp_tree["params"])
    params["matcher"] = jax.tree.map(jnp.asarray, lg_tree["params"])
    pred = pipe.apply({**variables, "params": params}, data)

    kpts0 = np.asarray(pred["keypoints0"][0])
    kpts1 = np.asarray(pred["keypoints1"][0])
    m0 = np.asarray(pred["matches0"][0])
    valid = m0 >= 0
    pts0 = kpts0[valid]
    pts1 = kpts1[m0[valid]]
    hom = np.concatenate([pts0, np.ones_like(pts0[:, :1])], -1) @ np.asarray(H_0to1).T
    proj = hom[:, :2] / hom[:, 2:]
    err = np.linalg.norm(proj - pts1, axis=-1)
    return {
        "num_matches": int(valid.sum()),
        "prec@3px": float((err < 3.0).mean()) if valid.any() else 0.0,
        "matches0": m0,
        "keypoints0": kpts0,
        "keypoints1": kpts1,
    }


__all__ = ["make_export_apply_fn", "match_pair_with_weights", "HOST_EXTRACTORS"]
