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
                # overlay trained params from an experiment checkpoint
                # (matcher-only training stores params under the same
                # component names the eval pipeline uses)
                from ..utils.experiments import get_best_checkpoint, load_checkpoint

                try:
                    path = get_best_checkpoint(checkpoint)
                except FileNotFoundError:
                    from ..utils.experiments import get_last_checkpoint

                    path = get_last_checkpoint(checkpoint)
                restored, _ = load_checkpoint(path)
                trained = restored["params"]
                params = dict(variables["params"])
                for k in params:
                    if k in trained:
                        params[k] = trained[k]
                variables = {**variables, "params": params}
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


__all__ = ["make_export_apply_fn", "HOST_EXTRACTORS"]
