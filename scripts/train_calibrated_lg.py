"""Stage-2b of the hermetic quality loop: matchability-calibrated LightGlue.

VERDICT r3 weak #6 / next #6: the r3 stage-2 matcher was trained on hard
homographies (difficulty 0.7) where ~10% of keypoints are matchable, which
made the matchability head globally conservative — the benchmark had to run
at filter_threshold 0.0 instead of the reference default 0.1
(/root/reference/gluefactory/configs/superpoint+lightglue_homography.yaml,
filter_threshold semantics lightglue.py:321-337). It also starved the
per-layer TokenConfidence heads: mid-net match predictions stay unstable on
barely-overlapping pairs, so confidences ramp late and adaptive depth exit
(reference :595-606) never pays (VERDICT r3 missing #2).

This driver fine-tunes the committed r3 checkpoint on a calibrated mix —
easier homographies (difficulty 0.5, higher overlap => ~3-5x more matchable
points per pair) and more keypoints — which raises matchability confidence
where matches are real, stabilizes mid-net predictions, and keeps the
photometric robustness training. Run on the TPU:

    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/train_calibrated_lg.py

Then dump + validate with --dump (writes weights/hermetic/sp_open_lg.npz).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CONF = {
    "data": {
        "name": "homographies",
        "synthetic": {"do": True, "pool": 512},
        "train_size": 2048,
        "val_size": 128,
        "train_batch_size": 8,
        "num_workers": 2,
        "val_batch_size": 8,
        "homography": {
            # calibrated: ~40-60% matchable keypoints per pair vs ~10% at
            # the r3 settings (difficulty .7 / translation 1.0 / angle 50)
            "difficulty": 0.5,
            "translation": 0.4,
            "max_angle": 30,
            "patch_shape": [480, 368],
        },
        "photometric": {"name": "dark", "p": 0.8},
    },
    "model": {
        "name": "two_view_pipeline",
        "extractor": {
            "name": "superpoint_open",
            "max_num_keypoints": 512,
            "detection_threshold": 0.005,
            "dtype": None,
            "trainable": False,
        },
        "matcher": {
            "name": "lightglue",
            "filter_threshold": 0.1,
            "checkpointed": True,
            "is_training": True,
        },
        "ground_truth": {
            "name": "homography_matcher",
            "th_positive": 3.0,
            "th_negative": 5.0,
        },
    },
    "train": {
        "seed": 7,
        "epochs": 8,
        "lr": 1.0e-4,  # warm start from the r3 checkpoint: gentler than 2e-4
        "lr_schedule": {"type": "exp", "start": 1000, "exp_div_10": 2500},
        "eval_every_iter": 512,
        "save_every_iter": 256,
        "log_every_iter": 50,
        "keep_last_checkpoints": 2,
        "best_key": "loss/total",
    },
}

EXPERIMENT = "sp_open_lg_cal"


def graft_npz(trainer, npz_path):
    """Warm-start trainer.state from the flat f16 npz artifact (the r3
    committed chain): extractor params+BN stats and matcher params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.models.matchers.lightglue_pretrained import load_npz_params
    from gluefactory_tpu.parallel.mesh import replicated
    from gluefactory_tpu.train.step import TrainState
    from gluefactory_tpu.train.trainer import _graft_params

    restored = load_npz_params(npz_path)
    restored = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float16 else x, restored
    )
    state = jax.tree.map(np.asarray, trainer.state)
    params, n_p, _ = _graft_params(state.params, restored["params"])
    stats = state.batch_stats
    if restored.get("batch_stats"):
        stats, n_s, _ = _graft_params(stats, restored["batch_stats"])
        n_p += n_s
    print(f"grafted {n_p} tensors from {npz_path}")
    new = TrainState(
        step=state.step, params=params, batch_stats=stats,
        opt_state=trainer.tx.init(params),
    )
    trainer.state = jax.device_put(new, replicated(trainer.mesh))


def main():
    """Optional CLI overrides for curriculum phases:
    --phase2 runs a harder-homography continuation (difficulty 0.65) from the
    current committed npz into experiment sp_open_lg_cal2."""
    import copy

    from gluefactory_tpu.train.trainer import Trainer

    conf = copy.deepcopy(CONF)
    exp = EXPERIMENT
    if "--phase2" in sys.argv:
        # measured r4: the harder distribution re-collapses the matchability
        # calibration (9 median matches at threshold 0.1 vs phase-1's 125) —
        # kept for the record, NOT the shipped artifact
        exp = EXPERIMENT + "2"
        conf["data"]["homography"].update(
            {"difficulty": 0.65, "translation": 0.6, "max_angle": 40}
        )
        conf["train"].update({"seed": 11, "epochs": 6, "lr": 6.0e-5})
    elif "--more" in sys.argv:
        # continuation at the SAME calibrated distribution (phase-1 loss was
        # still falling at epoch 8); pass --seed N to vary the data stream
        exp = EXPERIMENT
        seed = 23
        if "--seed" in sys.argv:
            seed = int(sys.argv[sys.argv.index("--seed") + 1])
        conf["train"].update({"seed": seed, "epochs": 10, "lr": 7.0e-5})
    elif "--mix" in sys.argv:
        # r5 curriculum (VERDICT r4 next #2/#5): per-sample difficulty
        # mixing U(0.25, 0.8). Unlike the r4 --phase2 failure (ALL pairs
        # hard -> globally conservative matchability, 9 median matches at
        # threshold 0.1), every batch here mixes high-overlap pairs (which
        # anchor the calibrated operating point) with low-overlap pairs
        # whose mostly-UNMATCHABLE tokens give the matchability head the
        # hard negatives it never saw — the signal that both sharpens the
        # confident subset at filter_threshold 0.1 and lets width pruning
        # fire organically (reference get_pruning_mask lightglue.py:586-593).
        exp = EXPERIMENT + "_mix"
        seed = 31
        if "--seed" in sys.argv:
            seed = int(sys.argv[sys.argv.index("--seed") + 1])
        conf["data"]["homography"].update(
            {"difficulty_range": [0.25, 0.8], "translation": 0.5, "max_angle": 40}
        )
        conf["train"].update({"seed": seed, "epochs": 12, "lr": 7.0e-5})
    elif "--mix2" in sys.argv:
        # gentler variant after --mix collapsed the 0.1 operating point
        # (3.5 median matches vs 295 — scripts/eval_mix_candidate.py): skew
        # the range easier, fewer epochs, lower lr
        exp = EXPERIMENT + "_mix2"
        conf["data"]["homography"].update(
            {"difficulty_range": [0.3, 0.65], "translation": 0.4, "max_angle": 35}
        )
        conf["train"].update({"seed": 37, "epochs": 6, "lr": 5.0e-5})
    out = REPO / "outputs" / "training" / exp
    trainer = Trainer(conf, exp, out)
    trainer.build()
    graft_npz(trainer, REPO / "weights" / "hermetic" / "sp_open_lg.npz")
    trainer.train()


def dump():
    """Export the calibrated chain over the committed artifact (keeps the
    same consumer path: tests/test_real_schema_benchmarks.py, bench.py)."""
    import numpy as np

    from gluefactory_tpu.scripts.convert_weights import flatten_tree
    from gluefactory_tpu.utils.experiments import (
        get_best_checkpoint,
        load_checkpoint,
    )

    exp = EXPERIMENT
    if "--phase2" in sys.argv:
        exp = EXPERIMENT + "2"
    elif "--mix2" in sys.argv:
        exp = EXPERIMENT + "_mix2"
    elif "--mix" in sys.argv:
        exp = EXPERIMENT + "_mix"
    state, _ = load_checkpoint(get_best_checkpoint(exp))
    tree = {"params": state["params"]}
    if state.get("batch_stats"):
        tree["batch_stats"] = state["batch_stats"]
    flat = flatten_tree(tree)
    flat = {
        k: (v.astype(np.float16) if v.dtype == np.float32 else v)
        for k, v in flat.items()
    }
    name = "sp_open_lg.npz"
    if "--out" in sys.argv:  # candidate artifacts for A/B before promotion
        name = sys.argv[sys.argv.index("--out") + 1]
    out = REPO / "weights" / "hermetic"
    np.savez_compressed(out / name, **flat)
    print(f"wrote {out/name} ({(out/name).stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    if "--dump" in sys.argv:
        dump()
    else:
        main()
