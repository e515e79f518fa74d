"""Integration test of the two-phase eval pipeline with real (SIFT) features:
the TPU counterpart of the reference's download-based integration test
(tests/test_integration.py:48-108) — hermetic synthetic pairs instead of
downloaded weights, real RANSAC, quantitative floors."""

from pathlib import Path

import numpy as np
import pytest

from gluefactory_tpu.eval.synthetic import SyntheticHomographyPipeline


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    conf = {
        "data": {
            "val_size": 5,
            "synthetic": {"do": True, "pool": 12, "size": [480, 360]},
            "homography": {
                "patch_shape": [320, 240], "difficulty": 0.4, "max_angle": 20,
            },
        },
        "model": {
            "extractor": {"name": "sift", "max_num_keypoints": 512},
            "matcher": {"name": "nearest_neighbor_matcher", "ratio_thresh": 0.9},
        },
        "eval": {"ransac_th": 2.0},
    }
    d = tmp_path_factory.mktemp("eval") / "run"
    pipe = SyntheticHomographyPipeline(conf)
    summaries, figures, results = pipe.run(Path(d))
    return d, summaries, results


class TestSyntheticEvalPipeline:
    def test_quantitative_floors(self, pipeline_run):
        """SIFT+NN+RANSAC on moderate synthetic warps must solve the pairs
        (analog of reference integration floors: matches>1300, prec@3px>0.8,
        H_err<1.0 on the boat pair)."""
        _, s, _ = pipeline_run
        assert s["mprec@3px"] > 0.8, s
        assert s["mnum_matches"] > 100, s
        assert s["mH_error_ransac"] < 1.0, s
        assert s["H_error_ransac@3px"] > 0.7, s

    def test_artifacts_written(self, pipeline_run):
        d, _, _ = pipeline_run
        assert (d / "predictions.h5").exists()
        assert (d / "results.h5").exists()
        assert (d / "summaries.json").exists()
        assert (d / "conf.yaml").exists()

    def test_rerun_uses_cache_and_guards_conf(self, pipeline_run):
        d, s_first, _ = pipeline_run
        # re-run with same conf: uses cached predictions, same summaries
        conf_same = {
            "data": {
                "val_size": 5,
                "synthetic": {"do": True, "pool": 12, "size": [480, 360]},
                "homography": {
                    "patch_shape": [320, 240], "difficulty": 0.4, "max_angle": 20,
                },
            },
            "model": {
                "extractor": {"name": "sift", "max_num_keypoints": 512},
                "matcher": {"name": "nearest_neighbor_matcher", "ratio_thresh": 0.9},
            },
            "eval": {"ransac_th": 2.0},
        }
        pipe = SyntheticHomographyPipeline(conf_same)
        s2, _, _ = pipe.run(Path(d))
        assert s2["mH_error_ransac"] == s_first["mH_error_ransac"]
        # changed model conf without overwrite -> hard error
        conf_changed = {**conf_same, "model": {
            "extractor": {"name": "sift", "max_num_keypoints": 256},
            "matcher": {"name": "nearest_neighbor_matcher"},
        }}
        with pytest.raises(AssertionError):
            SyntheticHomographyPipeline(conf_changed).run(Path(d))


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])


class TestInspect:
    def test_headless_inspect(self, pipeline_run, monkeypatch, tmp_path):
        """The inspect CLI renders a metric scatter + pair figures headless."""
        import sys

        import gluefactory_tpu.eval.inspect as inspect_mod

        d, _, _ = pipeline_run
        monkeypatch.setattr(inspect_mod, "EVAL_PATH", d.parent)
        monkeypatch.setattr(
            sys, "argv",
            ["inspect", d.name, "--metric", "H_error_ransac",
             "--output", str(tmp_path), "--n_extremes", "1"],
        )
        inspect_mod.main()
        # metric resolves to the threshold-suffixed key
        assert list(tmp_path.glob("H_error_ransac*.png"))
        pngs = list(tmp_path.glob("*.png"))
        assert len(pngs) >= 2  # scatter + at least one pair figure


class TestEvalIoCheckpointConf:
    def test_checkpoint_model_conf_folded(self, tmp_path, monkeypatch):
        """--checkpoint must evaluate the TRAINED architecture: the
        experiment's stored model conf replaces the benchmark default and
        training-only knobs are sanitized (reference io.py:59-65)."""
        import argparse

        import gluefactory_tpu.eval.io as eval_io
        from gluefactory_tpu.utils.config import save_yaml

        monkeypatch.setattr(eval_io, "TRAINING_PATH", tmp_path)
        exp = tmp_path / "my_exp"
        exp.mkdir()
        save_yaml(
            {
                "model": {
                    "name": "two_view_pipeline",
                    "extractor": {"name": "sift_tpu", "max_num_keypoints": 99},
                    "matcher": {"name": "lightglue", "input_dim": 128,
                                "is_training": True},
                    "ground_truth": {"name": "homography_matcher"},
                },
                "train": {"lr": 1e-4},
            },
            exp / "config.yaml",
        )
        args = argparse.Namespace(
            conf=None, tag=None, checkpoint="my_exp", dotlist=[]
        )
        default = {
            "data": {},
            "model": {"extractor": {"name": "superpoint_open",
                                    "detection_threshold": 0.0}},
            "eval": {},
        }
        tag, conf = eval_io.parse_eval_args("synthetic", args, default)
        assert tag == "my_exp"
        assert conf["model"]["extractor"]["name"] == "sift_tpu"
        assert conf["model"]["extractor"]["max_num_keypoints"] == 99
        # benchmark default model conf must not leak under the ckpt arch
        assert "detection_threshold" not in conf["model"]["extractor"]
        # training-only knobs sanitized
        assert "is_training" not in conf["model"]["matcher"]
        assert "ground_truth" not in conf["model"]
        assert conf["model"]["checkpoint"] == "my_exp"


class TestLiveParamsOverride:
    def test_live_params_take_effect(self):
        """run_benchmark(model=params) must overlay the live training params
        onto the export model (reference passes the in-memory model,
        eval/__init__.py:11-20)."""
        import jax
        import numpy as np

        from gluefactory_tpu.eval.export_helper import make_export_apply_fn

        conf = {
            "extractor": {
                "name": "superpoint_open", "max_num_keypoints": 32,
                "channels": [8, 8, 16], "descriptor_dim": 32,
                "detection_threshold": 0.0,
            },
            "matcher": {"name": "nearest_neighbor_matcher"},
        }
        rng = np.random.RandomState(0)
        img = rng.rand(1, 64, 64, 1).astype(np.float32)
        batch = {
            "view0": {"image": img},
            "view1": {"image": img[:, ::-1].copy()},
        }
        apply_fn, state = make_export_apply_fn(dict(conf))
        apply_fn(batch)
        base = state["variables"]["params"]

        live = {"extractor": jax.tree.map(lambda x: x + 1.0, base["extractor"])}
        apply_fn2, state2 = make_export_apply_fn(dict(conf), live_params=live)
        apply_fn2(batch)
        got = jax.tree.leaves(state2["variables"]["params"]["extractor"])
        want = jax.tree.leaves(live["extractor"])
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))
