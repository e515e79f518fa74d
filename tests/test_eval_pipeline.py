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
