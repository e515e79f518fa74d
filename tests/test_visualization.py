"""Headless (Agg) tests of the visualization stack: viz2d primitives, the
pluggable two-view plot tools, and the GlobalFrame/TwoViewFrame browser
driven programmatically (pick events simulated as direct method calls)."""

import h5py
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from gluefactory_tpu.visualization import viz2d
from gluefactory_tpu.visualization.global_frame import GlobalFrame
from gluefactory_tpu.visualization.tools import __plot_dict__
from gluefactory_tpu.visualization.two_view_frame import TwoViewFrame


@pytest.fixture(autouse=True)
def close_figs():
    yield
    plt.close("all")


def make_pred(rng, n=32, w=64, h=48):
    kp0 = rng.rand(n, 2) * [w, h]
    kp1 = rng.rand(n, 2) * [w, h]
    m0 = np.full(n, -1, np.int32)
    m0[: n // 2] = rng.permutation(n)[: n // 2]
    return {
        "keypoints0": kp0.astype(np.float32),
        "keypoints1": kp1.astype(np.float32),
        "keypoint_scores0": rng.rand(n).astype(np.float32),
        "keypoint_scores1": rng.rand(n).astype(np.float32),
        "matches0": m0,
        "matching_scores0": rng.rand(n).astype(np.float32),
    }


def make_data(rng, w=64, h=48):
    return {
        "name": "pair0",
        "view0": {"image": rng.rand(h, w).astype(np.float32)},
        "view1": {"image": rng.rand(h, w).astype(np.float32)},
        "H_0to1": np.eye(3, dtype=np.float32),
        "gt_matches0": np.full(32, -1, np.int32),
    }


class TestViz2d:
    def test_plot_image_grid(self, rng):
        imgs = [[rng.rand(48, 64), rng.rand(48, 64)] for _ in range(2)]
        fig, axes = viz2d.plot_image_grid(imgs)
        assert len(axes) == 2 and len(axes[0]) == 2
        assert len(fig.axes) == 4

    def test_cm_ranking_bands(self):
        sc = np.arange(2000)[::-1].astype(float)  # already sorted descending
        colors = viz2d.cm_ranking(sc, ths=(512, 1024, 2048, 4096))
        assert colors[0] == "red" and colors[511] == "red"
        assert colors[512] == "yellow" and colors[1023] == "yellow"
        assert colors[1024] == "lime"

    def test_plot_matches_labels(self, rng):
        imgs = [rng.rand(48, 64)] * 2
        fig, axes = viz2d.plot_images(imgs)
        kp = rng.rand(5, 2) * [64, 48]
        viz2d.plot_matches(kp, kp, labels=np.arange(5.0), axes=axes)
        labels = [float(a.get_label()) for a in fig.artists]
        assert labels == [0.0, 1.0, 2.0, 3.0, 4.0]


class TestTwoViewFrame:
    def test_options_and_switch(self, rng):
        data = make_data(rng)
        preds = {"expA": make_pred(rng), "expB": make_pred(rng)}
        frame = TwoViewFrame(
            {"default": "matches"}, data, preds,
            summaries={"expA": {"m": 1.0}, "expB": {"m": 2.0}},
        )
        # tools whose keys exist must all be offered
        for opt in ["images", "keypoints", "keypoint_scores", "keypoint_ranking",
                    "matches", "gt_matches", "homography_matches"]:
            assert opt in frame.options, (opt, frame.options)
        assert "epipolar_matches" not in frame.options  # no camera/pose present
        assert len(frame.axes) == 2 and len(frame.axes[0]) == 2

        # matches drawn as figure-level artists; keypoints as collections
        assert len(frame.fig.artists) > 0
        for opt in frame.options:
            frame.draw(opt)  # switching plots must not raise
        frame.draw("matches")
        assert len(frame.fig.artists) > 0

        # summary overlay toggle
        assert not frame.summary_arts[0].get_visible()
        frame.set_summary_visible(True)
        assert frame.summary_arts[0].get_visible()

    def test_homography_matches_coloring(self, rng):
        """Perfect matches under identity H must all be green."""
        n = 8
        kp = (rng.rand(n, 2) * [64, 48]).astype(np.float32)
        pred = {
            "keypoints0": kp, "keypoints1": kp,
            "matches0": np.arange(n, dtype=np.int32),
            "matching_scores0": np.ones(n, np.float32),
        }
        data = make_data(rng)
        frame = TwoViewFrame({"default": "homography_matches"}, data,
                             {"exp": pred})
        colors = [a.get_edgecolor()[:3] for a in frame.fig.artists]
        for c in colors:
            np.testing.assert_allclose(c, (0, 1, 0), atol=1e-6)  # green


class FakeLoader:
    def __init__(self, samples):
        self.dataset = samples


class TestGlobalFrame:
    @pytest.fixture()
    def setup(self, rng, tmp_path):
        samples = [make_data(rng) for _ in range(4)]
        for i, s in enumerate(samples):
            s["name"] = f"pair{i}"
        results, predictions = {}, {}
        for exp in ("expA", "expB"):
            pfile = tmp_path / f"{exp}.h5"
            with h5py.File(pfile, "w") as f:
                for s in samples:
                    g = f.create_group(s["name"])
                    for k, v in make_pred(rng).items():
                        g[k] = v
            results[exp] = {
                "names": np.asarray([s["name"] for s in samples], dtype="S"),
                "prec@3px": rng.rand(4),
                "num_matches": rng.randint(10, 100, 4).astype(float),
            }
            predictions[exp] = pfile
        loader = FakeLoader(samples)
        return results, loader, predictions

    def test_draw_and_spawn_child(self, setup):
        results, loader, predictions = setup
        frame = GlobalFrame(
            {"x": "num_matches", "y": "prec@3px", "child": {"default": "matches"}},
            results, loader, predictions, child_frame=TwoViewFrame,
        )
        frame.draw()
        assert set(frame.scatters) == {"expA", "expB"}
        assert len(frame.scatters["expA"].get_xdata()) == 4

        child = frame.spawn_child("expA", 2, event=1)
        assert isinstance(child, TwoViewFrame)
        assert set(child.preds) == {"expA", "expB"}
        assert "matches" in child.options
        assert child.summaries["expA"]["prec@3px"] == results["expA"]["prec@3px"][2]
        # pair highlight lines drawn
        assert len(frame.lines) == 2

    def test_metric_switch_and_diff(self, setup):
        results, loader, predictions = setup
        frame = GlobalFrame(
            {"x": "num_matches", "y": "prec@3px"}, results, loader, predictions
        )
        frame.draw()
        frame.update_x("prec@3px")
        assert frame.conf["x"] == "prec@3px"
        frame.update_y("num_matches")
        # diff mode: first experiment becomes the zero reference
        frame.diff_clicked()
        assert frame.conf["diff"]
        np.testing.assert_allclose(frame.scatters["expA"].get_ydata(), 0.0)

    def test_categorical_axis(self, setup):
        results, loader, predictions = setup
        frame = GlobalFrame(
            {"x": "names", "y": "prec@3px"}, results, loader, predictions
        )
        frame.draw()  # bytes metric on x -> categorical path must not raise
        assert len(frame.scatters["expA"].get_xdata()) == 4


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
