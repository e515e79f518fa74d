"""Pluggable two-view plot tools for the interactive eval browser.

Counterpart of reference gluefactory/visualization/tools.py:117-430: each tool
is a small class with `plot_name`, `required_keys` and an
`__init__(fig, axes, data, preds)` that draws one row of axes per model; the
registry `__plot_dict__` is what TwoViewFrame offers in its switch-plot menu.

Unlike the reference (which receives batched torch tensors), tools here take
UNBATCHED numpy/JAX arrays: `data` is one dataset sample (`utils/tensor.rbd`
applied), `preds` maps model name -> unbatched prediction dict. Poses/cameras
are our geometry pytrees (`geometry/wrappers.py`).
"""

from __future__ import annotations

import matplotlib
import numpy as np

from .viz2d import (
    cm_RdGn,
    cm_ranking,
    plot_heatmaps,
    plot_keypoints,
    plot_lines,
    plot_color_line_matches,
    plot_matches,
)

__all__ = ["__plot_dict__", "RadioHideTool", "ToggleTool"]


def _np(x):
    return np.asarray(x)


def _sigmoid_if_logits(h):
    h = _np(h)
    return 1.0 / (1.0 + np.exp(-h)) if h.min() < 0.0 else h


class ImagePlot:
    plot_name = "images"
    required_keys = ["view0", "view1"]

    def __init__(self, fig, axes, data, preds):
        pass


class KeypointPlot:
    plot_name = "keypoints"
    required_keys = ["keypoints0", "keypoints1"]

    def __init__(self, fig, axes, data, preds):
        for i, name in enumerate(preds):
            pred = preds[name]
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])], axes=axes[i]
            )


class KeypointRankingPlot:
    plot_name = "keypoint_ranking"
    required_keys = [
        "keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1",
    ]

    def __init__(self, fig, axes, data, preds):
        for i, name in enumerate(preds):
            pred = preds[name]
            sc0, sc1 = _np(pred["keypoint_scores0"]), _np(pred["keypoint_scores1"])
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])],
                axes=axes[i],
                colors=[cm_ranking(sc0), cm_ranking(sc1)],
            )


class KeypointScoresPlot:
    plot_name = "keypoint_scores"
    required_keys = [
        "keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1",
    ]

    def __init__(self, fig, axes, data, preds):
        for i, name in enumerate(preds):
            pred = preds[name]
            sc0, sc1 = _np(pred["keypoint_scores0"]), _np(pred["keypoint_scores1"])
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])],
                axes=axes[i],
                colors=[cm_RdGn(sc0), cm_RdGn(sc1)],
            )


class HeatmapPlot:
    plot_name = "heatmaps"
    required_keys = ["heatmap0", "heatmap1"]

    def __init__(self, fig, axes, data, preds):
        self.artists = []
        for i, name in enumerate(preds):
            pred = preds[name]
            hmaps = [_sigmoid_if_logits(pred["heatmap0"]),
                     _sigmoid_if_logits(pred["heatmap1"])]
            self.artists += plot_heatmaps(hmaps, axes=axes[i], cmap="rainbow")

    def clear(self):
        for x in self.artists:
            x.remove()


def _valid_matches(pred):
    kp0, kp1 = _np(pred["keypoints0"]), _np(pred["keypoints1"])
    m0 = _np(pred["matches0"])
    valid = m0 > -1
    if "keypoint_mask0" in pred:
        valid &= _np(pred["keypoint_mask0"]).astype(bool)
    return kp0[valid], kp1[m0[valid]], valid


class MatchesPlot:
    plot_name = "matches"
    required_keys = ["keypoints0", "keypoints1", "matches0", "matching_scores0"]

    def __init__(self, fig, axes, data, preds):
        self.fig = fig
        for i, name in enumerate(preds):
            pred = preds[name]
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])],
                axes=axes[i], colors="blue",
            )
            kpm0, kpm1, valid = _valid_matches(pred)
            mscores = _np(pred["matching_scores0"])[valid]
            plot_matches(
                kpm0, kpm1, color=cm_RdGn(mscores).tolist(), axes=axes[i],
                labels=mscores, lw=0.5,
            )


class GtMatchesPlot:
    plot_name = "gt_matches"
    required_keys = ["keypoints0", "keypoints1", "matches0", "gt_matches0"]

    def __init__(self, fig, axes, data, preds):
        self.fig = fig
        for i, name in enumerate(preds):
            pred = preds[name]
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])],
                axes=axes[i], colors="blue",
            )
            kpm0, kpm1, valid = _valid_matches(pred)
            m0 = _np(pred["matches0"])
            gtm0 = _np(
                pred.get("gt_matches0", data.get("gt_matches0"))
            )
            # correct = predicted index agrees with GT (ignore IGNORE=-2 rows)
            correct = (gtm0 == m0)[valid]
            ignore = (gtm0 == -2)[valid]
            color = cm_RdGn(np.where(ignore, 0.5, correct.astype(float))).tolist()
            plot_matches(kpm0, kpm1, color=color, axes=axes[i], lw=0.5)


class LinePlot:
    plot_name = "lines"
    required_keys = ["lines0", "lines1"]

    def __init__(self, fig, axes, data, preds):
        for i, name in enumerate(preds):
            pred = preds[name]
            plot_lines([_np(pred["lines0"]), _np(pred["lines1"])],
                       indices=(2 * i, 2 * i + 1))


class LineMatchesPlot:
    plot_name = "line_matches"
    required_keys = ["lines0", "lines1", "line_matches0"]

    def __init__(self, fig, axes, data, preds):
        for i, name in enumerate(preds):
            pred = preds[name]
            lines0, lines1 = _np(pred["lines0"]), _np(pred["lines1"])
            m0 = _np(pred["line_matches0"])
            valid = m0 > -1
            plot_color_line_matches(
                [lines0[valid], lines1[m0[valid]]], indices=(2 * i, 2 * i + 1)
            )


class HomographyMatchesPlot:
    plot_name = "homography_matches"
    required_keys = ["keypoints0", "keypoints1", "matches0", "H_0to1"]

    def __init__(self, fig, axes, data, preds, threshold: float = 3.0):
        from ..geometry.homography import sym_homography_error

        self.fig = fig
        H = _np(data["H_0to1"])
        for i, name in enumerate(preds):
            pred = preds[name]
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])],
                axes=axes[i], colors="blue",
            )
            kpm0, kpm1, valid = _valid_matches(pred)
            errors = _np(sym_homography_error(kpm0, kpm1, H))
            plot_matches(
                kpm0, kpm1,
                color=cm_RdGn((errors < threshold).astype(float)).tolist(),
                axes=axes[i], labels=errors, lw=0.5,
            )


class EpipolarMatchesPlot:
    plot_name = "epipolar_matches"
    required_keys = ["keypoints0", "keypoints1", "matches0", "T_0to1",
                     "view0", "view1"]

    def __init__(self, fig, axes, data, preds, threshold: float = 3.0):
        import jax.numpy as jnp

        from ..geometry.epipolar import T_to_F, sym_epipolar_distance

        self.fig = fig
        self.axes = axes
        cam0 = data["view0"]["camera"]
        cam1 = data["view1"]["camera"]
        T_0to1 = data["T_0to1"]
        F = T_to_F(cam0, cam1, T_0to1)
        for i, name in enumerate(preds):
            pred = preds[name]
            plot_keypoints(
                [_np(pred["keypoints0"]), _np(pred["keypoints1"])],
                axes=axes[i], colors="blue",
            )
            kpm0, kpm1, valid = _valid_matches(pred)
            errors = np.sqrt(np.maximum(_np(
                sym_epipolar_distance(jnp.asarray(kpm0), jnp.asarray(kpm1), F)
            ), 0.0))
            plot_matches(
                kpm0, kpm1,
                color=cm_RdGn((errors < threshold).astype(float)).tolist(),
                axes=axes[i], labels=errors, lw=0.5,
            )


__plot_dict__ = {
    obj.plot_name: obj
    for obj in (
        ImagePlot, KeypointPlot, KeypointRankingPlot, KeypointScoresPlot,
        HeatmapPlot, MatchesPlot, GtMatchesPlot, LinePlot, LineMatchesPlot,
        HomographyMatchesPlot, EpipolarMatchesPlot,
    )
}


# --- toolbar widgets (interactive sessions only; reference tools.py:29-114) --

try:  # pragma: no cover - exercised only with a GUI toolmanager
    from matplotlib.backend_tools import ToolToggleBase

    class RadioHideTool(ToolToggleBase):
        """Toolbar toggle showing a radio menu of options (metric / plot
        switcher); calls `callback_fn(option)` on select."""

        default_toggled = False
        radio_group = "default"

        def __init__(self, *args, options=(), active=None, callback_fn=None,
                     keymap="R", **kwargs):
            super().__init__(*args, **kwargs)
            self.f = 1.0
            self.options = list(options)
            self.callback_fn = callback_fn
            self.active = self.options.index(active) if active in self.options else 0
            self.default_keymap = keymap
            self.enabled = self.default_toggled

        def build_radios(self):
            import matplotlib.pyplot as plt
            from matplotlib.widgets import RadioButtons

            w = max([len(x) for x in self.options] + [1]) * 8 / 100 + 0.5
            self.radios_fig = plt.figure(figsize=(w, min(0.25 * len(self.options), 8)))
            self.radios_ax = self.radios_fig.add_axes([0.0, 0.0, 1.0, 1.0])
            self.radios = RadioButtons(self.radios_ax, self.options, active=self.active)
            self.radios.on_clicked(self.on_radio_clicked)

        def enable(self, *args):
            self.build_radios()
            self.radios_fig.canvas.draw_idle()

        def disable(self, *args):
            import matplotlib.pyplot as plt

            plt.close(self.radios_fig)

        def on_radio_clicked(self, value):
            self.active = self.options.index(value)
            enabled = self.toggled
            if enabled:
                self.disable()
            if self.callback_fn is not None:
                self.callback_fn(value)

    class ToggleTool(ToolToggleBase):
        """Simple on/off toolbar toggle wired to `callback_fn(bool)`."""

        radio_group = "default"

        def __init__(self, *args, callback_fn=None, keymap="t", **kwargs):
            super().__init__(*args, **kwargs)
            self.f = 1.0
            self.callback_fn = callback_fn
            self.default_keymap = keymap
            self.enabled = self.default_toggled

        def enable(self, *args):
            self.callback_fn(True)

        def disable(self, *args):
            self.callback_fn(False)

except Exception:  # pragma: no cover
    RadioHideTool = None
    ToggleTool = None
