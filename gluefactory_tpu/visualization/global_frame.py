"""Global metric-scatter frame of the interactive eval browser.

Counterpart of reference gluefactory/visualization/global_frame.py:17-220:
scatter one point per eval pair (metric `x` vs metric `y`) for each loaded
experiment, draw mean/median guide lines, support diff-vs-first-experiment
mode, and on pick spawn a child `TwoViewFrame` for the clicked pair, loading
the sample from the dataset and each experiment's cached predictions.

Headless-friendly: `draw()`, `update_x/y`, `spawn_child(name, ind)` are plain
method calls; GUI toolmanager widgets attach only when a toolmanager exists.
"""

from __future__ import annotations

import traceback

import numpy as np

from ..datasets.base_dataset import collate
from ..models.cache_loader import CacheLoader
from ..utils.tensor import rbd
from .tools import RadioHideTool


def _is_categorical(v) -> bool:
    return isinstance(np.asarray(v).flat[0], (bytes, str, np.str_, np.bytes_))


class GlobalFrame:
    default_conf = {
        "x": None,
        "y": None,
        "diff": False,
        "child": {},
        "remove_outliers": False,
    }

    def __init__(self, conf, results, loader, predictions, title=None,
                 child_frame=None):
        """`results`: experiment name -> {metric: per-pair array};
        `loader`: dataset loader whose `dataset[i]` is the i-th eval pair;
        `predictions`: experiment name -> predictions.h5 path."""
        self.conf = {**self.default_conf, **(dict(conf) if conf else {})}
        self.child_frame = child_frame
        self.results = results
        self.loader = loader
        self.predictions = predictions
        self.childs = []
        self.lines = []
        self.scatters = {}

        metrics = set()
        for res in results.values():
            metrics.update(res.keys())
        self.metrics = sorted(metrics)
        numeric = [m for m in self.metrics if m != "names"] or self.metrics
        if not self.conf["x"]:
            self.conf["x"] = numeric[0]
        if not self.conf["y"]:
            self.conf["y"] = numeric[min(1, len(numeric) - 1)]
        assert self.conf["x"] in self.metrics, (self.conf["x"], self.metrics)
        assert self.conf["y"] in self.metrics

        self.names = list(results)
        self.fig, self.axes = self.init_frame()
        if title is not None and self.fig.canvas.manager is not None:
            try:
                self.fig.canvas.manager.set_window_title(title)
            except AttributeError:
                pass
        self._wire_toolmanager()

    def init_frame(self):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button

        fig, ax = plt.subplots()
        ax.set_title("click on points")
        diffb_ax = fig.add_axes([0.01, 0.02, 0.12, 0.06])
        self.diffb = Button(diffb_ax, label="diff_only")
        self.diffb.on_clicked(self.diff_clicked)
        fig.canvas.mpl_connect("pick_event", self.on_scatter_pick)
        return fig, ax

    def _wire_toolmanager(self):  # pragma: no cover - GUI backends only
        manager = getattr(self.fig.canvas, "manager", None)
        tm = getattr(manager, "toolmanager", None)
        if tm is None or RadioHideTool is None:
            return
        self.xradios = tm.add_tool(
            "x", RadioHideTool, options=self.metrics, callback_fn=self.update_x,
            active=self.conf["x"], keymap="x",
        )
        self.yradios = tm.add_tool(
            "y", RadioHideTool, options=self.metrics, callback_fn=self.update_y,
            active=self.conf["y"], keymap="y",
        )
        if manager.toolbar is not None:
            manager.toolbar.add_tool("x", "navigation")
            manager.toolbar.add_tool("y", "navigation")

    # -- drawing -------------------------------------------------------------

    def draw(self):
        """(Re)draw the scatter of conf.x vs conf.y for every experiment."""
        self.scatters = {}
        self.lines = []
        self.axes.clear()
        self.axes.set_xlabel(self.conf["x"])
        self.axes.set_ylabel(self.conf["y"])

        first = self.results[self.names[0]]
        x_cat = _is_categorical(first[self.conf["x"]])
        y_cat = _is_categorical(first[self.conf["y"]])
        refx, refy = 0.0, 0.0
        if self.conf["diff"]:
            if not x_cat:
                refx = np.asarray(first[self.conf["x"]], float)
            if not y_cat:
                refy = np.asarray(first[self.conf["y"]], float)

        for name in self.names:
            x = np.asarray(self.results[name][self.conf["x"]])
            y = np.asarray(self.results[name][self.conf["y"]])
            if not x_cat:
                x = x.astype(float) - refx
            if not y_cat:
                y = y.astype(float) - refy
            if x_cat:
                xunique, ind, xinv = np.unique(
                    x, return_index=True, return_inverse=True
                )[:3]
                x_plot = xinv.astype(float)
            else:
                x_plot = x
            (s,) = self.axes.plot(
                x_plot, y, "o", markersize=3, label=name, picker=True,
                pickradius=5,
            )
            self.scatters[name] = s
            if x_cat and not y_cat:
                ybin = np.bincount(xinv, weights=np.nan_to_num(y))
                xbin = np.bincount(xinv)
                self.axes.step(np.arange(len(xunique)), ybin / np.maximum(xbin, 1),
                               where="mid", color=s.get_color())
                self.axes.set_xticks(np.arange(len(xunique)))
                self.axes.set_xticklabels(
                    [v.decode() if isinstance(v, bytes) else str(v)
                     for v in xunique],
                    rotation=90 if len(xunique) > 5 else 0,
                )
            if not x_cat:
                self.axes.axvline(np.nan_to_num(x).mean(), c=s.get_color(),
                                  zorder=1, alpha=1.0)
            if not y_cat:
                self.axes.axhline(np.nan_to_num(y).mean(), c=s.get_color(),
                                  zorder=1, alpha=0.5)
        self.axes.legend()
        self.fig.canvas.draw_idle()

    def update_x(self, value):
        self.conf["x"] = value
        self.draw()

    def update_y(self, value):
        self.conf["y"] = value
        self.draw()

    def diff_clicked(self, _event=None):
        self.conf["diff"] = not self.conf["diff"]
        self.draw()

    # -- interaction ---------------------------------------------------------

    def on_scatter_pick(self, handle):
        try:
            art = handle.artist
            try:
                event = handle.mouseevent.button.value
            except AttributeError:
                return
            self.spawn_child(art.get_label(), handle.ind[0], event=event)
        except Exception:  # keep the browser alive on bad pairs
            traceback.print_exc()

    def spawn_child(self, model_name, ind, event=1):
        """Highlight the picked pair across experiments and open the child
        TwoViewFrame on its sample + cached predictions."""
        for line in self.lines:
            line.remove()
        self.lines = []
        src = self.scatters[model_name]
        x0, y0 = src.get_xdata()[ind], src.get_ydata()[ind]
        for oname in self.names:
            s = self.scatters[oname]
            (ln,) = self.axes.plot([x0, s.get_xdata()[ind]],
                                   [y0, s.get_ydata()[ind]], "r")
            self.lines.append(ln)
        self.fig.canvas.draw_idle()

        if self.child_frame is None:
            return None

        sample = self.loader.dataset[ind]
        data = rbd(collate([sample]))
        name = sample.get("name", str(ind))
        preds = {
            exp: CacheLoader({"path": str(pfile), "add_data_path": False})(
                {"name": name}
            )
            for exp, pfile in self.predictions.items()
        }
        summaries_i = {
            exp: {k: v[ind] for k, v in res.items() if k not in ("names", "name")}
            for exp, res in self.results.items()
        }
        frame = self.child_frame(
            self.conf["child"], data, preds, title=str(name), event=event,
            summaries=summaries_i,
        )
        self.childs.append(frame)
        return frame
