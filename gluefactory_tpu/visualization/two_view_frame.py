"""Two-view comparison frame of the interactive eval browser.

Counterpart of reference gluefactory/visualization/two_view_frame.py:20-180:
one row of (view0, view1) axes per model, a switch-plot menu offering every
tool from `tools.__plot_dict__` whose `required_keys` are available, and a
toggleable per-model summary overlay.

Headless-friendly: all state changes are plain method calls (`draw(name)`,
`set_summary_visible(b)`); the GUI toolmanager widgets are only wired when a
toolmanager exists (interactive backends).
"""

from __future__ import annotations

import numpy as np

from . import viz2d
from .tools import RadioHideTool, ToggleTool, __plot_dict__


def _fmt_summary(d: dict) -> str:
    items = []
    for k, v in d.items():
        try:
            items.append(f"{k}: {float(v):.4f}")
        except (TypeError, ValueError):
            items.append(f"{k}: {v}")
    return "\n".join(items)


class TwoViewFrame:
    default_conf = {
        "default": "matches",
        "summary_visible": False,
    }

    plot_dict = __plot_dict__
    event_to_image = [None, "color", "depth", "color+depth"]

    def __init__(self, conf, data, preds, title=None, event=1, summaries=None):
        """`data`: one UNBATCHED dataset sample (views + GT); `preds`: model
        name -> unbatched prediction dict; `event`: mouse button (1=color,
        2=depth, 3=color+depth background)."""
        self.conf = {**self.default_conf, **(dict(conf) if conf else {})}
        self.data = data
        self.preds = preds
        self.names = list(preds.keys())
        self.plot = self.event_to_image[event] or "color"
        self.summaries = summaries
        self.fig, self.axes, self.summary_arts = self.init_frame()
        if title is not None and self.fig.canvas.manager is not None:
            try:
                self.fig.canvas.manager.set_window_title(title)
            except AttributeError:
                pass

        keys = None
        for pred in preds.values():
            keys = set(pred) if keys is None else keys & set(pred)
        keys = (keys or set()) | set(data.keys())
        self.options = [
            k for k, v in self.plot_dict.items()
            if set(v.required_keys).issubset(keys)
        ]

        self.handle = None
        self._wire_toolmanager()
        default = self.conf["default"]
        if default not in self.options and self.options:
            default = self.options[0]
        if self.options:
            self.draw(default)

    # -- construction --------------------------------------------------------

    def _images(self):
        view0, view1 = self.data["view0"], self.data["view1"]
        if self.plot in ("color", "color+depth"):
            imgs = [np.asarray(view0["image"]), np.asarray(view1["image"])]
        elif self.plot == "depth":
            imgs = [np.asarray(view0["depth"]), np.asarray(view1["depth"])]
        else:
            raise ValueError(self.plot)
        return imgs

    def init_frame(self):
        imgs = self._images()
        rows = [imgs for _ in self.names]
        fig, axes = viz2d.plot_image_grid(rows, figs=5)
        for i, name in enumerate(self.names):
            viz2d.add_text(0, name, axes=axes[i])

        if self.plot == "color+depth" and "depth" in self.data["view0"]:
            for i in range(len(self.names)):
                viz2d.plot_heatmaps(
                    [np.asarray(self.data["view0"]["depth"]),
                     np.asarray(self.data["view1"]["depth"])],
                    axes=axes[i], cmap="Spectral",
                )

        fig.canvas.mpl_connect("pick_event", self.click_artist)
        if self.summaries is not None:
            summary_arts = [
                viz2d.add_text(
                    0, _fmt_summary(self.summaries[n]), axes=axes[i],
                    pos=(0.01, 0.01), va="bottom", fs=8,
                    backgroundcolor=(0, 0, 0, 0.5),
                    visible=self.conf["summary_visible"],
                )
                for i, n in enumerate(self.names)
            ]
        else:
            summary_arts = []
        return fig, axes, summary_arts

    def _wire_toolmanager(self):  # pragma: no cover - GUI backends only
        manager = getattr(self.fig.canvas, "manager", None)
        tm = getattr(manager, "toolmanager", None)
        if tm is None or RadioHideTool is None:
            return
        self.radios = tm.add_tool(
            "switch plot", RadioHideTool, options=self.options,
            callback_fn=self.draw, active=self.conf["default"], keymap="R",
        )
        self.toggle_summary = tm.add_tool(
            "toggle summary", ToggleTool, toggled=self.conf["summary_visible"],
            callback_fn=self.set_summary_visible, keymap="t",
        )
        if manager.toolbar is not None:
            manager.toolbar.add_tool("switch plot", "navigation")

    # -- interaction ---------------------------------------------------------

    def draw(self, value: str):
        """Switch to the plot tool named `value` and redraw."""
        import matplotlib.pyplot as plt

        self.clear()
        self.conf["default"] = value
        plt.figure(self.fig.number)  # tools draw into the current figure
        self.handle = self.plot_dict[value](self.fig, self.axes, self.data,
                                            self.preds)
        return self.handle

    def clear(self):
        if self.handle is not None and hasattr(self.handle, "clear"):
            self.handle.clear()
        self.handle = None
        for row in self.axes:
            for ax in row:
                for li in list(ax.lines):
                    li.remove()
                for c in list(ax.collections):
                    c.remove()
        self.fig.artists.clear()
        self.fig.canvas.draw_idle()

    def click_artist(self, event):
        """Toggle arrowheads on a picked match line; forward to the tool."""
        art = event.artist
        if hasattr(art, "get_arrowstyle"):
            select = art.get_arrowstyle().arrow == "-"
            art.set_arrowstyle("<|-|>" if select else "-")
            if select:
                art.set_zorder(1)
        if hasattr(self.handle, "click_artist"):
            self.handle.click_artist(event)
        self.fig.canvas.draw_idle()

    def set_summary_visible(self, visible: bool):
        self.conf["summary_visible"] = visible
        for s in self.summary_arts:
            s.set_visible(visible)
        self.fig.canvas.draw_idle()
