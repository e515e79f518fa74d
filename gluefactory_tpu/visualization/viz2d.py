"""2D visualization primitives.

Counterpart of reference gluefactory/visualization/viz2d.py:54-486: plot
images / keypoints / matches / lines / epipolar lines / heatmaps / cumulative
error curves with matplotlib. Inputs are numpy arrays (HWC float [0,1] images,
xy keypoints).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.patheffects as path_effects
import matplotlib.pyplot as plt
import numpy as np

__all__ = [
    "cm_RdGn", "cm_ranking", "plot_images", "plot_image_grid",
    "plot_keypoints", "plot_matches", "plot_lines",
    "plot_color_line_matches", "plot_heatmaps", "plot_cumulative",
    "add_text", "save_plot",
]


def cm_RdGn(x):
    """Map [0, 1] to a red->green colormap (reference viz2d.py:25-29)."""
    x = np.clip(np.asarray(x, float), 0, 1)[..., None] * 2
    c = x * np.array([[0, 1.0, 0]]) + (2 - x) * np.array([[1.0, 0, 0]])
    return np.clip(c, 0, 1)


def cm_ranking(sc, ths=(512, 1024, 2048, 4096)):
    """Color keypoints by score rank band: the strongest 512 red, next band
    yellow, ... (reference viz2d.py:32-42)."""
    sc = np.asarray(sc)
    colors = ["red", "yellow", "lime", "cyan", "blue"]
    ranks = np.empty(len(sc), int)
    ranks[np.argsort(-sc)] = np.arange(len(sc))
    bands = np.searchsorted(np.asarray(ths), ranks, side="right")
    return [colors[min(b, len(colors) - 1)] for b in bands]


def plot_images(imgs, titles=None, cmaps="gray", dpi=100, size=6, pad=0.5):
    """Plot a row of images (reference viz2d.py:54-79)."""
    n = len(imgs)
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * n
    imgs = [im[..., 0] if im.ndim == 3 and im.shape[-1] == 1 else im for im in imgs]
    ratios = [im.shape[1] / im.shape[0] for im in imgs]
    figsize = [sum(ratios) * size, size]
    fig, axs = plt.subplots(1, n, figsize=figsize, dpi=dpi,
                            gridspec_kw={"width_ratios": ratios})
    if n == 1:
        axs = [axs]
    for i, (img, ax) in enumerate(zip(imgs, axs)):
        ax.imshow(img, cmap=plt.get_cmap(cmaps[i]))
        ax.set_axis_off()
        if titles:
            ax.set_title(titles[i])
    fig.tight_layout(pad=pad)
    return fig, axs


def plot_image_grid(imgs, titles=None, cmaps="gray", dpi=100, pad=0.5, figs=3.0):
    """Plot a GRID of images: imgs is a list of rows, each row a list of
    images (reference viz2d.py plot_image_grid). Returns (fig, axes) with
    axes[i] = list of the i-th row's axes."""
    nr = len(imgs)
    nc = max(len(row) for row in imgs)
    imgs = [
        [im[..., 0] if im.ndim == 3 and im.shape[-1] == 1 else im for im in row]
        for row in imgs
    ]
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * nc
    figsize = [figs * nc, figs * nr * imgs[0][0].shape[0] / imgs[0][0].shape[1]]
    fig, axs = plt.subplots(nr, nc, figsize=figsize, dpi=dpi, squeeze=False)
    for i, row in enumerate(imgs):
        for j, img in enumerate(row):
            axs[i][j].imshow(img, cmap=plt.get_cmap(cmaps[j]))
            axs[i][j].set_axis_off()
            if titles is not None:
                axs[i][j].set_title(titles[i][j])
    fig.tight_layout(pad=pad)
    return fig, [list(r) for r in axs]


def plot_keypoints(kpts, colors="lime", ps=4, axes=None, a=1.0):
    """Scatter keypoints on existing axes (reference viz2d.py:82-98)."""
    if axes is None:
        axes = plt.gcf().axes
    if not isinstance(colors, list):
        colors = [colors] * len(kpts)
    for ax, k, c in zip(axes, kpts, colors):
        k = np.asarray(k)
        ax.scatter(k[:, 0], k[:, 1], c=c, s=ps, linewidths=0, alpha=a)


def plot_matches(kpts0, kpts1, color=None, lw=1.5, ps=4, a=1.0, axes=None,
                 labels=None):
    """Draw match lines between two image axes (reference viz2d.py:101-152).
    `labels` attaches a per-match value to each line artist (used by the
    interactive viewer to recolor by threshold)."""
    fig = plt.gcf()
    if axes is None:
        ax0, ax1 = fig.axes[:2]
    else:
        ax0, ax1 = axes
    kpts0 = np.asarray(kpts0)
    kpts1 = np.asarray(kpts1)
    if color is None:
        color = matplotlib.cm.hsv(np.random.rand(len(kpts0))).tolist()
    elif not isinstance(color, (list, np.ndarray)):
        color = [color] * len(kpts0)
    for i in range(len(kpts0)):
        art = matplotlib.patches.ConnectionPatch(
            xyA=tuple(kpts0[i]), coordsA=ax0.transData,
            xyB=tuple(kpts1[i]), coordsB=ax1.transData,
            color=color[i] if not isinstance(color, np.ndarray) else color[i],
            linewidth=lw, alpha=a, zorder=1, picker=5.0,
        )
        if labels is not None:
            art.set_label(str(float(np.asarray(labels)[i])))
        fig.add_artist(art)
    if ps > 0:
        ax0.scatter(kpts0[:, 0], kpts0[:, 1], c=color, s=ps)
        ax1.scatter(kpts1[:, 0], kpts1[:, 1], c=color, s=ps)


def plot_lines(lines, line_colors="orange", point_colors="cyan", ps=4, lw=2,
               alpha=1.0, indices=(0, 1)):
    """Draw line segments + endpoints (reference viz2d.py:247-282)."""
    axes = plt.gcf().axes
    if not isinstance(line_colors, list):
        line_colors = [line_colors] * len(lines)
    for idx, l in zip(indices, lines):
        ax = axes[idx]
        l = np.asarray(l)
        for seg, c in zip(l, [line_colors[0]] * len(l)):
            ax.plot([seg[0, 0], seg[1, 0]], [seg[0, 1], seg[1, 1]],
                    c=c, linewidth=lw, alpha=alpha)
        pts = l.reshape(-1, 2)
        ax.scatter(pts[:, 0], pts[:, 1], c=point_colors, s=ps, zorder=2)


def plot_color_line_matches(lines, correct_matches=None, lw=2, indices=(0, 1)):
    """Color-coded matched lines across two axes (reference viz2d.py:285-320)."""
    n_lines = len(lines[0])
    colors = matplotlib.cm.hsv(np.linspace(0, 1, n_lines))
    np.random.RandomState(0).shuffle(colors)
    axes = plt.gcf().axes
    for idx, l in zip(indices, lines):
        ax = axes[idx]
        for i, seg in enumerate(np.asarray(l)):
            ax.plot([seg[0, 0], seg[1, 0]], [seg[0, 1], seg[1, 1]],
                    c=colors[i], linewidth=lw)


def plot_heatmaps(heatmaps, vmin=0.0, vmax=None, cmap="turbo", a=0.5, axes=None):
    """Overlay heatmaps on images (reference viz2d.py:323-343)."""
    if axes is None:
        axes = plt.gcf().axes
    for ax, h in zip(axes, heatmaps):
        ax.imshow(np.asarray(h), alpha=a, vmin=vmin, vmax=vmax,
                  cmap=plt.get_cmap(cmap))


def plot_cumulative(errors: dict, thresholds, colors=None, title="",
                    unit="px", logx=False):
    """Cumulative error curves (reference viz2d.py:446-486)."""
    fig, ax = plt.subplots(figsize=[5, 8])
    thresholds = np.linspace(min(thresholds), max(thresholds), 100)
    for name, errs in errors.items():
        errs = np.sort(np.asarray(errs, float))
        recall = (np.arange(len(errs)) + 1) / len(errs)
        ax.plot(
            np.r_[errs, [max(thresholds)]],
            np.r_[recall, [recall[-1] if len(recall) else 0]],
            label=name,
        )
    if logx:
        ax.set_xscale("log")
    ax.set_xlim(min(thresholds), max(thresholds))
    ax.set_ylim(0, 1)
    ax.set_xlabel(f"error ({unit})")
    ax.set_ylabel("recall")
    ax.set_title(title)
    ax.legend()
    return fig


def add_text(idx, text, pos=(0.01, 0.99), fs=15, color="w", lcolor="k",
             lwidth=2, ha="left", va="top", axes=None, visible=True,
             backgroundcolor=None):
    """Annotate an axis; returns the text artist (reference viz2d.py:346-365)."""
    if axes is None:
        ax = plt.gcf().axes[idx]
    else:
        ax = axes[idx] if isinstance(axes, (list, tuple)) else axes
    kw = {}
    if backgroundcolor is not None:
        kw["backgroundcolor"] = backgroundcolor
    t = ax.text(*pos, text, fontsize=fs, ha=ha, va=va, color=color,
                transform=ax.transAxes, visible=visible, **kw)
    if lcolor is not None:
        t.set_path_effects([
            path_effects.Stroke(linewidth=lwidth, foreground=lcolor),
            path_effects.Normal(),
        ])
    return t


def save_plot(path, **kw):
    plt.savefig(path, bbox_inches="tight", pad_inches=0, **kw)
