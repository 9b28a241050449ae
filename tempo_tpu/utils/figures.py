"""House figure toolkit: small declarative helpers shared by every
figure-producing module (training plots, sweep figures, probe analysis).

The *artifacts* — filenames, panel layout, and the information shown — stay
at parity with the reference pipeline's outputs so downstream consumers see
the same pictures; the construction code here is the project's own idiom:
one grid constructor, one finisher, and composable panel fillers instead of
per-figure matplotlib boilerplate.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

# one categorical color per L2 product, reused everywhere a product shows up
PRODUCT_COLORS = ("tab:red", "tab:blue", "tab:green", "tab:purple")

GRID_ALPHA = 0.3


def product_color(index: int) -> str:
    return PRODUCT_COLORS[index % len(PRODUCT_COLORS)]


def new_grid(rows: int, cols: int, panel: tuple = (4.0, 4.0)):
    """Always returns (fig, axes[rows, cols]) — no 1-D special cases."""
    fig, axes = plt.subplots(rows, cols,
                             figsize=(panel[0] * cols, panel[1] * rows),
                             squeeze=False)
    return fig, axes


def finish(fig, path: Path, suptitle: Optional[str] = None,
           dpi: int = 150) -> Path:
    """Apply the suptitle/layout/save/close tail every figure shares."""
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return Path(path)


def stats_box(ax, values: np.ndarray, decimals: int = 3,
              count: bool = False, face: str = "white") -> None:
    """Corner annotation with the summary stats the reference figures carry
    (mean/std/min/max, optionally N)."""
    values = np.asarray(values)
    if values.size == 0 or not np.isfinite(values).any():
        return
    finite = values[np.isfinite(values)]
    lines = [f"Mean: {finite.mean():.{decimals}f}",
             f"Std: {finite.std():.{decimals}f}",
             f"Min: {finite.min():.{decimals}f}",
             f"Max: {finite.max():.{decimals}f}"]
    if count:
        lines.append(f"N: {finite.size}")
    ax.text(0.02, 0.98, "\n".join(lines), transform=ax.transAxes,
            fontsize=8, va="top",
            bbox=dict(boxstyle="round", facecolor=face, alpha=0.8))


def hist_panel(ax, values: np.ndarray, title: str = "",
               xlabel: str = "", ylabel: str = "Count", bins: int = 100,
               color: Optional[str] = None, log_y: bool = True,
               density: bool = False, show_stats: bool = True,
               stats_face: str = "white") -> None:
    values = np.asarray(values).ravel()
    finite = values[np.isfinite(values)]
    if finite.size:
        ax.hist(finite, bins=bins, alpha=0.7, color=color, density=density)
        if log_y:
            ax.set_yscale("log")
        if show_stats:
            stats_box(ax, finite, face=stats_face,
                      count=density is False and ylabel == "Count")
    else:
        ax.text(0.5, 0.5, "no finite values", transform=ax.transAxes,
                ha="center", va="center")
    ax.set_title(title, fontweight="bold")
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    ax.grid(True, alpha=GRID_ALPHA)


def image_panel(ax, img: np.ndarray, title: str = "", cmap=None,
                vmin=None, vmax=None) -> None:
    ax.imshow(img, cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_title(title)
    ax.axis("off")


def finite_range(values: np.ndarray, fallback=(0.0, 1.0)):
    """(vmin, vmax) over finite entries; `fallback` when there are none —
    guards the all-NaN L2 panels that previously warned."""
    values = np.asarray(values)
    finite = values[np.isfinite(values)]
    if finite.size == 0:
        return fallback
    return float(finite.min()), float(finite.max())


def curve_panel(ax, x: Sequence, series: Dict[str, Sequence],
                title: str = "", xlabel: str = "Step", ylabel: str = "",
                log_x: bool = False, log_y: bool = False) -> None:
    for label, ys in series.items():
        ax.plot(x, ys, alpha=0.8, label=label)
    if log_x:
        ax.set_xscale("log")
    if log_y:
        ax.set_yscale("log")
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if len(series) > 1:
        ax.legend()
    ax.grid(True, alpha=GRID_ALPHA, which="both" if log_x or log_y else "major")


# ---------------------------------------------------------------------------
# Publication styling (capability parity with the reference's
# mltools/plotting/niceplots.py:7-41 — linear color ramps plus global /
# per-axes / heatmap style appliers; anchors and implementation are ours).

# color-ramp anchors: warm pink → sky blue, 60% alpha, same role as the
# reference's color_1/color_2 pair
RAMP_ANCHORS = (np.array([255, 105, 180, 153]) / 255.0,
                np.array([0, 191, 255, 153]) / 255.0)


def linear_colors(n: int) -> np.ndarray:
    """`n` RGBA colors linearly interpolated between the ramp anchors —
    the house categorical ramp for families of curves (one per member)."""
    if n == 1:
        return RAMP_ANCHORS[0][None, :]
    return np.linspace(RAMP_ANCHORS[0], RAMP_ANCHORS[1], n)


def apply_global_settings(figsize=(8.0, 6.0), dpi: int = 200,
                          fontsize: int = 25) -> None:
    """Set the publication rcParams once per process (figure size, dpi,
    base font). Opt-in; the pipeline figures keep their own defaults."""
    plt.rcParams["figure.figsize"] = list(figsize)
    plt.rcParams["figure.dpi"] = dpi
    plt.rcParams["font.size"] = fontsize


def apply_plot_style(fig, ax, lw: float = 3.0, labelsize: int = 25) -> None:
    """Publication line-plot style: open top/right spines, heavy remaining
    spines and lines, large tick labels, tight layout."""
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_linewidth(lw)
    ax.tick_params(axis="both", which="major", labelsize=labelsize)
    for line in ax.get_lines():
        line.set_linewidth(lw)
    fig.tight_layout()


def apply_heatmap_style(fig, ax, labelsize: int = 25) -> None:
    """Publication heatmap style: no spines, no tick marks, large labels."""
    for spine in ax.spines.values():
        spine.set_visible(False)
    ax.tick_params(axis="both", which="both", length=0)
    ax.tick_params(axis="both", which="major", labelsize=labelsize)
    ax.xaxis.label.set_fontsize(labelsize)
    ax.yaxis.label.set_fontsize(labelsize)
    fig.tight_layout()


def annotated_bars(ax, names: Sequence[str], values: Sequence[float],
                   labels: Optional[Sequence[str]] = None, title: str = "",
                   ylabel: str = "", ylim=None) -> None:
    """Bar chart with a text annotation above each bar (the reference's
    best-checkpoint and probe-summary figures)."""
    bars = ax.bar(range(len(names)), values)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names)
    if labels is None:
        labels = [f"{v:.3f}" for v in values]
    for bar, text in zip(bars, labels):
        ax.text(bar.get_x() + bar.get_width() / 2, bar.get_height(), text,
                ha="center", va="bottom", fontsize=9)
    ax.set_title(title)
    if ylabel:
        ax.set_ylabel(ylabel)
    if ylim is not None:
        ax.set_ylim(ylim)
