"""Live training plots + reconstruction figures.

Artifact parity with the reference trainer (src/train_utils.py:317-475):
summary/{loss,recons_err,kl}.png regenerated during training (log-log above
step 100, linear below), and figures/reconstructions_step_NNNNNN.png panels:
3-channel RGB composite, reconstruction, |diff| with per-sample MSE, and the
center-pixel spectrum overlay. The L2-supervised trainer appends per-product
target/prediction panels and a summary/l2_losses.png curve
(reference: src/scripts/train_vae_l2_supervised.py:308-491).

Construction goes through the house figure toolkit
(tempo_tpu.utils.figures) — same artifacts, project-native code.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from tempo_tpu.utils import figures as fig_kit

LOG_SCALE_FROM = 100  # steps >= this switch the summary curves to log-log

# the three summary artifacts: filename -> (metric key, title, ylabel)
SUMMARY_SERIES = {
    "loss.png": ("loss", "Total Loss", "Loss"),
    "recons_err.png": ("pixel_mse", "Pixel MSE (Reconstruction Error)",
                       "Mean Squared Error"),
    "kl.png": ("kl_loss", "KL Divergence", "KL Loss"),
}


def _history_view(history: List[Dict], key: str, log_scale: bool):
    """(steps, values) for one metric, restricted to the log-scale window
    when active."""
    pairs = [(m["step"], m.get(key, 0.0)) for m in history
             if not log_scale or m["step"] >= LOG_SCALE_FROM]
    if not pairs:
        return [], []
    steps, values = zip(*pairs)
    return list(steps), list(values)


def _use_log_scale(history: List[Dict]) -> bool:
    in_window = [m for m in history if m["step"] >= LOG_SCALE_FROM]
    return len(in_window) >= 2


def update_summary_plots(summary_dir: Union[str, Path],
                         train_history: List[Dict],
                         val_history: List[Dict]) -> None:
    if len(train_history) < 2:
        return
    summary_dir = Path(summary_dir)
    log_scale = _use_log_scale(train_history)

    for filename, (key, title, ylabel) in SUMMARY_SERIES.items():
        steps, values = _history_view(train_history, key, log_scale)
        if not steps:
            continue
        fig, axes = fig_kit.new_grid(1, 1, panel=(10, 6))
        ax = axes[0, 0]
        fig_kit.curve_panel(
            ax, steps, {"Train": values},
            title=title + (" (log-log scale)" if log_scale else ""),
            xlabel="Step", ylabel=ylabel,
            log_x=log_scale, log_y=log_scale)
        if log_scale:
            ax.set_xlim(left=LOG_SCALE_FROM)
        if key == "loss":
            val_pairs = [(m["step"], m["val_loss"]) for m in val_history
                         if "val_loss" in m
                         and (not log_scale or m["step"] >= LOG_SCALE_FROM)]
            if val_pairs:
                vs, vv = zip(*val_pairs)
                ax.plot(vs, vv, "^", color="tab:red", markersize=8,
                        label="Val")
                ax.legend()
        fig_kit.finish(fig, summary_dir / filename, dpi=100)


def plot_per_product_losses(summary_dir: Union[str, Path],
                            train_history: List[Dict],
                            products: Sequence[str]) -> None:
    """Per-product L2 loss curves (L2-supervised trainer parity)."""
    if len(train_history) < 2:
        return
    log_scale = _use_log_scale(train_history)
    series = {}
    steps = None
    for prod in products:
        steps, values = _history_view(train_history, f"{prod}_loss", log_scale)
        series[prod] = values
    if not steps:
        return
    fig, axes = fig_kit.new_grid(1, 1, panel=(10, 6))
    fig_kit.curve_panel(
        axes[0, 0], steps, series,
        title="L2 Product Losses" + (" (log-log)" if log_scale else ""),
        xlabel="Step", ylabel="Masked MSE",
        log_x=log_scale, log_y=log_scale)
    fig_kit.finish(fig, Path(summary_dir) / "l2_losses.png", dpi=100)


def _rgb_composite(patch_hwc: np.ndarray, channels: Sequence[int]) -> np.ndarray:
    """[H, W, C] -> [H, W, 3] min-max normalized composite over the three
    display channels (clamped to the channel count for narrow test models)."""
    chans = [c for c in channels if c < patch_hwc.shape[-1]]
    while len(chans) < 3:
        chans.append(chans[-1] if chans else 0)
    img = patch_hwc[..., chans[:3]].astype(np.float32)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo + 1e-8)


def save_reconstruction_figure(figures_dir: Union[str, Path], step: int,
                               batch_hwc: np.ndarray, recon_hwc: np.ndarray,
                               rgb_channels: Sequence[int] = (100, 500, 900),
                               l2_targets: Optional[Dict[str, np.ndarray]] = None,
                               l2_preds: Optional[Dict[str, np.ndarray]] = None
                               ) -> Path:
    """batch/recon: [B, H, W, C] numpy. One row per shown sample:
    original RGB | recon RGB | |diff| heatmap (+MSE) | center-pixel spectrum
    [| L2 target | L2 prediction]."""
    n_rows = 4
    n_show = min(n_rows, batch_hwc.shape[0])
    products = list(l2_targets.keys()) if l2_targets else []
    n_cols = 4 + (2 if products else 0)

    per_sample_mse = np.mean((batch_hwc - recon_hwc) ** 2, axis=(1, 2, 3))
    mid_y, mid_x = batch_hwc.shape[1] // 2, batch_hwc.shape[2] // 2

    fig, axes = fig_kit.new_grid(n_rows, n_cols)
    for i in range(n_show):
        orig = _rgb_composite(batch_hwc[i], rgb_channels)
        rec = _rgb_composite(recon_hwc[i], rgb_channels)
        fig_kit.image_panel(axes[i, 0], orig, title=f"Original {i}")
        fig_kit.image_panel(axes[i, 1], rec, title=f"Recon {i}")
        fig_kit.image_panel(axes[i, 2], np.abs(orig - rec), cmap="hot",
                            title=f"|Diff| (MSE={per_sample_mse[i]:.4f})")

        spectrum_ax = axes[i, 3]
        fig_kit.curve_panel(
            spectrum_ax, np.arange(batch_hwc.shape[-1]),
            {"Original": batch_hwc[i, mid_y, mid_x, :],
             "Recon": recon_hwc[i, mid_y, mid_x, :]},
            title=f"Spectrum at ({mid_y},{mid_x})",
            xlabel="Spectral Channel", ylabel="")

        if products:
            prod = products[i % len(products)]
            target = l2_targets[prod][i]
            vmin, vmax = fig_kit.finite_range(target)  # all-NaN safe
            fig_kit.image_panel(axes[i, 4], target, cmap="viridis",
                                vmin=vmin, vmax=vmax, title=f"{prod} target")
            fig_kit.image_panel(axes[i, 5], l2_preds[prod][i], cmap="viridis",
                                vmin=vmin, vmax=vmax, title=f"{prod} pred")

    for i in range(n_show, n_rows):
        for j in range(n_cols):
            axes[i, j].axis("off")

    path = Path(figures_dir) / f"reconstructions_step_{step:06d}.png"
    return fig_kit.finish(fig, path,
                          suptitle=f"Reconstructions at Step {step}", dpi=100)
