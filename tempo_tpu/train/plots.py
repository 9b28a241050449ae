"""Live training plots + reconstruction figures.

Artifact parity with the reference trainer (src/train_utils.py:317-475):
summary/{loss,recons_err,kl}.png regenerated during training (log-log above
step 100, linear below), and figures/reconstructions_step_NNNNNN.png panels:
3-channel RGB composite, reconstruction, |diff| with per-sample MSE, and the
center-pixel spectrum overlay.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _select_log(steps: List[int]):
    use_log = bool(steps) and max(steps) >= 100
    if use_log:
        idx = [i for i, s in enumerate(steps) if s >= 100]
        if len(idx) < 2:
            use_log, idx = False, list(range(len(steps)))
    else:
        idx = list(range(len(steps)))
    return use_log, idx


def _line_plot(path: Path, steps, values, title, ylabel, use_log,
               val_steps=None, val_values=None, color="b-"):
    plt.figure(figsize=(10, 6))
    plot = plt.loglog if use_log else plt.plot
    plot(steps, values, color, alpha=0.7, label="Train")
    if val_steps:
        plot(val_steps, val_values, "r^", markersize=8, label="Val")
    if use_log:
        plt.xlim(left=100)
        title += " (log-log scale)"
    plt.title(title)
    plt.xlabel("Step")
    plt.ylabel(ylabel)
    if val_steps:
        plt.legend()
    plt.grid(True, alpha=0.3, which="both" if use_log else "major")
    plt.tight_layout()
    plt.savefig(path, dpi=100)
    plt.close()


def update_summary_plots(summary_dir: Union[str, Path],
                         train_history: List[Dict],
                         val_history: List[Dict]) -> None:
    summary_dir = Path(summary_dir)
    summary_dir.mkdir(parents=True, exist_ok=True)
    steps = [m["step"] for m in train_history]
    if len(steps) < 2:
        return
    use_log, idx = _select_log(steps)

    def series(key):
        return [steps[i] for i in idx], [train_history[i].get(key, 0.0) for i in idx]

    s, losses = series("loss")
    val_steps = [m["step"] for m in val_history
                 if (not use_log or m["step"] >= 100) and "val_loss" in m]
    val_losses = [m["val_loss"] for m in val_history
                  if (not use_log or m["step"] >= 100) and "val_loss" in m]
    _line_plot(summary_dir / "loss.png", s, losses, "Total Loss", "Loss",
               use_log, val_steps, val_losses)

    s, pixel_mse = series("pixel_mse")
    _line_plot(summary_dir / "recons_err.png", s, pixel_mse,
               "Pixel MSE (Reconstruction Error)", "Mean Squared Error",
               use_log, color="g-")

    s, kl = series("kl_loss")
    _line_plot(summary_dir / "kl.png", s, kl, "KL Divergence", "KL Loss",
               use_log, color="m-")


def _rgb_composite(patch_hwc: np.ndarray, channels: Sequence[int]) -> np.ndarray:
    """[H, W, C] -> [H, W, 3] min-max normalized composite."""
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
    """batch/recon: [B, H, W, C] numpy. Optionally appends L2 target/pred
    panels (the L2-supervised trainer's extra columns,
    reference: src/scripts/train_vae_l2_supervised.py:308-398)."""
    figures_dir = Path(figures_dir)
    figures_dir.mkdir(parents=True, exist_ok=True)

    n_show = min(4, batch_hwc.shape[0])
    n_cols = 4 + (2 if l2_targets else 0)
    fig, axes = plt.subplots(4, n_cols, figsize=(4 * n_cols, 16))
    if axes.ndim == 1:
        axes = axes[None, :]

    mse = np.mean((batch_hwc - recon_hwc) ** 2, axis=(1, 2, 3))
    products = list(l2_targets.keys()) if l2_targets else []

    for i in range(n_show):
        orig = _rgb_composite(batch_hwc[i], rgb_channels)
        rec = _rgb_composite(recon_hwc[i], rgb_channels)
        diff = np.abs(orig - rec)

        axes[i, 0].imshow(orig)
        axes[i, 0].set_title(f"Original {i}")
        axes[i, 1].imshow(rec)
        axes[i, 1].set_title(f"Recon {i}")
        axes[i, 2].imshow(diff, cmap="hot")
        axes[i, 2].set_title(f"|Diff| (MSE={mse[i]:.4f})")
        for j in range(3):
            axes[i, j].axis("off")

        mid_y, mid_x = batch_hwc.shape[1] // 2, batch_hwc.shape[2] // 2
        axes[i, 3].plot(batch_hwc[i, mid_y, mid_x, :], "b-", alpha=0.7,
                        label="Original")
        axes[i, 3].plot(recon_hwc[i, mid_y, mid_x, :], "r-", alpha=0.7,
                        label="Recon")
        axes[i, 3].set_xlabel("Spectral Channel")
        axes[i, 3].set_title(f"Spectrum at ({mid_y},{mid_x})")
        axes[i, 3].legend()
        axes[i, 3].grid(True, alpha=0.3)

        if l2_targets and i < len(products):
            prod = products[i % len(products)]
            tgt = l2_targets[prod][i]
            prd = l2_preds[prod][i]
            vmin = np.nanmin(tgt) if np.isfinite(np.nanmin(tgt)) else 0.0
            vmax = np.nanmax(tgt) if np.isfinite(np.nanmax(tgt)) else 1.0
            axes[i, 4].imshow(tgt, cmap="viridis", vmin=vmin, vmax=vmax)
            axes[i, 4].set_title(f"{prod} target")
            axes[i, 4].axis("off")
            axes[i, 5].imshow(prd, cmap="viridis", vmin=vmin, vmax=vmax)
            axes[i, 5].set_title(f"{prod} pred")
            axes[i, 5].axis("off")

    plt.suptitle(f"Reconstructions at Step {step}")
    plt.tight_layout()
    path = figures_dir / f"reconstructions_step_{step:06d}.png"
    plt.savefig(path, dpi=100, bbox_inches="tight")
    plt.close()
    return path


def plot_per_product_losses(summary_dir: Union[str, Path],
                            train_history: List[Dict],
                            products: Sequence[str]) -> None:
    """Per-product L2 loss curves (L2-supervised trainer parity)."""
    summary_dir = Path(summary_dir)
    summary_dir.mkdir(parents=True, exist_ok=True)
    steps = [m["step"] for m in train_history]
    if len(steps) < 2:
        return
    use_log, idx = _select_log(steps)
    plt.figure(figsize=(10, 6))
    plot = plt.loglog if use_log else plt.plot
    for prod in products:
        key = f"{prod}_loss"
        vals = [train_history[i].get(key, 0.0) for i in idx]
        plot([steps[i] for i in idx], vals, alpha=0.7, label=prod)
    plt.xlabel("Step")
    plt.ylabel("Masked MSE")
    plt.title("L2 Product Losses" + (" (log-log)" if use_log else ""))
    plt.legend()
    plt.grid(True, alpha=0.3, which="both" if use_log else "major")
    plt.tight_layout()
    plt.savefig(summary_dir / "l2_losses.png", dpi=100)
    plt.close()
