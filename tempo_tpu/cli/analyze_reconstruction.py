#!/usr/bin/env python3
"""Full-granule reconstruction analysis with PCA-RGB / single-channel figures.

Parity with the reference analysis (src/scripts/analyze_reconstruction.py:
22-213): for each VALIDATION source granule (from the tile directory's
split_info.json), normalize exactly as training, crop to /64 multiples, run
one whole-granule forward, and save GT-vs-reconstruction figures — either
PCA-RGB (3 components, GT 2%/98% quantile scaling shared by both panels) or
a single spectral channel.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from tempo_tpu.analysis.pca import PCAResult, pca_rgb  # noqa: E402
from tempo_tpu.cli import run_cli  # noqa: E402
from tempo_tpu.data.granule import read_radiance  # noqa: E402
from tempo_tpu.data.loader import load_normalization_stats  # noqa: E402
from tempo_tpu.infer.granule_codec import GranuleCodec  # noqa: E402
from tempo_tpu.models.vae import build_vae  # noqa: E402
from tempo_tpu.train.checkpoint import load_params  # noqa: E402
from tempo_tpu.utils.config import copy_config, load_config, require_keys  # noqa: E402
from tempo_tpu.utils.dirs import init_directory  # noqa: E402


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "data", "model"])

    output_dir = init_directory(config["output_dir"], overwrite=overwrite)
    copy_config(config_path, output_dir)

    tiles_path = Path(config["data"]["tiles_path"])
    with open(tiles_path / "split_info.json") as f:
        split_info = json.load(f)
    val_nc_files = [Path(config["data"]["nc_path"]) / "raw" / f
                    for f in split_info["val_sources"].values()]
    if debug:
        val_nc_files = val_nc_files[:1]

    mean_spectrum, std_spectrum = load_normalization_stats(tiles_path)

    train_config = load_config(config["model"]["training_config_path"])
    model, model_cfg = build_vae(train_config.get("model", {}))
    tile = model_cfg.input_size
    sample = np.zeros((1, tile, tile, model_cfg.in_channels), np.float32)
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params_template = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                              sample)["params"]
    params = load_params(config["model"]["checkpoint_path"], params_template)

    codec = GranuleCodec(model, params, mean_spectrum, std_spectrum,
                         multiple=tile, seed=config.get("seed", 42))

    viz = config.get("visualization", {})
    mode = viz.get("mode", "single_channel")
    pca = None
    if mode == "pca_rgb":
        pca = PCAResult.load(viz["pca_components_path"])

    for nc_file in val_nc_files:
        rad = read_radiance(nc_file)
        gt, recon = codec.reconstruct_raw(rad)

        if mode == "pca_rgb":
            gt_rgb = pca_rgb(gt, pca)
            recon_rgb = pca_rgb(recon, pca, reference_hwc=gt)
            fig, axes = plt.subplots(1, 2, figsize=(12, 5))
            axes[0].imshow(gt_rgb, aspect="auto")
            axes[0].set_title("Ground Truth (PCA RGB)")
            axes[1].imshow(recon_rgb, aspect="auto")
            axes[1].set_title("Reconstruction (PCA RGB)")
            for ax in axes:
                ax.axis("off")
            plt.suptitle(f"{nc_file.stem} - PCA Components as RGB")
            suffix = "_pca_rgb"
        else:
            ch = viz.get("single_channel", 500)
            ch = min(ch, gt.shape[-1] - 1)
            gt_ch = gt[..., ch]
            vmin, vmax = gt_ch.min(), gt_ch.max()
            fig, axes = plt.subplots(1, 2, figsize=(12, 5))
            im1 = axes[0].imshow(gt_ch, cmap="viridis", aspect="auto",
                                 vmin=vmin, vmax=vmax)
            axes[0].set_title("Ground Truth")
            plt.colorbar(im1, ax=axes[0], fraction=0.046)
            im2 = axes[1].imshow(recon[..., ch], cmap="viridis", aspect="auto",
                                 vmin=vmin, vmax=vmax)
            axes[1].set_title("Reconstruction")
            plt.colorbar(im2, ax=axes[1], fraction=0.046)
            for ax in axes:
                ax.axis("off")
            plt.suptitle(f"{nc_file.stem} - Channel {ch}")
            suffix = f"_ch{ch}"

        plt.tight_layout()
        save_path = output_dir / f"{nc_file.stem}{suffix}.png"
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close()
        print(f"Saved {save_path}")


if __name__ == "__main__":
    run_cli(main, "Analyze VAE reconstructions on full granules")
