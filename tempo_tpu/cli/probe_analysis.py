#!/usr/bin/env python3
"""Linear / MLP probe analysis: VAE latents -> L2 atmospheric products.

Parity with the reference (src/scripts/linear_probe_analysis.py:356-781):
for each VALIDATION source granule, encode the full granule and take the
posterior MEAN latent [H/4, W/4, 32]; load each L2 product field, normalize
(per-file stats, as the reference does), 4x4 nanmean-pool to the latent grid,
sample up to n_pixels_per_file valid pixels; then per product: 80/20
train/test split, train a linear or MLP probe (AdamW, MSE, best-val epoch),
report R^2/MSE, and save probes/predictions/curves/figures + a summary bar
chart. One config serves both probe types via probe.architecture
(the reference's linear_probe.yaml vs mlp_probe.yaml).
"""

from __future__ import annotations

import json
import warnings
from pathlib import Path

import jax
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from tempo_tpu.analysis.probes import r2_score, train_probe  # noqa: E402
from tempo_tpu.cli import run_cli  # noqa: E402
from tempo_tpu.data.granule import (  # noqa: E402
    l2_filename_for,
    read_l2_field,
    read_radiance,
)
from tempo_tpu.data.loader import load_normalization_stats  # noqa: E402
from tempo_tpu.data.normalize import normalize_l2  # noqa: E402
from tempo_tpu.infer.granule_codec import GranuleCodec  # noqa: E402
from tempo_tpu.models.vae import build_vae  # noqa: E402
from tempo_tpu.train.checkpoint import load_params  # noqa: E402
from tempo_tpu.utils.config import copy_config, load_config, require_keys  # noqa: E402
from tempo_tpu.utils.dirs import init_directory  # noqa: E402


def nanmean_pool(field: np.ndarray, factor: int) -> np.ndarray:
    """[H, W] -> [H/f, W/f] nanmean over f x f blocks (all-NaN block -> NaN)."""
    h, w = field.shape
    blocks = field.reshape(h // factor, factor, w // factor, factor)
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", r"Mean of empty slice")
        warnings.filterwarnings("ignore", r"invalid value encountered")
        return np.nanmean(blocks, axis=(1, 3))


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "data", "model", "probe", "components"])

    output_dir = init_directory(config["output_dir"], overwrite=overwrite)
    copy_config(config_path, output_dir)
    for sub in ("figures", "results", "models", "data_stats"):
        (output_dir / sub).mkdir(parents=True, exist_ok=True)

    seed = config.get("seed", 42)
    rng = np.random.default_rng(seed)

    tiles_path = Path(config["data"]["tiles_path"])
    with open(tiles_path / "split_info.json") as f:
        split_info = json.load(f)
    l1_nc_path = Path(config["data"]["l1_nc_path"]) / "raw"
    l2_base_path = Path(config["data"]["l2_base_path"])
    val_files = list(split_info["val_sources"].values())
    if debug:
        val_files = val_files[:3]

    mean_spectrum, std_spectrum = load_normalization_stats(tiles_path)

    train_config = load_config(config["model"]["training_config_path"])
    model, model_cfg = build_vae(train_config.get("model", {}))
    tile = model_cfg.input_size
    factor = model_cfg.spatial_factor
    z_ch = model_cfg.embed_dim

    sample = np.zeros((1, tile, tile, model_cfg.in_channels), np.float32)
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params_template = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                              sample)["params"]
    # L2-supervised checkpoints nest the VAE under 'vae' (analogue of the
    # reference's strict=False load, linear_probe_analysis.py:426-431).
    try:
        params = load_params(config["model"]["checkpoint_path"], params_template)
    except (KeyError, ValueError):
        from flax import serialization

        raw = serialization.msgpack_restore(
            Path(config["model"]["checkpoint_path"]).read_bytes())
        params = serialization.from_state_dict(params_template,
                                               raw["params"]["vae"])

    codec = GranuleCodec(model, params, mean_spectrum, std_spectrum,
                         multiple=tile, seed=seed)

    components = config["components"]
    n_pixels = config["probe"]["n_pixels_per_file"]
    all_latents = {c: [] for c in components}
    all_targets = {c: [] for c in components}
    comp_norm_stats = {c: None for c in components}

    print(f"Processing {len(val_files)} validation files...")
    for filename in val_files:
        l1_path = l1_nc_path / filename
        if not l1_path.exists():
            print(f"Warning: L1 file not found: {l1_path}")
            continue

        rad = read_radiance(l1_path)
        gt = codec.normalize(rad)  # [H, W, C] cropped to /tile
        latent = np.asarray(codec.encode(gt))  # [H/f, W/f, z]
        h_lat, w_lat = latent.shape[:2]
        assert latent.shape[2] == z_ch, (
            f"Latent channels {latent.shape[2]} != embed_dim {z_ch}")
        latent_flat = latent.reshape(-1, z_ch)

        for comp_name, comp_cfg in components.items():
            product_dir = config["data"]["l2_products"][comp_name]
            l2_name = l2_filename_for(l1_path.name, comp_name)
            l2_path = l2_base_path / product_dir / "raw" / l2_name
            if not l2_path.exists():
                print(f"Warning: L2 file not found: {l2_path}")
                continue
            field = read_l2_field(l2_path, comp_cfg["field"],
                                  float(comp_cfg.get("scale", 1.0)))
            if field is None:
                continue
            assert field.shape[0] >= gt.shape[0] and field.shape[1] >= gt.shape[1], (
                f"{comp_name} field {field.shape} smaller than L1 crop "
                f"{gt.shape[:2]}")
            field = field[:gt.shape[0], :gt.shape[1]]
            normalized, stats = normalize_l2(field, comp_cfg["norm_type"])
            pooled = nanmean_pool(normalized, factor)
            assert pooled.shape == (h_lat, w_lat), (
                f"pooled {pooled.shape} != latent grid {(h_lat, w_lat)}")

            flat = pooled.flatten()
            valid = np.where(~np.isnan(flat))[0]
            if valid.size == 0:
                continue
            take = min(n_pixels, valid.size)
            idx = rng.choice(valid, take, replace=False)
            all_latents[comp_name].append(latent_flat[idx])
            all_targets[comp_name].append(flat[idx])
            if comp_norm_stats[comp_name] is None and stats is not None:
                comp_norm_stats[comp_name] = {k: float(v)
                                              for k, v in stats.items()}

    with open(output_dir / "results" / "component_norm_stats.json", "w") as f:
        json.dump({k: v for k, v in comp_norm_stats.items() if v}, f, indent=2)

    # Target distribution histograms (data_stats parity figure)
    n_comp = len(components)
    fig, axes = plt.subplots(1, n_comp, figsize=(4 * n_comp, 4))
    if n_comp == 1:
        axes = [axes]
    colors = ["red", "blue", "green", "purple"]
    for idx, comp_name in enumerate(components):
        if not all_targets[comp_name]:
            continue
        y = np.concatenate(all_targets[comp_name])
        axes[idx].hist(y, bins=100, alpha=0.7, color=colors[idx % 4])
        axes[idx].set_title(
            f"{comp_name} - {components[comp_name]['norm_type']}")
        axes[idx].set_yscale("log")
        axes[idx].grid(True, alpha=0.3)
    plt.suptitle("Normalized Target Distributions")
    plt.tight_layout()
    plt.savefig(output_dir / "data_stats" / "target_distributions.png",
                dpi=150, bbox_inches="tight")
    plt.close()

    # Train probes
    results = {}
    test_split = config["probe"].get("test_split", 0.2)
    for comp_name in components:
        if not all_latents[comp_name]:
            print(f"Skipping {comp_name} - no valid data")
            continue
        print(f"\nTraining probe for {comp_name}...")
        X = np.concatenate(all_latents[comp_name], axis=0)
        y = np.concatenate(all_targets[comp_name])

        perm = np.random.default_rng(seed).permutation(len(X))
        n_test = int(len(X) * test_split)
        test_idx, train_idx = perm[:n_test], perm[n_test:]
        X_train, y_train = X[train_idx], y[train_idx]
        X_test, y_test = X[test_idx], y[test_idx]

        probe = train_probe(X_train, y_train, X_test, y_test, config["probe"],
                            seed=seed, verbose=True)
        y_pred = probe.predict(X_test)
        r2 = r2_score(y_test, y_pred)
        mse = float(np.mean((y_test - y_pred) ** 2))
        results[comp_name] = {"r2_score": float(r2), "mse": mse,
                              "n_train": len(X_train), "n_test": len(X_test)}
        print(f"{comp_name}: R^2 = {r2:.4f}, MSE = {mse:.4f}")

        probe.save(output_dir / "models" / f"probe_{comp_name}.npz")
        np.savez(output_dir / "results" / f"predictions_{comp_name}.npz",
                 y_test=y_test, y_pred=y_pred, X_test=X_test)
        np.savez(output_dir / "results" / f"training_curves_{comp_name}.npz",
                 train_losses=np.asarray(probe.train_losses),
                 val_losses=np.asarray(probe.val_losses))

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        epochs = np.arange(1, len(probe.train_losses) + 1)
        axes[0].plot(epochs, probe.train_losses, label="Train", alpha=0.7)
        axes[0].plot(epochs, probe.val_losses, label="Validation", alpha=0.7)
        axes[0].axvline(probe.best_epoch + 1, color="red", linestyle="--",
                        alpha=0.5, label=f"Best @ {probe.best_epoch + 1}")
        axes[0].set_xscale("log")
        axes[0].set_yscale("log")
        axes[0].set_xlabel("Epoch (log scale)")
        axes[0].set_ylabel("MSE Loss")
        axes[0].set_title(f"{comp_name} - Learning Curves")
        axes[0].legend()

        n_show = min(config.get("visualization", {}).get("n_examples", 100),
                     len(y_test))
        axes[1].scatter(y_test[:n_show], y_pred[:n_show], alpha=0.5)
        lims = [y_test.min(), y_test.max()]
        axes[1].plot(lims, lims, "r--", label="Perfect prediction")
        axes[1].set_xlabel("Ground Truth")
        axes[1].set_ylabel("Predicted")
        axes[1].set_title(f"{comp_name} - R^2 = {r2:.4f}")
        axes[1].legend()

        residuals = y_test - y_pred
        axes[2].hist(residuals, bins=50, alpha=0.7)
        axes[2].axvline(0, color="r", linestyle="--", alpha=0.5)
        axes[2].set_xlabel("Residual (True - Predicted)")
        axes[2].set_title(f"{comp_name} - Residual Distribution")

        plt.tight_layout()
        plt.savefig(output_dir / "figures" / f"probe_{comp_name}.png",
                    dpi=150, bbox_inches="tight")
        plt.close()

    with open(output_dir / "results" / "probe_results.json", "w") as f:
        json.dump(results, f, indent=2)

    if results:
        fig, ax = plt.subplots(figsize=(10, 6))
        names = list(results.keys())
        scores = [results[c]["r2_score"] for c in names]
        bars = ax.bar(names, scores)
        ax.set_ylabel("R^2 Score")
        ax.set_title(f"{config['probe'].get('architecture', 'linear').title()}"
                     " Probe Performance")
        ax.set_ylim([0, 1])
        for bar, score in zip(bars, scores):
            ax.text(bar.get_x() + bar.get_width() / 2, bar.get_height(),
                    f"{score:.3f}", ha="center", va="bottom")
        plt.tight_layout()
        plt.savefig(output_dir / "figures" / "probe_summary.png", dpi=150,
                    bbox_inches="tight")
        plt.close()

    print(f"\nAnalysis complete! Results saved to {output_dir}")
    print(f"Component R^2 scores: {results}")


if __name__ == "__main__":
    run_cli(main, "Train probes from VAE latents to L2 products")
