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
import numpy as np

from tempo_tpu.analysis.probes import r2_score, train_probe
from tempo_tpu.cli import run_cli
from tempo_tpu.data.granule import l2_filename_for, read_l2_field, read_radiance
from tempo_tpu.data.loader import load_normalization_stats
from tempo_tpu.data.normalize import normalize_l2
from tempo_tpu.infer.granule_codec import GranuleCodec
from tempo_tpu.models.vae import build_vae
from tempo_tpu.train.checkpoint import load_params
from tempo_tpu.utils import figures as fig_kit
from tempo_tpu.utils.config import copy_config, load_config, require_keys
from tempo_tpu.utils.dirs import init_directory


def nanmean_pool(field: np.ndarray, factor: int) -> np.ndarray:
    """[H, W] -> [H/f, W/f] nanmean over f x f blocks (all-NaN block -> NaN)."""
    h, w = field.shape
    blocks = field.reshape(h // factor, factor, w // factor, factor)
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", r"Mean of empty slice")
        warnings.filterwarnings("ignore", r"invalid value encountered")
        return np.nanmean(blocks, axis=(1, 3))


def save_data_stat_figures(stats_dir, components, all_targets, all_latents,
                           raw_samples) -> None:
    """The three data_stats diagnostics the reference probe analysis emits
    (src/scripts/linear_probe_analysis.py:504-677): the raw-vs-normalized
    2xN comparison panel with per-panel summary stats, the shared input
    latent distributions, and the per-component normalized target
    distributions."""
    comps = [c for c in components if all_targets.get(c)]
    if not comps:
        return

    # 1. raw (top row) vs normalized (bottom row), one column per component
    fig, axes = fig_kit.new_grid(2, len(comps))
    for idx, comp in enumerate(comps):
        color = fig_kit.product_color(idx)
        cfg = components[comp]
        raw = raw_samples.get(comp)
        if raw is not None:
            fig_kit.hist_panel(axes[0, idx], raw, title=f"{comp} - Raw",
                               xlabel=f"Scale: {cfg.get('scale', 1.0)}",
                               color=color)
        else:
            axes[0, idx].axis("off")
        fig_kit.hist_panel(axes[1, idx], np.concatenate(all_targets[comp]),
                           title=f"{comp} - {cfg['norm_type']}",
                           xlabel="Normalized value", color=color,
                           stats_face="lightyellow")
    fig_kit.finish(fig, stats_dir / "all_normalizations_comparison.png",
                   suptitle="Component Fields: Raw vs Normalized "
                            "Distributions")

    # 2. the latent inputs every probe regresses from (pixels are shared
    #    across components; take the first component's collection)
    latents = np.concatenate(all_latents[comps[0]], axis=0)
    z_ch = latents.shape[1]
    fig, axes = fig_kit.new_grid(1, 2, panel=(6, 5))
    show = sorted({0, z_ch // 4, z_ch // 2, 3 * z_ch // 4, z_ch - 1})
    for ch in show:
        axes[0, 0].hist(latents[:, ch], bins=50, alpha=0.5, density=True,
                        label=f"Ch {ch}")
    axes[0, 0].set_title("Input Latent Distributions (sample channels)")
    axes[0, 0].set_xlabel("Latent Values")
    axes[0, 0].set_ylabel("Density")
    axes[0, 0].legend()
    axes[0, 0].grid(True, alpha=fig_kit.GRID_ALPHA)
    fig_kit.hist_panel(axes[0, 1], latents.ravel(),
                       title="All Input Latent Values",
                       xlabel="Latent Values (all channels)",
                       ylabel="Density", density=True, log_y=False,
                       show_stats=False)
    fig_kit.stats_box(axes[0, 1], latents.ravel(), face="wheat")
    fig_kit.finish(fig, stats_dir / "input_latent_distributions.png",
                   suptitle="Shared Input Latent Distributions "
                            "(for all regressions)")

    # 3. normalized target distributions
    cols = 2 if len(comps) >= 3 else len(comps)
    rows = -(-len(comps) // cols)
    fig, axes = fig_kit.new_grid(rows, cols, panel=(6, 5))
    for idx, comp in enumerate(comps):
        ax = axes[idx // cols, idx % cols]
        y = np.concatenate(all_targets[comp])
        fig_kit.hist_panel(ax, y, bins=50, density=True, log_y=False,
                           title=f"{comp} Target Distribution",
                           xlabel="Normalized Values", ylabel="Density",
                           color=fig_kit.product_color(idx), show_stats=False)
        fig_kit.stats_box(ax, y, count=True)
    for idx in range(len(comps), rows * cols):
        axes[idx // cols, idx % cols].axis("off")
    fig_kit.finish(fig, stats_dir / "target_distributions.png",
                   suptitle="Normalized Target Distributions "
                            "(post-normalization)")


def save_probe_figure(figures_dir, comp_name, probe, y_test, y_pred, r2,
                      n_show) -> None:
    """probe_<comp>.png: learning curves (log-log, best epoch marked) |
    truth-vs-prediction scatter | residual histogram."""
    epochs = np.arange(1, len(probe.train_losses) + 1)
    fig, axes = fig_kit.new_grid(1, 3, panel=(5, 5))

    fig_kit.curve_panel(axes[0, 0], epochs,
                        {"Train": probe.train_losses,
                         "Validation": probe.val_losses},
                        title=f"{comp_name} - Learning Curves",
                        xlabel="Epoch (log scale)", ylabel="MSE Loss",
                        log_x=True, log_y=True)
    axes[0, 0].axvline(probe.best_epoch + 1, color="tab:red",
                       linestyle=":", alpha=0.6,
                       label=f"Best @ {probe.best_epoch + 1}")
    axes[0, 0].legend()

    scatter_ax = axes[0, 1]
    scatter_ax.scatter(y_test[:n_show], y_pred[:n_show], alpha=0.5, s=12)
    lims = (float(y_test.min()), float(y_test.max()))
    scatter_ax.plot(lims, lims, color="tab:red", linestyle=":",
                    label="Perfect prediction")
    scatter_ax.set_title(f"{comp_name} - R^2 = {r2:.4f}")
    scatter_ax.set_xlabel("Ground Truth")
    scatter_ax.set_ylabel("Predicted")
    scatter_ax.legend()
    scatter_ax.grid(True, alpha=fig_kit.GRID_ALPHA)

    fig_kit.hist_panel(axes[0, 2], y_test - y_pred, bins=50, log_y=False,
                       title=f"{comp_name} - Residual Distribution",
                       xlabel="Residual (True - Predicted)",
                       show_stats=False)
    axes[0, 2].axvline(0, color="tab:red", linestyle=":", alpha=0.6)

    fig_kit.finish(fig, figures_dir / f"probe_{comp_name}.png")


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
    raw_samples = {c: None for c in components}  # pre-normalization values

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
            if raw_samples[comp_name] is None:
                raw_samples[comp_name] = field[np.isfinite(field)]
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

    # data_stats diagnostics: raw-vs-normalized comparison, shared latent
    # inputs, normalized target distributions
    save_data_stat_figures(output_dir / "data_stats", components,
                           all_targets, all_latents, raw_samples)

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

        n_show = min(config.get("visualization", {}).get("n_examples", 100),
                     len(y_test))
        save_probe_figure(output_dir / "figures", comp_name, probe,
                          y_test, y_pred, r2, n_show)

    with open(output_dir / "results" / "probe_results.json", "w") as f:
        json.dump(results, f, indent=2)

    if results:
        fig, axes = fig_kit.new_grid(1, 1, panel=(10, 6))
        arch = config["probe"].get("architecture", "linear").title()
        fig_kit.annotated_bars(
            axes[0, 0], list(results),
            [results[c]["r2_score"] for c in results],
            title=f"{arch} Probe Performance", ylabel="R^2 Score",
            ylim=(0, 1))
        fig_kit.finish(fig, output_dir / "figures" / "probe_summary.png")

    print(f"\nAnalysis complete! Results saved to {output_dir}")
    print(f"Component R^2 scores: {results}")


if __name__ == "__main__":
    run_cli(main, "Train probes from VAE latents to L2 products")
