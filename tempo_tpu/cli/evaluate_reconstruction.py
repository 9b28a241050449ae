#!/usr/bin/env python3
"""Checkpoint-sweep reconstruction evaluation.

Parity with the reference sweep (src/scripts/evaluate_reconstruction.py:
98-314): for every checkpoint in an experiment directory, evaluate MSE / MAE
/ PSNR over validation tiles; write reconstruction_metrics.json, a
metric-vs-step plot, and a best-checkpoint summary plot. Output dir is
created WITHIN the experiment directory.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.data.tiles import load_tile_shard
from tempo_tpu.infer.sweep import evaluate_checkpoints
from tempo_tpu.models.vae import build_vae
from tempo_tpu.utils import figures as fig_kit
from tempo_tpu.utils.config import copy_config, load_config, require_keys
from tempo_tpu.utils.dirs import init_directory

LOWER_IS_BETTER = {"mse", "mae", "pk_err"}


def _best_entry(results, metric):
    pick = min if metric in LOWER_IS_BETTER else max
    return pick(results, key=lambda r: r[metric])


def save_sweep_figures(output_dir, results, metrics_list, exp_name,
                       dpi=150) -> dict:
    """metrics_vs_step.png (per-metric curve with the best checkpoint
    highlighted) + best_metrics_summary.png (annotated bars) — the two
    sweep artifacts the reference analysis emits. Returns the best-per-
    metric summary."""
    steps = [r["step"] for r in results]
    best = {m: _best_entry(results, m) for m in metrics_list}

    fig, axes = fig_kit.new_grid(1, len(metrics_list), panel=(5, 4))
    for ax, metric in zip(axes[0], metrics_list):
        fig_kit.curve_panel(ax, steps, {metric: [r[metric] for r in results]},
                            title=f"{metric.upper()} vs Training Step",
                            xlabel="Training Step", ylabel=metric.upper())
        champion = best[metric]
        ax.scatter([champion["step"]], [champion[metric]], marker="*", s=180,
                   color="tab:red", zorder=3,
                   label=f"Best: {champion[metric]:.4f}")
        ax.legend()
    fig_kit.finish(fig, output_dir / "figures" / "metrics_vs_step.png",
                   suptitle=f"Reconstruction Metrics - {exp_name}", dpi=dpi)

    fig, axes = fig_kit.new_grid(1, 1, panel=(8, 5))
    fig_kit.annotated_bars(
        axes[0, 0],
        [m.upper() for m in metrics_list],
        [best[m][m] for m in metrics_list],
        labels=[f"{best[m][m]:.4f}\n(step {best[m]['step']})"
                for m in metrics_list],
        title="Best Checkpoint Performance by Metric")
    fig_kit.finish(fig, output_dir / "figures" / "best_metrics_summary.png",
                   dpi=dpi)

    return {m: {"value": best[m][m], "step": best[m]["step"],
                "checkpoint": best[m]["checkpoint"]} for m in metrics_list}


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["exp_dir", "output_dir"])

    exp_dir = Path(config["exp_dir"])
    if not exp_dir.exists():
        raise ValueError(f"FATAL: Experiment directory {exp_dir} does not exist")

    output_dir = init_directory(str(exp_dir / Path(config["output_dir"]).name),
                                overwrite=overwrite)
    (output_dir / "figures").mkdir(parents=True, exist_ok=True)
    (output_dir / "results").mkdir(parents=True, exist_ok=True)
    copy_config(config_path, output_dir)

    training_config_path = exp_dir / config["model"]["training_config_path"]
    if not training_config_path.exists():
        raise ValueError(f"FATAL: Training config not found at {training_config_path}")
    train_config = load_config(training_config_path)

    # Validation tiles
    val_dir = Path(config["data"]["val_dir"])
    if not val_dir.exists():
        raise ValueError(f"FATAL: Validation directory {val_dir} does not exist")
    shards = sorted(val_dir.glob("*.npy")) or sorted(val_dir.glob("*.pt"))
    if debug:
        shards = shards[:1]
    tiles = []
    max_val = config["data"].get("max_val_samples")
    for shard in shards:
        batch = load_tile_shard(shard)
        if batch.ndim == 3:
            batch = batch[None]
        # reference .pt shards are [N, H, W, C] already (NHWC native here)
        tiles.append(np.asarray(batch, dtype=np.float32))
        if max_val is not None and sum(t.shape[0] for t in tiles) >= max_val:
            break
    val_tiles = np.concatenate(tiles, axis=0)
    if max_val is not None:
        val_tiles = val_tiles[:max_val]
    if debug:
        val_tiles = val_tiles[:2]
    print(f"Loaded {val_tiles.shape[0]} validation tiles")

    model, _ = build_vae(train_config.get("model", {}))
    sample = val_tiles[:1]
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params_template = init_fn(jax.random.PRNGKey(config.get("seed", 42)),
                              jax.random.PRNGKey(0), sample)["params"]

    metrics_list = config.get("evaluation", {}).get("metrics",
                                                    ["mse", "mae", "psnr"])
    batch_size = config.get("evaluation", {}).get("batch_size", 8)
    # optional custom glob relative to exp_dir (reference
    # model.checkpoint_pattern contract)
    pattern = config["model"].get("checkpoint_pattern")
    results = evaluate_checkpoints(
        model, params_template,
        exp_dir if pattern else exp_dir / "checkpoints", val_tiles,
        batch_size=batch_size, metrics_list=metrics_list,
        max_checkpoints=1 if debug else None, pattern=pattern)

    results_file = output_dir / "results" / "reconstruction_metrics.json"
    with open(results_file, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Saved results to {results_file}")

    plotting = config.get("plotting", {})
    if plotting.get("plot_metrics", True) and len(results) > 1:
        best = save_sweep_figures(output_dir, results, metrics_list,
                                  exp_dir.name,
                                  dpi=plotting.get("dpi", 150))
        print("Best checkpoints:", json.dumps(best, indent=2))

    print(f"\nEvaluation complete! Results saved to {output_dir}")


if __name__ == "__main__":
    run_cli(main, "Evaluate reconstruction across checkpoints")
