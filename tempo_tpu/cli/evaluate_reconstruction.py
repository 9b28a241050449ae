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
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from tempo_tpu.cli import run_cli  # noqa: E402
from tempo_tpu.data.tiles import load_tile_shard  # noqa: E402
from tempo_tpu.infer.sweep import evaluate_checkpoints  # noqa: E402
from tempo_tpu.models.vae import build_vae  # noqa: E402
from tempo_tpu.utils.config import copy_config, load_config, require_keys  # noqa: E402
from tempo_tpu.utils.dirs import init_directory  # noqa: E402


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
        steps = [r["step"] for r in results]
        fig, axes = plt.subplots(1, len(metrics_list),
                                 figsize=(5 * len(metrics_list), 4))
        if len(metrics_list) == 1:
            axes = [axes]
        best = {}
        for idx, metric in enumerate(metrics_list):
            values = [r[metric] for r in results]
            axes[idx].plot(steps, values, "o-", linewidth=2, markersize=6)
            axes[idx].set_xlabel("Training Step")
            axes[idx].set_ylabel(metric.upper())
            axes[idx].set_title(f"{metric.upper()} vs Training Step")
            axes[idx].grid(True, alpha=0.3)
            best_idx = (np.argmin(values) if metric in ("mse", "mae")
                        else np.argmax(values))
            best[metric] = {"value": values[best_idx], "step": steps[best_idx],
                            "checkpoint": results[best_idx]["checkpoint"]}
            axes[idx].plot(steps[best_idx], values[best_idx], "r*",
                           markersize=15,
                           label=f"Best: {values[best_idx]:.4f}")
            axes[idx].legend()
        plt.suptitle(f"Reconstruction Metrics - {exp_dir.name}")
        plt.tight_layout()
        dpi = plotting.get("dpi", 150)
        plt.savefig(output_dir / "figures" / "metrics_vs_step.png", dpi=dpi,
                    bbox_inches="tight")
        plt.close()

        fig, ax = plt.subplots(figsize=(8, 5))
        names = list(best.keys())
        vals = [best[m]["value"] for m in names]
        bars = ax.bar(range(len(names)), vals)
        ax.set_xticks(range(len(names)))
        ax.set_xticklabels([m.upper() for m in names])
        ax.set_title("Best Checkpoint Performance by Metric")
        for bar, m in zip(bars, names):
            ax.text(bar.get_x() + bar.get_width() / 2, bar.get_height(),
                    f"{best[m]['value']:.4f}\n(step {best[m]['step']})",
                    ha="center", va="bottom", fontsize=9)
        plt.tight_layout()
        plt.savefig(output_dir / "figures" / "best_metrics_summary.png",
                    dpi=dpi, bbox_inches="tight")
        plt.close()

    print(f"\nEvaluation complete! Results saved to {output_dir}")


if __name__ == "__main__":
    run_cli(main, "Evaluate reconstruction across checkpoints")
