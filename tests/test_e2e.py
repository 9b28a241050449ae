"""End-to-end pipeline test on the CPU mesh: synthetic granules -> stats ->
tiles (+L2) -> short training (base and L2-supervised) -> checkpoint sweep ->
PCA -> probe analysis, all through the CLI mains (the full user surface)."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from tempo_tpu.data.synthetic import make_granule_corpus

pytestmark = pytest.mark.slow

N_SPECTRAL = 16
TILE = 16
PRODUCTS = ["NO2", "O3TOT", "HCHO", "CLDO4"]

MODEL_CFG = {
    "shape": [N_SPECTRAL, TILE, TILE],
    "embed_dim": 4,
    "chs": [16, 12, 8],
    "mid_attn": True,
    "num_res_blocks": 1,
    "z_channels": 4,
    "double_z": True,
    "n_attention_heads": 2,
    "norm_groups": 4,
    "kl_weight": 1e-6,
    "nll_loss_type": "l1",
    "compute_dtype": "float32",
}


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    make_granule_corpus(root / "data", n_granules=5, n_mirror=40, n_track=48,
                        n_spectral=N_SPECTRAL, l2_products=PRODUCTS, seed=3)
    return root


def _write(path: Path, cfg: dict) -> str:
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    return str(path)


@pytest.fixture(scope="module")
def stats_dir(pipeline_dir):
    from tempo_tpu.cli.compute_stats import main

    cfg = _write(pipeline_dir / "stats.yaml", {
        "input_dir": str(pipeline_dir / "data" / "l1" / "raw"),
        "output_dir": str(pipeline_dir / "stats"),
        "max_files": 5,
    })
    main(cfg)
    out = pipeline_dir / "stats"
    assert (out / "tempo_mean_spectrum.npy").exists()
    assert (out / "manifest.yaml").exists()
    mean = np.load(out / "tempo_mean_spectrum.npy")
    assert mean.shape == (N_SPECTRAL,)
    return out


@pytest.fixture(scope="module")
def tiles_dir(pipeline_dir, stats_dir):
    from tempo_tpu.cli.prepare_tiles import main

    cfg = _write(pipeline_dir / "tiles.yaml", {
        "input_dir": str(pipeline_dir / "data" / "l1" / "raw"),
        "output_dir": str(pipeline_dir / "tiles"),
        "normalization": {
            "mean_file": str(stats_dir / "tempo_mean_spectrum.npy"),
            "std_file": str(stats_dir / "tempo_std_spectrum.npy"),
        },
        "processing": {
            "tile_size": [TILE, TILE],
            "tiles_per_file": 16,
            "n_spectral": N_SPECTRAL,
            "min_radiance": 1.0,
            "clip_min": -10,
            "clip_max": 10,
        },
        "l2": {
            "base_path": str(pipeline_dir / "data"),
            "components": PRODUCTS,
            "products": {p: p for p in PRODUCTS},
            "subdirs": {p: f"l2_{p}" for p in PRODUCTS},
            "fields": {
                "NO2": "vertical_column_troposphere",
                "O3TOT": "column_amount_o3",
                "HCHO": "vertical_column",
                "CLDO4": "cloud_fraction",
            },
            "scales": {"NO2": 1e15, "O3TOT": 1.0, "HCHO": 1e16, "CLDO4": 1.0},
            "norm_types": {"NO2": "asinh", "O3TOT": "zscore",
                           "HCHO": "asinh", "CLDO4": "logit"},
            "compute_global_stats": True,
        },
        "split": {"val_fraction": 0.3, "seed": 42},
    })
    main(cfg)
    out = pipeline_dir / "tiles"
    split = json.loads((out / "split_info.json").read_text())
    assert split["split_config"]["n_train"] >= 1
    assert split["split_config"]["n_val"] >= 1
    # L2 shards exist next to the spectral shards
    train_shards = list((out / "train").glob("*.npy"))
    assert train_shards
    for p in PRODUCTS:
        assert (out / "train" / f"l2_{p}" / train_shards[0].name).exists()
    # normalized spectral tiles within the clip range
    tiles = np.load(train_shards[0])
    assert tiles.shape[1:] == (TILE, TILE, N_SPECTRAL)
    assert np.abs(tiles).max() <= 10.0
    return out


@pytest.fixture(scope="module")
def run_dir(pipeline_dir, tiles_dir):
    from tempo_tpu.cli.train_vae import main

    cfg = _write(pipeline_dir / "train.yaml", {
        "output_dir": str(pipeline_dir / "run"),
        "seed": 42,
        "data": {
            "train_dir": str(tiles_dir / "train"),
            "val_dir": str(tiles_dir / "val"),
            "batch_size": 8,
            "min_buffer_size": 16,
            "val_min_buffer_size": 8,
        },
        "model": MODEL_CFG,
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.95], "weight_decay": 0.05},
        "training": {"n_steps": 30, "save_every": 15, "val_every": 10,
                     "log_every": 5, "plot_every": 15},
    })
    main(cfg)
    out = pipeline_dir / "run"
    metrics = json.loads((out / "metrics.json").read_text())
    losses = [m["loss"] for m in metrics["train"]]
    assert losses[-1] < losses[0]
    assert (out / "checkpoints" / "ckpt_step=000030.msgpack").exists()
    assert (out / "summary" / "loss.png").exists()
    assert (out / "training_info.yaml").exists()
    return out


def test_train_l2_supervised(pipeline_dir, tiles_dir):
    from tempo_tpu.cli.train_vae_l2 import main

    cfg = _write(pipeline_dir / "train_l2.yaml", {
        "output_dir": str(pipeline_dir / "run_l2"),
        "seed": 42,
        "data": {
            "data_dir": str(tiles_dir),
            "batch_size": 8,
            "min_buffer_size": 16,
            "val_min_buffer_size": 8,
        },
        "model": MODEL_CFG,
        "l2": {"components": PRODUCTS, "mlp_hidden": [16, 16]},
        "optimizer": {"lr": 1e-3},
        "training": {"n_steps": 20, "save_every": 10, "val_every": 10,
                     "log_every": 5, "plot_every": 10},
    })
    main(cfg)
    out = pipeline_dir / "run_l2"
    metrics = json.loads((out / "metrics.json").read_text())
    last = metrics["train"][-1]
    for p in PRODUCTS:
        assert f"{p}_loss" in last
    assert (out / "summary" / "l2_losses.png").exists()
    assert (out / "figures").exists()


def test_evaluate_reconstruction_sweep(pipeline_dir, run_dir, tiles_dir):
    from tempo_tpu.cli.evaluate_reconstruction import main

    cfg = _write(pipeline_dir / "eval.yaml", {
        "output_dir": "eval_reconstruction",
        "exp_dir": str(run_dir),
        "data": {"val_dir": str(tiles_dir / "val"), "max_val_samples": 8},
        "model": {"training_config_path": "config.yaml"},
        "evaluation": {"batch_size": 4, "metrics": ["mse", "mae", "psnr"]},
        "plotting": {"plot_metrics": True, "dpi": 72},
        "seed": 42,
    })
    main(cfg)
    out = run_dir / "eval_reconstruction"
    results = json.loads(
        (out / "results" / "reconstruction_metrics.json").read_text())
    assert len(results) == 2  # checkpoints at 15 and 30
    assert {"checkpoint", "step", "mse", "mae", "psnr"} <= set(results[0])
    assert (out / "figures" / "metrics_vs_step.png").exists()


def test_extract_pca_and_analyze(pipeline_dir, run_dir, stats_dir, tiles_dir):
    from tempo_tpu.cli.analyze_reconstruction import main as analyze_main
    from tempo_tpu.cli.extract_pca import main as pca_main

    pca_cfg = _write(pipeline_dir / "pca.yaml", {
        "input_dir": str(pipeline_dir / "data" / "l1" / "raw"),
        "output_dir": str(pipeline_dir / "pca"),
        "normalization": {
            "mean_file": str(stats_dir / "tempo_mean_spectrum.npy"),
            "std_file": str(stats_dir / "tempo_std_spectrum.npy"),
        },
        "sampling": {"pixels_per_file": 64, "max_files": 4, "seed": 42},
        "pca": {"n_components": 3},
        "processing": {"min_radiance": 1.0, "clip_min": -10, "clip_max": 10},
    })
    pca_main(pca_cfg)
    assert (pipeline_dir / "pca" / "pca_components.npz").exists()

    analyze_cfg = _write(pipeline_dir / "analyze.yaml", {
        "output_dir": str(pipeline_dir / "analysis_recon"),
        "model": {
            "checkpoint_path": str(run_dir / "checkpoints" /
                                   "ckpt_step=000030.msgpack"),
            "training_config_path": str(run_dir / "config.yaml"),
        },
        "data": {
            "nc_path": str(pipeline_dir / "data" / "l1"),
            "tiles_path": str(tiles_dir),
        },
        "visualization": {
            "mode": "pca_rgb",
            "pca_components_path": str(pipeline_dir / "pca" /
                                       "pca_components.npz"),
        },
        "seed": 42,
    })
    analyze_main(analyze_cfg)
    pngs = list((pipeline_dir / "analysis_recon").glob("*_pca_rgb.png"))
    assert pngs


def test_probe_analysis(pipeline_dir, run_dir, tiles_dir):
    from tempo_tpu.cli.probe_analysis import main

    cfg = _write(pipeline_dir / "probe.yaml", {
        "output_dir": str(pipeline_dir / "probes"),
        "seed": 42,
        "data": {
            "l1_nc_path": str(pipeline_dir / "data" / "l1"),
            "l2_base_path": str(pipeline_dir / "data"),
            "tiles_path": str(tiles_dir),
            "l2_products": {p: f"l2_{p}" for p in PRODUCTS},
        },
        "model": {
            "checkpoint_path": str(run_dir / "checkpoints" /
                                   "ckpt_step=000030.msgpack"),
            "training_config_path": str(run_dir / "config.yaml"),
        },
        "probe": {"n_pixels_per_file": 50, "test_split": 0.2,
                  "max_epochs": 20, "learning_rate": 1e-2,
                  "weight_decay": 0.01, "batch_size": 64},
        "components": {
            "NO2": {"field": "vertical_column_troposphere", "scale": 1e15,
                    "norm_type": "asinh"},
            "CLDO4": {"field": "cloud_fraction", "scale": 1.0,
                      "norm_type": "logit"},
        },
    })
    main(cfg)
    out = pipeline_dir / "probes"
    results = json.loads((out / "results" / "probe_results.json").read_text())
    assert set(results) == {"NO2", "CLDO4"}
    for comp in results.values():
        assert "r2_score" in comp and np.isfinite(comp["r2_score"])
    assert (out / "figures" / "probe_summary.png").exists()
    assert (out / "models" / "probe_NO2.npz").exists()
    # data_stats diagnostics incl. the raw-vs-normalized comparison panel
    for stat_fig in ("all_normalizations_comparison.png",
                     "input_latent_distributions.png",
                     "target_distributions.png"):
        assert (out / "data_stats" / stat_fig).exists()


def test_encode_granules_sweep(pipeline_dir, run_dir, stats_dir):
    from tempo_tpu.cli.encode_granules import main

    cfg = _write(pipeline_dir / "encode.yaml", {
        "output_dir": str(pipeline_dir / "encoded"),
        "input_dir": str(pipeline_dir / "data" / "l1" / "raw"),
        "data": {"tiles_path": str(pipeline_dir / "tiles")},
        "model": {
            "checkpoint_path": str(run_dir / "checkpoints" /
                                   "ckpt_step=000030.msgpack"),
            "training_config_path": str(run_dir / "config.yaml"),
        },
        "decode_roundtrip": True,
        "max_files": 2,
    })
    main(cfg)
    out = pipeline_dir / "encoded"
    summary = json.loads((out / "encode_summary.json").read_text())
    assert summary["n_granules"] == 2
    for g in summary["granules"]:
        assert "mse" in g and "psnr" in g
        lat = np.load(out / "latents" / (Path(g["granule"]).stem + ".npz"))
        h, w, _ = g["input_shape"]
        assert lat["latent"].shape == (h // 4, w // 4, 4)


def test_train_tensor_parallel_cli(pipeline_dir, tiles_dir):
    """CLI wiring for 'parallel.tensor': the train entry builds the
    ('data','model') mesh, shards the state, and trains normally."""
    from tempo_tpu.cli.train_vae import main

    cfg = _write(pipeline_dir / "train_tp.yaml", {
        "output_dir": str(pipeline_dir / "run_tp"),
        "seed": 42,
        "parallel": {"tensor": 4},
        "data": {
            "train_dir": str(tiles_dir / "train"),
            "val_dir": str(tiles_dir / "val"),
            "batch_size": 8,
            "min_buffer_size": 16,
            "val_min_buffer_size": 8,
        },
        "model": MODEL_CFG,
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.95], "weight_decay": 0.05},
        "training": {"n_steps": 10, "save_every": 10, "val_every": 10,
                     "log_every": 5, "plot_every": 10},
    })
    main(cfg)
    out = pipeline_dir / "run_tp"
    metrics = json.loads((out / "metrics.json").read_text())
    losses = [m["loss"] for m in metrics["train"]]
    assert losses[-1] < losses[0]
    assert (out / "checkpoints" / "ckpt_step=000010.msgpack").exists()


def test_export_codec_cli(pipeline_dir, run_dir):
    """Train -> AOT export -> serve-from-artifacts: the exported StableHLO
    codec must rehydrate without model code and roundtrip a batch."""
    from tempo_tpu.cli.export_codec import main
    from tempo_tpu.infer.export_codec import load_exported

    cfg = _write(pipeline_dir / "export.yaml", {
        "output_dir": str(pipeline_dir / "export"),
        "model": {
            "checkpoint_path": str(
                run_dir / "checkpoints" / "ckpt_step=000030.msgpack"),
            "training_config_path": str(run_dir / "config.yaml"),
        },
    })
    main(cfg)

    encode, decode, meta = load_exported(pipeline_dir / "export" / "codec")
    tile = meta["tile_hw"][0]
    x = np.random.default_rng(0).standard_normal(
        (3, tile, tile, meta["spectral_channels"])).astype(np.float32)
    z = encode(x)
    assert tuple(z.shape) == (3, *meta["latent_hw"], meta["embed_dim"])
    rec = decode(z)
    assert rec.shape == x.shape
    assert np.all(np.isfinite(np.asarray(rec)))


def test_train_resume_auto_after_kill(pipeline_dir, tiles_dir):
    """Preemption recovery: a run killed mid-way restarts with
    training.resume_from: auto, re-enters its own output dir, continues from
    the latest checkpoint, and keeps the metric history intact."""
    from tempo_tpu.cli.train_vae import main

    out = pipeline_dir / "run_resume"
    base = {
        "output_dir": str(out),
        "seed": 42,
        "data": {
            "train_dir": str(tiles_dir / "train"),
            "batch_size": 8,
            "min_buffer_size": 16,
        },
        "model": MODEL_CFG,
        "optimizer": {"lr": 1e-3},
        "training": {"n_steps": 10, "save_every": 5, "log_every": 5,
                     "plot_every": 1000, "resume_from": "auto"},
    }
    # phase 1: "preempted" after 10 steps (checkpoints at 5 and 10)
    main(_write(pipeline_dir / "resume1.yaml", base))
    assert (out / "checkpoints" / "ckpt_step=000010.msgpack").exists()

    # phase 2: restart the same config with more steps -> continues from 10
    base["training"]["n_steps"] = 20
    main(_write(pipeline_dir / "resume2.yaml", base))
    assert (out / "checkpoints" / "ckpt_step=000020.msgpack").exists()

    metrics = json.loads((out / "metrics.json").read_text())
    steps = [m["step"] for m in metrics["train"]]
    # history spans BOTH phases continuously (5,10 from phase 1; 15,20 new)
    assert steps == sorted(steps)
    assert min(steps) <= 5 and max(steps) == 20
    assert 15 in steps  # phase-2 logging continued the same history


def test_train_and_sample_diffusion(pipeline_dir, tiles_dir, run_dir):
    """Latent-diffusion surface: train a VDM in the latent space of the
    trained VAE checkpoint (frozen codec fused into the jitted step), then
    regenerate tiles with the standalone sampling CLI."""
    from tempo_tpu.cli.sample_diffusion import main as sample_main
    from tempo_tpu.cli.train_diffusion import main as train_main

    out = pipeline_dir / "run_diff"
    cfg = _write(pipeline_dir / "train_diff.yaml", {
        "output_dir": str(out),
        "seed": 1,
        "data": {
            "train_dir": str(tiles_dir / "train"),
            "val_dir": str(tiles_dir / "val"),
            "batch_size": 8,
            "min_buffer_size": 16,
            "val_min_buffer_size": 8,
        },
        "latent": {
            "vae_checkpoint": str(run_dir / "checkpoints"
                                  / "ckpt_step=000030.msgpack"),
            "vae_model": MODEL_CFG,
        },
        "score_model": {"chs": [12, 16], "norm_groups": 4,
                        "n_attention_heads": 2, "t_embedding_dim": 8},
        "diffusion": {"noise_schedule": "fixed_linear",
                      "gamma_min": -8.0, "gamma_max": 4.0},
        "optimizer": {"lr": 1e-3},
        "training": {"n_steps": 20, "save_every": 10, "val_every": 10,
                     "log_every": 5, "plot_every": 10},
        "sampling": {"n_samples": 2, "n_steps": 8},
    })
    train_main(cfg)
    metrics = json.loads((out / "metrics.json").read_text())
    last = metrics["train"][-1]
    for k in ("loss", "diffusion_loss", "latent_loss",
              "reconstruction_loss"):
        assert k in last
    assert metrics["val"], "validation ran"
    assert (out / "checkpoints" / "ckpt_step=000020.msgpack").exists()
    # denoising-round-trip figures decode back to pixel space
    assert list((out / "figures").glob("reconstructions_step_*.png"))
    samples = np.load(out / "figures" / "samples_final.npy")
    assert samples.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(samples).all()

    scfg = _write(pipeline_dir / "sample_diff.yaml", {
        "run_dir": str(out),
        "output_dir": str(pipeline_dir / "diff_samples"),
        "n_samples": 2,
        "n_steps": 6,
        "seed": 3,
    })
    sample_main(scfg)
    s = np.load(pipeline_dir / "diff_samples" / "samples.npy")
    assert s.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(s).all()
    assert (pipeline_dir / "diff_samples" / "samples.png").exists()

    # mid-run contract: a preempted run has checkpoints + config.yaml but
    # no training_info.yaml — it must still be sampleable
    (out / "training_info.yaml").rename(out / "training_info.yaml.bak")
    scfg2 = _write(pipeline_dir / "sample_diff2.yaml", {
        "run_dir": str(out),
        "output_dir": str(pipeline_dir / "diff_samples_midrun"),
        "n_samples": 2, "n_steps": 4, "seed": 5,
    })
    sample_main(scfg2)
    s2 = np.load(pipeline_dir / "diff_samples_midrun" / "samples.npy")
    assert s2.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(s2).all()
    (out / "training_info.yaml.bak").rename(out / "training_info.yaml")


def test_train_and_sample_diffusion_pixel_space(pipeline_dir, tiles_dir):
    """Pixel-space diffusion (no `latent:` section): the score model runs
    directly on tiles, and sampling derives its shape from the tile shards
    rather than the VAE codec."""
    from tempo_tpu.cli.sample_diffusion import main as sample_main
    from tempo_tpu.cli.train_diffusion import main as train_main

    out = pipeline_dir / "run_diff_px"
    cfg = _write(pipeline_dir / "train_diff_px.yaml", {
        "output_dir": str(out),
        "seed": 2,
        "data": {
            "train_dir": str(tiles_dir / "train"),
            "val_dir": str(tiles_dir / "val"),
            "batch_size": 8,
            "min_buffer_size": 16,
            "val_min_buffer_size": 8,
        },
        "score_model": {"chs": [12, 16], "norm_groups": 4,
                        "n_attention_heads": 2, "t_embedding_dim": 8},
        "diffusion": {"noise_schedule": "fixed_linear",
                      "gamma_min": -8.0, "gamma_max": 4.0},
        "optimizer": {"lr": 1e-3},
        "training": {"n_steps": 10, "save_every": 10, "val_every": 10,
                     "log_every": 5, "plot_every": 10},
        "sampling": {"n_samples": 2, "n_steps": 4},
    })
    train_main(cfg)
    assert (out / "checkpoints" / "ckpt_step=000010.msgpack").exists()

    scfg = _write(pipeline_dir / "sample_diff_px.yaml", {
        "run_dir": str(out),
        "output_dir": str(pipeline_dir / "diff_samples_px"),
        "n_samples": 2, "n_steps": 4, "seed": 3,
    })
    sample_main(scfg)
    s = np.load(pipeline_dir / "diff_samples_px" / "samples.npy")
    assert s.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(s).all()

    # DDIM fast sampling through the same CLI (method override + eta)
    dcfg = _write(pipeline_dir / "sample_diff_ddim.yaml", {
        "run_dir": str(out),
        "output_dir": str(pipeline_dir / "diff_samples_ddim"),
        "n_samples": 2, "n_steps": 4, "seed": 3,
        "method": "ddim", "eta": 0.0,
    })
    sample_main(dcfg)
    import yaml as _yaml
    d = np.load(pipeline_dir / "diff_samples_ddim" / "samples.npy")
    assert d.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(d).all()
    info = _yaml.safe_load((pipeline_dir / "diff_samples_ddim"
                            / "sampling_info.yaml").read_text())
    assert info["method"] == "ddim" and info["eta"] == 0.0
    # a different reverse path than ancestral from the same seed
    assert np.abs(d - s).max() > 1e-6


def test_train_and_sample_flow_matching(pipeline_dir, tiles_dir, run_dir):
    """family: sfm — stochastic flow matching trained in the latent space
    of the trained VAE (frozen codec fused into the jitted step), sampled
    by scanned SDE integration from N(0,1) through the same sampling CLI."""
    from tempo_tpu.cli.sample_diffusion import main as sample_main
    from tempo_tpu.cli.train_diffusion import main as train_main

    out = pipeline_dir / "run_flow"
    cfg = _write(pipeline_dir / "train_flow.yaml", {
        "output_dir": str(out),
        "seed": 4,
        "family": "sfm",
        "data": {
            "train_dir": str(tiles_dir / "train"),
            "val_dir": str(tiles_dir / "val"),
            "batch_size": 8,
            "min_buffer_size": 16,
            "val_min_buffer_size": 8,
        },
        "latent": {
            "vae_checkpoint": str(run_dir / "checkpoints"
                                  / "ckpt_step=000030.msgpack"),
            "vae_model": MODEL_CFG,
        },
        "score_model": {"chs": [12, 16], "norm_groups": 4,
                        "n_attention_heads": 2, "t_embedding_dim": 8},
        "optimizer": {"lr": 1e-3},
        "training": {"n_steps": 20, "save_every": 10, "val_every": 10,
                     "log_every": 5, "plot_every": 10},
        "sampling": {"n_samples": 2, "n_steps": 6, "method": "lm"},
    })
    train_main(cfg)
    metrics = json.loads((out / "metrics.json").read_text())
    losses = [m["loss"] for m in metrics["train"]]
    assert np.isfinite(losses).all()
    assert metrics["val"], "validation ran"
    assert (out / "checkpoints" / "ckpt_step=000020.msgpack").exists()
    info = yaml.safe_load((out / "training_info.yaml").read_text())
    assert info["family"] == "sfm" and info["latent_space"]
    samples = np.load(out / "figures" / "samples_final.npy")
    assert samples.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(samples).all()

    scfg = _write(pipeline_dir / "sample_flow.yaml", {
        "run_dir": str(out),
        "output_dir": str(pipeline_dir / "flow_samples"),
        "n_samples": 2, "n_steps": 5, "seed": 6,
    })
    sample_main(scfg)
    s = np.load(pipeline_dir / "flow_samples" / "samples.npy")
    assert s.shape == (2, TILE, TILE, N_SPECTRAL)
    assert np.isfinite(s).all()
    info = yaml.safe_load(
        (pipeline_dir / "flow_samples" / "sampling_info.yaml").read_text())
    assert info["family"] == "sfm"
