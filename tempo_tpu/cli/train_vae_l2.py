#!/usr/bin/env python3
"""Train the VAE with multi-task L2 product supervision.

Entry-point parity with the reference L2-supervised trainer
(src/scripts/train_vae_l2_supervised.py:494-642): dict batches of
spectral + 4 L2 product tiles, VAEWithL2Head (fresh AdamW over ALL params —
VAE and head together, :580-585), per-product loss curves and prediction
panels in the reconstruction figures.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.cli.train_vae import _metric_sinks
from tempo_tpu.data.loader import TileLoader
from tempo_tpu.models.vae import VAEConfig
from tempo_tpu.models.vae_l2 import L2_PRODUCTS, VAEWithL2Head
from tempo_tpu.parallel.mesh import create_mesh, make_place_fn, shard_state
from tempo_tpu.train.state import create_train_state, make_optimizer_from_config
from tempo_tpu.train.trainer import Trainer
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "data", "data.data_dir", "model",
                          "training"])

    data_dir = Path(config["data"]["data_dir"])
    if not data_dir.exists():
        raise ValueError(f"FATAL: data directory doesn't exist: {data_dir}")

    # Multi-host (DCN) DP: join the cluster before any other JAX use.
    from tempo_tpu.parallel.mesh import maybe_initialize_distributed

    dist_mesh = maybe_initialize_distributed(config)
    is_primary = jax.process_index() == 0

    # resume_from: auto re-enters an existing output dir and continues from
    # its latest checkpoint (preemption recovery — see cli/train_vae.py).
    from tempo_tpu.train.checkpoint import wants_auto_resume
    resume_auto = wants_auto_resume(config["training"])
    output_dir = Path(config["output_dir"])
    if is_primary:
        output_dir = init_directory(output_dir, overwrite=overwrite,
                                    allow_existing=resume_auto)
        (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
        (output_dir / "figures").mkdir(parents=True, exist_ok=True)
        copy_config(config_path, output_dir)

    seed = config.get("seed", 42)

    if debug:
        print("DEBUG MODE: Reduced training steps and data")
        config["training"]["n_steps"] = min(200, config["training"].get("n_steps", 10000))
        config["data"]["min_buffer_size"] = min(10, config["data"].get("min_buffer_size", 200))
        config["training"]["save_every"] = 50
        config["training"]["val_every"] = 25
        config["training"]["plot_every"] = 20

    l2_cfg = config.get("l2", {})
    products = list(l2_cfg.get("components", L2_PRODUCTS))
    l2_weights = {p: float(l2_cfg.get("weights", {}).get(p, 0.1))
                  for p in products}
    mlp_hidden = tuple(l2_cfg.get("mlp_hidden", [512, 512]))

    data_cfg = config["data"]
    n_chips = jax.device_count()
    # One step mesh built up front, shared by the loader and the train step
    # (see train_vae.py — parallel.tensor > 1 builds the ('data','model')
    # mesh; shard_state_tp assembles global arrays on multi-process runs).
    n_model = int(config.get("parallel", {}).get("tensor", 1))
    if n_model > 1:
        from tempo_tpu.parallel.tensor import create_tp_mesh

        mesh = create_tp_mesh(n_model)
    else:
        mesh = (dist_mesh if dist_mesh is not None
                else create_mesh() if n_chips > 1 else None)

    print("\nLoading training data...")
    if data_cfg.get("loader", "host") == "device":
        # Device-resident shuffle buffer pooling spectral + L2 product
        # shards in HBM — dict batches gather on device, so L2-supervised
        # training runs at the same input rate as the base VAE.
        from tempo_tpu.data.device_buffer import DeviceTileBuffer

        train_loader = DeviceTileBuffer(
            data_dir=data_dir / "train",
            batch_size=data_cfg.get("batch_size", 32),
            slots=data_cfg.get("buffer_slots", 4),
            swap_every=data_cfg.get("swap_every", 16),
            seed=seed,
            dtype=data_cfg.get("buffer_dtype", "float32"),
            mesh=mesh,
            l2_products=products,
            partition=data_cfg.get("partition", "replicate"),
        )
    else:
        loader_seed = seed + 1000 * jax.process_index()
        train_loader = TileLoader(
            data_dir=data_dir / "train",
            batch_size=data_cfg.get("batch_size", 32),
            min_buffer_size=data_cfg.get("min_buffer_size", 200),
            l2_products=products,
            seed=loader_seed,
            num_threads=data_cfg.get("loader_threads",
                                     data_cfg.get("num_workers", 2)),
            verbose=True,
        )
    val_loader = None
    if (data_dir / "val").exists():
        print("\nLoading validation data...")
        val_loader = TileLoader(
            data_dir=data_dir / "val",
            batch_size=data_cfg.get("batch_size", 32),
            min_buffer_size=data_cfg.get("val_min_buffer_size", 100),
            l2_products=products,
            seed=seed + 1 + 1000 * jax.process_index(),
            num_threads=data_cfg.get("val_num_workers", 1),
            verbose=True,
        )

    print("\nInitializing model...")
    vae_cfg = VAEConfig.from_dict(config.get("model", {}))
    model = VAEWithL2Head(vae_cfg, mlp_hidden=mlp_hidden)

    tile = vae_cfg.input_size
    sample_batch = {"spectral": np.zeros((2, tile, tile, vae_cfg.in_channels),
                                         np.float32)}
    for p in products:
        sample_batch[p] = np.zeros((2, tile, tile), np.float32)

    init_fn = jax.jit(lambda k1, k2, b: model.init(
        k1, b, k2, method=VAEWithL2Head.compute_loss))
    params = init_fn(jax.random.PRNGKey(seed), jax.random.PRNGKey(seed + 1),
                     sample_batch)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"Model parameters (VAE + L2 head): {n_params:,}")

    # Optional: warm-start the VAE from a base checkpoint, then train a
    # FRESH optimizer over all params (reference behavior, :573-585).
    if "init_from_vae_checkpoint" in config.get("model", {}):
        from tempo_tpu.train.checkpoint import load_params

        vae_params = load_params(config["model"]["init_from_vae_checkpoint"],
                                 params["vae"])
        params = dict(params)
        params["vae"] = vae_params
        print("Initialized VAE weights from checkpoint")

    tx = make_optimizer_from_config(
        config.get("optimizer", {}),
        n_steps=int(config["training"].get("n_steps", 10_000)))
    state = create_train_state(params, tx, jax.random.PRNGKey(seed + 2))

    if n_model > 1:
        from tempo_tpu.parallel.tensor import shard_state_tp

        state = shard_state_tp(state, mesh)
        print(f"Tensor-parallel over {n_model} chips x data-parallel over "
              f"{n_chips // n_model} ({jax.process_count()} process(es))")
    elif mesh is not None:
        state = shard_state(state, mesh)
        print(f"Data-parallel over {n_chips} chips "
              f"({jax.process_count()} process(es))")
    place_fn = make_place_fn(mesh)

    def loss_fn(p, batch, rng):
        return model.apply({"params": p}, batch, rng, l2_weights,
                           method=VAEWithL2Head.compute_loss)

    def recon_fn(p, x, rng):
        return model.apply({"params": p}, x, rng)

    train_cfg = config["training"]
    trainer = Trainer(
        loss_fn=loss_fn,
        tx=tx,
        state=state,
        output_dir=output_dir,
        save_every=train_cfg.get("save_every", 1000),
        val_every=train_cfg.get("val_every", 100),
        log_every=train_cfg.get("log_every", 10),
        plot_every=train_cfg.get("plot_every", 50),
        place_fn=place_fn,
        recon_fn=recon_fn,
        l2_products=products,
        checkpoint_format=train_cfg.get("checkpoint_format", "msgpack"),
        grad_accum=int(train_cfg.get("grad_accum", 1)),
        metric_sinks=_metric_sinks(train_cfg, output_dir),
    )

    from tempo_tpu.train.checkpoint import resolve_resume_from

    resume_from = resolve_resume_from(train_cfg, output_dir)
    if resume_from:
        print(f"\nResuming from checkpoint: {resume_from}")
        trainer.load_checkpoint(resume_from)

    n_steps = train_cfg["n_steps"]
    print(f"\nStarting L2-supervised training for {n_steps} steps...")
    start_time = datetime.now()
    stats = trainer.train(
        train_iter=iter(train_loader),
        val_iter_factory=(lambda: iter(val_loader)) if val_loader else None,
        n_steps=n_steps,
    )
    end_time = datetime.now()
    train_loader.close()
    if val_loader:
        val_loader.close()

    if is_primary:
        save_yaml({
            "seed": seed,
            "n_devices": n_chips,
            "n_processes": jax.process_count(),
            "n_params": int(n_params),
            "l2_products": products,
            "l2_weights": l2_weights,
            "training_time": str(end_time - start_time),
            "samples_per_sec": float(stats["samples_per_sec"]),
        }, output_dir / "training_info.yaml")
    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Train VAE with L2 multi-task supervision")
