#!/usr/bin/env python3
"""Train the TEMPO spectral VAE.

Entry-point parity with the reference (src/scripts/train_vae.py:23-186):
fail-fast config validation, init_directory + config copy, seeding, loaders,
model + AdamW, trainer with save/val/log/plot cadence, optional resume, and
training_info.yaml at the end. --debug shrinks to 200 steps / buffer 10.

TPU-first: the model trains through one fused jitted step; with multiple
chips visible the batch is sharded over a 'data' mesh automatically.
Config extras over the reference schema:
  model.compute_dtype: bfloat16 (default) | float32
  data.loader_threads, data.prefetch
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.data.loader import TileLoader
from tempo_tpu.models.vae import AutoencoderKL, build_vae
from tempo_tpu.parallel.mesh import (
    create_mesh,
    make_place_fn,
    maybe_initialize_distributed,
    shard_state,
)
from tempo_tpu.train.state import create_train_state, make_optimizer_from_config
from tempo_tpu.train.step import vae_loss_fn
from tempo_tpu.train.trainer import Trainer
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def validate_config(config) -> None:
    require_keys(config, ["output_dir", "data", "data.train_dir", "model",
                          "training"])
    train_dir = Path(config["data"]["train_dir"])
    if not train_dir.exists():
        raise ValueError(f"FATAL: Training directory doesn't exist: {train_dir}")
    if "val_dir" in config["data"]:
        val_dir = Path(config["data"]["val_dir"])
        if not val_dir.exists():
            raise ValueError(f"FATAL: Validation directory doesn't exist: {val_dir}")


def _metric_sinks(train_cfg, output_dir):
    """training.metrics_jsonl: true -> stream metrics to logs/metrics.jsonl
    (only on process 0; the step loop is replicated across processes)."""
    if not train_cfg.get("metrics_jsonl") or jax.process_index() != 0:
        return None
    from tempo_tpu.train.metrics import JsonlSink

    return [JsonlSink(Path(output_dir) / "logs" / "metrics.jsonl")]


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    validate_config(config)

    # Multi-host (DCN) data parallelism: must join the cluster before any
    # other JAX backend use. Returns the global mesh, or None.
    dist_mesh = maybe_initialize_distributed(config)
    is_primary = jax.process_index() == 0

    # resume_from: auto re-enters an existing output dir and continues from
    # its latest checkpoint — the preemption-recovery path (the v5e
    # operational reality; the reference only has explicit resume_from).
    from tempo_tpu.train.checkpoint import wants_auto_resume
    resume_auto = wants_auto_resume(config["training"])
    output_dir = Path(config["output_dir"])
    if is_primary:
        output_dir = init_directory(output_dir, overwrite=overwrite,
                                    allow_existing=resume_auto)
        (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
        (output_dir / "figures").mkdir(parents=True, exist_ok=True)
        (output_dir / "logs").mkdir(parents=True, exist_ok=True)
        copy_config(config_path, output_dir)

    seed = config.get("seed", 42)

    if debug:
        print("DEBUG MODE: Reduced training steps and data")
        config["training"]["n_steps"] = min(200, config["training"].get("n_steps", 10000))
        config["data"]["min_buffer_size"] = min(10, config["data"].get("min_buffer_size", 200))
        config["training"]["save_every"] = 50
        config["training"]["val_every"] = 25
        config["training"]["plot_every"] = 20

    data_cfg = config["data"]
    n_chips = jax.device_count()
    # The step mesh is built ONCE, up front, so the data loader and the
    # train step agree on device placement. parallel.tensor > 1 builds the
    # 2-D ('data','model') mesh (works multi-process: the global device set
    # is reshaped, and shard_state_tp assembles global arrays from each
    # process's host copy).
    n_model = int(config.get("parallel", {}).get("tensor", 1))
    if n_model > 1 and bool(config.get("parallel", {}).get("fsdp", False)):
        raise ValueError("FATAL: parallel.fsdp shards state over the 'data' "
                         "axis — it does not compose with parallel.tensor "
                         "in this CLI")
    if n_model > 1:
        from tempo_tpu.parallel.tensor import create_tp_mesh

        mesh = create_tp_mesh(n_model)
    else:
        mesh = (dist_mesh if dist_mesh is not None
                else create_mesh() if n_chips > 1 else None)

    # each process feeds its own batch shard from an independent stream
    loader_seed = seed + 1000 * jax.process_index()
    print("\nLoading training data...")
    loader_kind = data_cfg.get("loader", "host")
    if loader_kind == "device":
        # Device-resident shuffle buffer: batches are gathered in HBM, the
        # host only streams one shard per swap interval (the right choice
        # when host cores are scarce relative to step rate). With multiple
        # chips the pool is replicated and gathers shard on the batch axis.
        from tempo_tpu.data.device_buffer import DeviceTileBuffer

        train_loader = DeviceTileBuffer(
            data_dir=data_cfg["train_dir"],
            batch_size=data_cfg.get("batch_size", 16),
            slots=data_cfg.get("buffer_slots", 4),
            swap_every=data_cfg.get("swap_every", 16),
            # all processes must share one seed: the pool is replicated and
            # every process issues identical gather indices for the global
            # batch (batch_size here is the GLOBAL batch)
            seed=seed,
            dtype=data_cfg.get("buffer_dtype", "float32"),
            mesh=mesh,
            # 'process' scales the input path with hosts: disjoint per-host
            # shard ownership, local pools, zero cross-process batch traffic
            partition=data_cfg.get("partition", "replicate"),
        )
    else:
        train_loader = TileLoader(
            data_dir=data_cfg["train_dir"],
            batch_size=data_cfg.get("batch_size", 16),
            min_buffer_size=data_cfg.get("min_buffer_size", 200),
            seed=loader_seed,
            prefetch=data_cfg.get("prefetch", 2),
            num_threads=data_cfg.get("loader_threads",
                                     data_cfg.get("num_workers", 2)),
            verbose=True,
        )
    val_loader = None
    if "val_dir" in data_cfg:
        print("\nLoading validation data...")
        val_loader = TileLoader(
            data_dir=data_cfg["val_dir"],
            batch_size=data_cfg.get("batch_size", 16),
            min_buffer_size=data_cfg.get("val_min_buffer_size", 100),
            seed=loader_seed + 1,
            num_threads=data_cfg.get("val_num_workers", 1),
            verbose=True,
        )

    print("\nInitializing model...")
    model, model_cfg = build_vae(config.get("model", {}))
    sample_shape = (2, model_cfg.input_size, model_cfg.input_size,
                    model_cfg.in_channels)
    init_rng = jax.random.PRNGKey(seed)
    # jit the init: eager flax init dispatches hundreds of tiny device ops.
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params = init_fn(init_rng, jax.random.PRNGKey(seed + 1),
                     np.zeros(sample_shape, np.float32))["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"Model parameters: {n_params:,}")

    tx = make_optimizer_from_config(
        config.get("optimizer", {}),
        n_steps=int(config["training"].get("n_steps", 10_000)))
    state = create_train_state(params, tx, jax.random.PRNGKey(seed + 2))

    if n_model > 1:
        # 2-D ('data','model') mesh: channel-sharded params + optimizer
        # state for configurations wider than one chip's HBM.
        from tempo_tpu.parallel.tensor import shard_state_tp

        state = shard_state_tp(state, mesh)
        print(f"Tensor-parallel over {n_model} chips x data-parallel over "
              f"{n_chips // n_model} ({jax.process_count()} process(es))")
    elif mesh is not None:
        if bool(config.get("parallel", {}).get("fsdp", False)):
            # ZeRO-3: params + AdamW moments sharded over the same 'data'
            # axis as the batch; XLA all-gathers weights just-in-time and
            # reduce-scatters grads (parallel/fsdp.py).
            from tempo_tpu.parallel.fsdp import shard_state_fsdp

            state = shard_state_fsdp(state, mesh)
            print(f"FSDP (ZeRO-3) data-parallel over {n_chips} chips "
                  f"({jax.process_count()} process(es))")
        else:
            state = shard_state(state, mesh)
            print(f"Data-parallel over {n_chips} chips "
                  f"({jax.process_count()} process(es))")
    place_fn = make_place_fn(mesh)

    def recon_fn(params, x, rng):
        return model.apply({"params": params}, x, rng=rng,
                           method=AutoencoderKL.reconstruct)

    train_cfg = config["training"]
    save_steps = None
    if train_cfg.get("save_schedule") == "sqrt":
        from tempo_tpu.train.schedules import sqrt_save_steps

        save_steps = sqrt_save_steps(train_cfg["n_steps"],
                                     train_cfg.get("n_saves", 100))
    profile_steps = train_cfg.get("profile_steps")  # e.g. [100, 110]
    trainer = Trainer(
        loss_fn=vae_loss_fn(model),
        tx=tx,
        state=state,
        output_dir=output_dir,
        save_every=train_cfg.get("save_every", 1000),
        val_every=train_cfg.get("val_every", 100),
        log_every=train_cfg.get("log_every", 10),
        plot_every=train_cfg.get("plot_every", 50),
        place_fn=place_fn,
        recon_fn=recon_fn,
        profile_steps=tuple(profile_steps) if profile_steps else None,
        save_steps=save_steps,
        # 'sharded' saves cooperatively from every process's shards —
        # required for tensor-parallel states too wide for one host.
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
    print(f"\nStarting training for {n_steps} steps...")
    print(f"Output directory: {output_dir}")

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
            "device": str(jax.devices()[0]),
            "n_devices": n_chips,
            "n_processes": jax.process_count(),
            "n_params": int(n_params),
            "compute_dtype": model_cfg.compute_dtype,
            "training_time": str(end_time - start_time),
            "start_time": start_time.isoformat(),
            "end_time": end_time.isoformat(),
            "samples_per_sec": float(stats["samples_per_sec"]),
        }, output_dir / "training_info.yaml")
        print(f"Training info saved to {output_dir / 'training_info.yaml'}")
    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Train VAE on TEMPO tiles")
