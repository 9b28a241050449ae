#!/usr/bin/env python3
"""Train a variational diffusion model (VDM) on TEMPO tiles — in pixel
space or in the latent space of a trained VAE.

Runtime surface for the diffusion family the reference toolkit carries
(src/mltools/models/vdm_model.py + ddpm_model.py; the reference has no
active training script for it — this CLI gives the capability the same
config/checkpoint/figures contract as the rest of the framework).

TPU-first: ONE fused jitted step covers frozen-VAE encode (a fresh
posterior draw every step — stronger augmentation than a pre-encoded
latent dataset), the continuous-time ELBO, backward, clip, and AdamW;
ancestral sampling runs as a single `lax.scan` program; with multiple
chips the batch is sharded over the 'data' mesh axis.

Config sections (beyond the train_vae.py schema):
  latent:                     # optional — omit to train in pixel space
    vae_checkpoint: <path>    # .msgpack | sharded dir | reference .pt
    vae_model: {...}          # VAEConfig dict for that checkpoint
    scale: 1.0                # latent scaling (LDM convention)
  score_model:                # CUNet over the (latent) tensor
    chs: [64, 96]
    norm_groups: 8
    n_attention_heads: 4
    t_embedding_dim: 64
  diffusion:
    noise_schedule: fixed_linear | sigmoid | learned_linear | learned_nn
    gamma_min: -13.3
    gamma_max: 5.0
  sampling:                   # end-of-run sample panel
    n_samples: 8
    n_steps: 250
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.data.loader import TileLoader
from tempo_tpu.models.diffusion import VDM
from tempo_tpu.models.vae import AutoencoderKL, build_vae
from tempo_tpu.nn.unet import CUNet
from tempo_tpu.parallel.mesh import create_mesh, make_place_fn, shard_state
from tempo_tpu.train.state import create_train_state, make_optimizer_from_config
from tempo_tpu.train.step import diffusion_loss_fn
from tempo_tpu.train.trainer import Trainer
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def validate_config(config) -> None:
    require_keys(config, ["output_dir", "data", "data.train_dir",
                          "score_model", "training"])
    train_dir = Path(config["data"]["train_dir"])
    if not train_dir.exists():
        raise ValueError(f"FATAL: Training directory doesn't exist: {train_dir}")
    if "latent" in config:
        require_keys(config, ["latent.vae_checkpoint", "latent.vae_model"])
        ckpt = Path(config["latent"]["vae_checkpoint"])
        if not ckpt.exists():
            raise ValueError(f"FATAL: VAE checkpoint doesn't exist: {ckpt}")


def _build_codec(latent_cfg, sample_shape):
    """(encode_fn, decode_fn, latent_shape) for a frozen trained VAE.

    encode_fn(x, rng) samples the posterior and applies the LDM latent
    scale; decode_fn inverts the scale and decodes. Params are closed over
    as constants, so XLA folds the frozen weights into the step."""
    from tempo_tpu.train.checkpoint import load_params

    vae, _ = build_vae(dict(latent_cfg["vae_model"]))
    init_params = jax.jit(lambda k, x: vae.init(k, x, rng=k))(
        jax.random.PRNGKey(0), np.zeros(sample_shape, np.float32))["params"]
    params = load_params(latent_cfg["vae_checkpoint"], init_params)
    scale = float(latent_cfg.get("scale", 1.0))

    def encode_fn(x, rng):
        posterior = vae.apply({"params": params}, x,
                              method=AutoencoderKL.encode)
        return posterior.sample(rng) * scale

    def decode_fn(z):
        return vae.apply({"params": params}, z / scale,
                         method=AutoencoderKL.decode)

    z_shape = jax.eval_shape(encode_fn,
                             jax.ShapeDtypeStruct(sample_shape, np.float32),
                             jax.ShapeDtypeStruct((2,), np.uint32)).shape
    return encode_fn, decode_fn, z_shape


def _save_sample_panel(path: Path, samples: np.ndarray) -> None:
    """Grid of generated tiles: first channel per sample."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = samples.shape[0]
    fig, axes = plt.subplots(1, n, figsize=(2.2 * n, 2.4))
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.imshow(samples[i, :, :, 0], cmap="viridis")
        ax.set_title(f"sample {i}", fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    validate_config(config)

    # resume_from: auto re-enters an existing output dir and continues
    # from its latest checkpoint (preemption recovery, as in train_vae)
    from tempo_tpu.train.checkpoint import wants_auto_resume
    resume_auto = wants_auto_resume(config["training"])
    output_dir = Path(config["output_dir"])
    output_dir = init_directory(output_dir, overwrite=overwrite,
                                allow_existing=resume_auto)
    (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    (output_dir / "figures").mkdir(parents=True, exist_ok=True)
    copy_config(config_path, output_dir)

    seed = config.get("seed", 42)
    if debug:
        print("DEBUG MODE: Reduced training steps and data")
        config["training"]["n_steps"] = min(
            200, config["training"].get("n_steps", 10000))
        config["data"]["min_buffer_size"] = min(
            10, config["data"].get("min_buffer_size", 200))
        config["training"]["save_every"] = 50
        config["training"]["val_every"] = 25
        config["training"]["plot_every"] = 20

    data_cfg = config["data"]
    n_chips = jax.device_count()
    mesh = create_mesh() if n_chips > 1 else None
    place_fn = make_place_fn(mesh)

    print("\nLoading training data...")
    train_loader = TileLoader(
        data_dir=data_cfg["train_dir"],
        batch_size=data_cfg.get("batch_size", 16),
        min_buffer_size=data_cfg.get("min_buffer_size", 200),
        seed=seed + 1000,
        prefetch=data_cfg.get("prefetch", 2),
        num_threads=data_cfg.get("loader_threads", 2),
        verbose=True,
    )
    val_loader = None
    if "val_dir" in data_cfg:
        val_loader = TileLoader(
            data_dir=data_cfg["val_dir"],
            batch_size=data_cfg.get("batch_size", 16),
            min_buffer_size=data_cfg.get("val_min_buffer_size", 100),
            seed=seed + 1001,
            num_threads=1,
            verbose=True,
        )

    probe = next(iter(train_loader))
    sample_shape = (2,) + tuple(probe.shape[1:])

    encode_fn = decode_fn = None
    model_shape = sample_shape[1:]
    if "latent" in config:
        print("\nBuilding frozen VAE codec for latent-space training...")
        encode_fn, decode_fn, z_shape = _build_codec(config["latent"],
                                                     sample_shape)
        model_shape = z_shape[1:]
        print(f"Latent shape: {model_shape}")

    score_cfg = dict(config["score_model"])
    score = CUNet(shape=tuple(model_shape),
                  chs=tuple(score_cfg.get("chs", [64, 96])),
                  norm_groups=score_cfg.get("norm_groups", 8),
                  n_attention_heads=score_cfg.get("n_attention_heads", 4),
                  dropout_prob=score_cfg.get("dropout_prob", 0.0),
                  t_conditioning=True,
                  t_embedding_dim=score_cfg.get("t_embedding_dim", 64))
    diff_cfg = dict(config.get("diffusion", {}))
    model = VDM(score,
                noise_schedule=diff_cfg.get("noise_schedule", "fixed_linear"),
                gamma_min=float(diff_cfg.get("gamma_min", -13.3)),
                gamma_max=float(diff_cfg.get("gamma_max", 5.0)),
                antithetic_time_sampling=diff_cfg.get(
                    "antithetic_time_sampling", True),
                data_noise=float(diff_cfg.get("data_noise", 1.0e-3)))

    print("\nInitializing diffusion model...")
    z_sample = np.zeros((2,) + tuple(model_shape), np.float32)
    init_fn = jax.jit(lambda k1, k2, z: model.init(k1, z, rng=k2))
    params = init_fn(jax.random.PRNGKey(seed),
                     jax.random.PRNGKey(seed + 1), z_sample)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"Score-model + schedule parameters: {n_params:,}")

    tx = make_optimizer_from_config(config.get("optimizer", {}))
    state = create_train_state(params, tx, jax.random.PRNGKey(seed + 2))
    if mesh is not None:
        state = shard_state(state, mesh)
        print(f"Data-parallel over {n_chips} chips")

    import jax.numpy as jnp

    def recon_fn(p, x, rng):
        """Denoising round trip for the periodic figures: encode, diffuse
        to t=0.25, one-shot x0-hat from the predicted noise, decode."""
        k_enc, k_noise = jax.random.split(rng)
        z = encode_fn(x, k_enc) if encode_fn is not None else x
        b = z.shape[0]
        times = jnp.full((b,), 0.25, jnp.float32)
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)
        zt, gamma_t = model.apply({"params": p}, z, times, noise,
                                  method=VDM.variance_preserving_map)
        eps_hat = model.apply({"params": p}, zt,
                              jnp.reshape(gamma_t, (b,)),
                              method=VDM.get_pred_noise)
        z0_hat = (zt - VDM.sigma(gamma_t) * eps_hat) / VDM.alpha(gamma_t)
        return decode_fn(z0_hat) if decode_fn is not None else z0_hat

    train_cfg = config["training"]
    trainer = Trainer(
        loss_fn=diffusion_loss_fn(model, encode_fn),
        tx=tx,
        state=state,
        output_dir=output_dir,
        save_every=train_cfg.get("save_every", 1000),
        val_every=train_cfg.get("val_every", 100),
        log_every=train_cfg.get("log_every", 10),
        plot_every=train_cfg.get("plot_every", 50),
        place_fn=place_fn,
        recon_fn=recon_fn,
        checkpoint_format=train_cfg.get("checkpoint_format", "msgpack"),
    )

    from tempo_tpu.train.checkpoint import resolve_resume_from

    resume_from = resolve_resume_from(train_cfg, output_dir)
    if resume_from:
        print(f"\nResuming from checkpoint: {resume_from}")
        trainer.load_checkpoint(resume_from)

    n_steps = train_cfg["n_steps"]
    print(f"\nStarting diffusion training for {n_steps} steps...")
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

    # end-of-run sample panel: scanned ancestral sampling, decoded to
    # pixel space when training in latents
    samp_cfg = dict(config.get("sampling", {}))
    n_samples = int(samp_cfg.get("n_samples", 8))
    n_samp_steps = int(samp_cfg.get("n_steps", 50 if debug else 250))
    print(f"\nSampling {n_samples} tiles ({n_samp_steps} steps)...")
    from tempo_tpu.models.diffusion import sample as vdm_sample

    @jax.jit
    def _sample(p, rng):
        z = vdm_sample(model, p, rng, batch_size=n_samples,
                       n_sampling_steps=n_samp_steps,
                       sample_shape=tuple(model_shape))
        return decode_fn(z) if decode_fn is not None else z

    samples = np.asarray(jax.device_get(
        _sample(trainer.state.params, jax.random.PRNGKey(seed + 3))))
    np.save(output_dir / "figures" / "samples_final.npy", samples)
    _save_sample_panel(output_dir / "figures" / "samples_final.png", samples)

    save_yaml({
        "seed": seed,
        "n_devices": n_chips,
        "n_params": int(n_params),
        "latent_space": "latent" in config,
        "model_shape": [int(s) for s in model_shape],
        "training_time": str(end_time - start_time),
        "samples_per_sec": float(stats["samples_per_sec"]),
    }, output_dir / "training_info.yaml")
    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Train a VDM diffusion model on TEMPO tiles")
