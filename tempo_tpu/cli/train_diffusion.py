#!/usr/bin/env python3
"""Train a generative model on TEMPO tiles — variational diffusion (VDM)
or stochastic flow matching (SFM) — in pixel space or in the latent space
of a trained VAE.

Runtime surface for the generative families the reference toolkit
carries (src/mltools/models/vdm_model.py + ddpm_model.py + sfm_model.py;
the reference has no active training script for them — this CLI gives
the capability the same config/checkpoint/figures contract as the rest
of the framework).

TPU-first: ONE fused jitted step covers frozen-VAE encode (a fresh
posterior draw every step — stronger augmentation than a pre-encoded
latent dataset), the family loss, backward, clip, and AdamW; sampling
(ancestral for VDM, SDE integration for SFM) runs as a single `lax.scan`
program; with multiple chips the batch is sharded over the 'data' mesh
axis.

Config sections (beyond the train_vae.py schema):
  family: vdm | sfm           # default vdm
  latent:                     # optional — omit to train in pixel space
    vae_checkpoint: <path>    # .msgpack | sharded dir | reference .pt
    vae_model: {...}          # VAEConfig dict for that checkpoint
    scale: 1.0                # latent scaling (LDM convention)
  score_model:                # CUNet over the (latent) tensor — the
    chs: [64, 96]             # velocity model when family: sfm
    norm_groups: 8
    n_attention_heads: 4
    t_embedding_dim: 64
  diffusion:                  # family: vdm only
    noise_schedule: fixed_linear | sigmoid | learned_linear | learned_nn
    gamma_min: -13.3
    gamma_max: 5.0
  sampling:                   # end-of-run sample panel
    n_samples: 8
    n_steps: 250
    method: euler | lm        # family: sfm integrator (default euler)
                              # family: vdm -> ancestral | ddim
    eta: 0.0                  # ddim noise (0 deterministic, 1 ancestral)
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


def _build_generative(train_config, model_shape):
    """(model, family) over `model_shape` from a train_diffusion config.

    Shared by the train and sample CLIs so a run directory always
    rebuilds exactly the model it trained. family 'vdm' (default) wraps
    the CUNet as a VDM score model; 'sfm' wraps it as the velocity model
    of a stochastic flow from N(0,1), with the source sample fed back as
    spatial conditioning (reference: sfm_model.py:123-137)."""
    family = str(train_config.get("family", "vdm")).lower()
    score_cfg = dict(train_config["score_model"])
    kw = dict(shape=tuple(model_shape),
              chs=tuple(score_cfg.get("chs", [64, 96])),
              norm_groups=score_cfg.get("norm_groups", 8),
              n_attention_heads=score_cfg.get("n_attention_heads", 4),
              dropout_prob=score_cfg.get("dropout_prob", 0.0),
              t_conditioning=True,
              t_embedding_dim=score_cfg.get("t_embedding_dim", 64))
    if family == "sfm":
        from tempo_tpu.models.flow import SFM

        velocity = CUNet(s_conditioning_channels=int(model_shape[-1]), **kw)
        return SFM(velocity), family
    if family != "vdm":
        raise ValueError(f"FATAL: unknown family {family!r} (vdm | sfm)")
    diff_cfg = dict(train_config.get("diffusion", {}))
    model = VDM(CUNet(**kw),
                noise_schedule=diff_cfg.get("noise_schedule", "fixed_linear"),
                gamma_min=float(diff_cfg.get("gamma_min", -13.3)),
                gamma_max=float(diff_cfg.get("gamma_max", 5.0)),
                antithetic_time_sampling=diff_cfg.get(
                    "antithetic_time_sampling", True),
                data_noise=float(diff_cfg.get("data_noise", 1.0e-3)))
    return model, family


def _init_generative(model, family, model_shape, seed: int):
    """Jit-initialized params for either family (SFM's loss signature is
    (x0, x1); VDM's is (x,))."""
    z = np.zeros((2,) + tuple(model_shape), np.float32)
    if family == "sfm":
        init_fn = jax.jit(lambda k1, k2, zz: model.init(k1, zz, zz, rng=k2))
    else:
        init_fn = jax.jit(lambda k1, k2, zz: model.init(k1, zz, rng=k2))
    return init_fn(jax.random.PRNGKey(seed),
                   jax.random.PRNGKey(seed + 1), z)["params"]


def _make_sampler(model, family, model_shape, n_samples: int, n_steps: int,
                  decode_fn=None, method: str = "euler", eta: float = 0.0):
    """Jitted (params, rng) -> pixel/latent samples for either family:
    scanned ancestral/DDIM sampling (VDM) or scanned SDE integration from
    a standard-normal source (SFM).

    `method` is family-scoped: euler|lm for sfm, ancestral|ddim for vdm
    (the shared default 'euler' means 'ancestral' there); `eta` is the
    DDIM noise knob (0 deterministic, 1 ancestral-equivalent)."""
    if family == "sfm":
        from tempo_tpu.models.flow import predict as flow_predict

        @jax.jit
        def _sample(p, rng):
            k_src, k_sde = jax.random.split(rng)
            x0 = jax.random.normal(
                k_src, (n_samples,) + tuple(model_shape), np.float32)
            z = flow_predict(model, p, x0, k_sde, n_sampling_steps=n_steps,
                             method=method)
            return decode_fn(z) if decode_fn is not None else z

        return _sample

    from tempo_tpu.models.diffusion import sample as vdm_sample

    vdm_method = "ancestral" if method == "euler" else method

    @jax.jit
    def _sample(p, rng):
        z = vdm_sample(model, p, rng, batch_size=n_samples,
                       n_sampling_steps=n_steps,
                       sample_shape=tuple(model_shape),
                       method=vdm_method, eta=eta)
        return decode_fn(z) if decode_fn is not None else z

    return _sample


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

    model, family = _build_generative(config, model_shape)

    print(f"\nInitializing {family} model...")
    params = _init_generative(model, family, model_shape, seed)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"Score-model + schedule parameters: {n_params:,}")

    tx = make_optimizer_from_config(
        config.get("optimizer", {}),
        n_steps=int(config["training"].get("n_steps", 10_000)))
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

    if family == "sfm":
        from tempo_tpu.train.step import flow_loss_fn

        loss_fn = flow_loss_fn(model, encode_fn)
        # a flow has no denoising round trip — no recon figures; the
        # end-of-run sample panel is the visual artifact
        recon_fn = None
    else:
        loss_fn = diffusion_loss_fn(model, encode_fn)

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
        checkpoint_format=train_cfg.get("checkpoint_format", "msgpack"),
        grad_accum=int(train_cfg.get("grad_accum", 1)),
    )

    from tempo_tpu.train.checkpoint import resolve_resume_from

    resume_from = resolve_resume_from(train_cfg, output_dir)
    if resume_from:
        print(f"\nResuming from checkpoint: {resume_from}")
        trainer.load_checkpoint(resume_from)

    n_steps = train_cfg["n_steps"]
    print(f"\nStarting {family} training for {n_steps} steps...")
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
    _sample = _make_sampler(model, family, model_shape, n_samples,
                            n_samp_steps, decode_fn=decode_fn,
                            method=samp_cfg.get("method", "euler"),
                            eta=float(samp_cfg.get("eta", 0.0)))

    samples = np.asarray(jax.device_get(
        _sample(trainer.state.params, jax.random.PRNGKey(seed + 3))))
    np.save(output_dir / "figures" / "samples_final.npy", samples)
    _save_sample_panel(output_dir / "figures" / "samples_final.png", samples)

    save_yaml({
        "seed": seed,
        "family": family,
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
