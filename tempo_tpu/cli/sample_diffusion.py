#!/usr/bin/env python3
"""Generate tiles from a trained diffusion or flow-matching run.

Consumes a `train_diffusion.py` output directory (family vdm or sfm):
reads its copied config to rebuild the model / schedule / frozen-VAE
codec, loads a checkpoint (latest by default), runs scanned sampling on
device (ancestral for vdm, SDE integration for sfm), decodes to pixel
space when the run trained in latents, and writes `samples.npy` + a
panel figure.

Config:
  run_dir: <train_diffusion output dir>
  output_dir: <where to write samples>
  checkpoint: <optional explicit ckpt path; default latest in run_dir>
  n_samples: 16
  n_steps: 250
  method: <optional; vdm: ancestral|ddim, sfm: euler|lm;
           default = the train config's sampling.method>
  eta: 0.0   # DDIM noise knob (0 deterministic, 1 == ancestral)
  seed: 0
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["run_dir", "output_dir"])
    run_dir = Path(config["run_dir"])
    train_cfg_path = run_dir / "config.yaml"
    if not train_cfg_path.exists():
        raise ValueError(f"FATAL: no config.yaml in run dir: {run_dir}")
    train_config = load_config(str(train_cfg_path))

    output_dir = init_directory(Path(config["output_dir"]),
                                overwrite=overwrite)
    copy_config(config_path, output_dir)

    ckpt = config.get("checkpoint")
    if ckpt is None:
        from tempo_tpu.train.checkpoint import latest_checkpoint

        ckpt = latest_checkpoint(run_dir / "checkpoints")
        if ckpt is None:
            raise ValueError(f"FATAL: no checkpoints in {run_dir}")
    print(f"Checkpoint: {ckpt}")

    n_samples = int(config.get("n_samples", 16))
    n_steps = int(config.get("n_steps", 250))
    if debug:
        n_samples, n_steps = min(n_samples, 4), min(n_steps, 20)
    seed = int(config.get("seed", 0))

    # rebuild the model exactly as train_diffusion.py did (shared builder,
    # so the two CLIs can never drift apart)
    from tempo_tpu.cli.train_diffusion import (_build_codec,
                                               _build_generative,
                                               _init_generative,
                                               _make_sampler,
                                               _save_sample_panel)

    # training_info.yaml only exists for COMPLETED runs; a preempted or
    # still-running run (the resume_from-supported state) must be
    # sampleable too, so re-derive everything from the copied train config
    latent_space = "latent" in train_config
    tile = next(Path(train_config["data"]["train_dir"]).glob("*.npy"))
    px = np.load(tile, mmap_mode="r").shape[1:]
    decode_fn = None
    if latent_space:
        _, decode_fn, z_shape = _build_codec(train_config["latent"],
                                             (2, *px))
        model_shape = tuple(int(s) for s in z_shape[1:])
    else:
        model_shape = tuple(int(s) for s in px)

    model, family = _build_generative(train_config, model_shape)
    template = _init_generative(model, family, model_shape, seed=0)
    from tempo_tpu.train.checkpoint import load_params

    params = load_params(ckpt, template)

    train_samp = dict(train_config.get("sampling", {}))
    method = str(config.get("method", train_samp.get("method", "euler")))
    eta = float(config.get("eta", train_samp.get("eta", 0.0)))
    print(f"Sampling {n_samples} tiles over {n_steps} steps "
          f"({family}, method={method})...")
    _sample = _make_sampler(
        model, family, model_shape, n_samples, n_steps,
        decode_fn=decode_fn, method=method, eta=eta)

    samples = np.asarray(jax.device_get(
        _sample(params, jax.random.PRNGKey(seed))))
    np.save(output_dir / "samples.npy", samples)
    _save_sample_panel(output_dir / "samples.png", samples[:8])
    save_yaml({"checkpoint": str(ckpt), "family": family,
               "n_samples": n_samples, "n_steps": n_steps, "seed": seed,
               "method": method, "eta": eta,
               "sample_shape": list(samples.shape)},
              output_dir / "sampling_info.yaml")
    print(f"Wrote {samples.shape} -> {output_dir / 'samples.npy'}")
    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Sample tiles from a trained diffusion run")
