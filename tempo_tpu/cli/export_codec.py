#!/usr/bin/env python3
"""Export a trained codec as portable serving artifacts.

Bakes a checkpoint's parameters into jitted encode/decode and serializes
them to StableHLO via jax.export (tempo_tpu/infer/export_codec.py) — a
serving host runs them with jax.export.deserialize alone: no model code,
training config, or checkpoint importer. Batch size is symbolic, so one
artifact serves any batch. (The reference re-instantiates the torch model
from source for every analysis script; this is the compiled-SavedModel
equivalent it lacks.)

Config keys: output_dir, model.{checkpoint_path,training_config_path},
optional tile_hw [H, W] (defaults to the training tile size).
"""

from __future__ import annotations

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.infer.export_codec import export_codec, load_exported
from tempo_tpu.models.vae import build_vae
from tempo_tpu.train.checkpoint import load_params
from tempo_tpu.utils.config import copy_config, load_config, require_keys
from tempo_tpu.utils.dirs import init_directory


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "model"])
    require_keys(config["model"], ["checkpoint_path", "training_config_path"])

    output_dir = init_directory(config["output_dir"], overwrite=overwrite)
    copy_config(config_path, output_dir)

    train_config = load_config(config["model"]["training_config_path"])
    model, model_cfg = build_vae(train_config.get("model", {}))
    tile_hw = tuple(config.get("tile_hw",
                               (model_cfg.input_size, model_cfg.input_size)))

    sample = np.zeros((1, *tile_hw, model_cfg.in_channels), np.float32)
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    template = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                       sample)["params"]
    params = load_params(config["model"]["checkpoint_path"], template)

    out = export_codec(params, model_cfg, output_dir / "codec",
                       tile_hw=tile_hw)
    print(f"Exported codec to {out}")

    # smoke: rehydrate and run one batch through both directions
    encode, decode, meta = load_exported(out)
    x = np.zeros((2, *tile_hw, model_cfg.in_channels), np.float32)
    z = encode(x)
    rec = decode(z)
    assert rec.shape == x.shape, (rec.shape, x.shape)
    print(f"Verified roundtrip: {x.shape} -> {tuple(z.shape)} -> {rec.shape}")


if __name__ == "__main__":
    run_cli(main, description=__doc__)
