#!/usr/bin/env python3
"""Convert a reference PyTorch checkpoint (.pt) into a tempo_tpu msgpack
checkpoint so trained reference models can be served/analyzed here.

Usage:
  python tools/import_torch_ckpt.py <ref_ckpt.pt> <out.msgpack> \
      [--config configs/training/train_vae_default.yaml] [--l2]

--l2 imports a reference L2-supervised checkpoint (VAEWithL2Supervision:
vae + l2_head — src/model_with_l2.py) for tempo_tpu's VAEWithL2Head.

The output contains params only (no optimizer state); it loads through
tempo_tpu.train.checkpoint.load_params and every analysis CLI.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import numpy as np  # noqa: E402
from flax import serialization  # noqa: E402

from tempo_tpu.interop.torch_ckpt import (  # noqa: E402
    load_torch_checkpoint,
    load_torch_l2_checkpoint,
)
from tempo_tpu.models.vae import build_vae  # noqa: E402
from tempo_tpu.utils.config import load_config  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_ckpt")
    parser.add_argument("output")
    parser.add_argument("--config",
                        default="configs/training/train_vae_default.yaml",
                        help="training config describing the architecture")
    parser.add_argument("--l2", action="store_true",
                        help="import an L2-supervised (vae + l2_head) ckpt")
    parser.add_argument("--mlp-hidden", default="512,512",
                        help="L2 head hidden dims (reference mlp_hidden)")
    args = parser.parse_args()

    train_config = load_config(args.config)
    _, cfg = build_vae(train_config.get("model", {}),
                       compute_dtype="float32")

    if args.l2:
        from tempo_tpu.models.vae_l2 import VAEWithL2Head

        mlp_hidden = tuple(int(v) for v in args.mlp_hidden.split(","))
        model = VAEWithL2Head(cfg, mlp_hidden=mlp_hidden)
        sample = {"spectral": np.zeros(
            (1, cfg.input_size, cfg.input_size, cfg.in_channels), np.float32)}
        for prod in ("NO2", "O3TOT", "HCHO", "CLDO4"):
            sample[prod] = np.zeros((1, cfg.input_size, cfg.input_size),
                                    np.float32)
        init_fn = jax.jit(lambda k1, k2, b: model.init(
            k1, b, k2, method=VAEWithL2Head.compute_loss))
        template = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                           sample)["params"]
        converted = load_torch_l2_checkpoint(
            args.torch_ckpt, mlp_hidden=mlp_hidden, n_levels=len(cfg.chs),
            num_res_blocks=cfg.num_res_blocks)
    else:
        model, _ = build_vae(train_config.get("model", {}),
                             compute_dtype="float32")
        sample = np.zeros(
            (1, cfg.input_size, cfg.input_size, cfg.in_channels), np.float32)
        init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
        template = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                           sample)["params"]
        converted = load_torch_checkpoint(args.torch_ckpt,
                                          n_levels=len(cfg.chs),
                                          num_res_blocks=cfg.num_res_blocks)
    params = serialization.from_state_dict(template, converted)

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    step = int(ckpt.get("step", 0)) if isinstance(ckpt, dict) else 0

    payload = {
        "step": step,
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": {},
        "rng": np.zeros(2, np.uint32),
        "ema": {},
        "train_metrics": json.dumps([]),
        "val_metrics": json.dumps([]),
    }
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.msgpack_serialize(payload))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"Wrote {out} (step={step}, {n:,} params)")


if __name__ == "__main__":
    main()
