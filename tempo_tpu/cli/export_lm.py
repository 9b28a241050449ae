#!/usr/bin/env python3
"""Export a trained GPT run as portable serving artifacts.

Consumes a `train_gpt.py` output directory: rebuilds the model from the
run's copied config (shared `build_transformer_config`, so the exported
model is exactly the trained one), loads a checkpoint (latest by
default; pipeline-parallel stage stacks are merged back to the flat
layer tree), optionally converts the block matmuls to int8 weight-only
serving precision (nn/quant.py), and writes the prefill + single-token
KV-cache decode step as StableHLO via infer/export_lm.py. A serving
host needs only `jax.export.deserialize` — no model code, tokenizer
stream, or checkpoint importer. (The reference has no serving story for
its GPT: networks.py:727-754 re-runs eager python per token from the
full training source tree.)

Config:
  run_dir: <train_gpt output dir>
  output_dir: <where to write artifacts>
  checkpoint: <optional explicit ckpt path; default latest in run_dir>
  quantize: none | int8             # weight-only serving quantization
  max_seq: <optional, default block_size>  # serving-window cache size
  decode_chunk: 8                   # fused K-token decode scan (0 disables)
  page_size: 0                      # >0: also export the paged-cache pair
                                    #   (decode_paged/admit_paged; serve with
                                    #   scheduler: paged + n_pages)
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def _resolve_vocab(train_config: dict, run_dir: Path) -> int:
    """The trained vocab: pinned in the config, or recorded by the
    completed run. A vocab derived from the token stream at train time is
    not re-derivable on a serving host without the data — fail loudly."""
    if "in_size" in train_config["model"]:
        return int(train_config["model"]["in_size"])
    info_path = run_dir / "training_info.yaml"
    if info_path.exists():
        return int(load_config(str(info_path))["vocab_size"])
    raise ValueError(
        "FATAL: vocab size unknown — the run's config has no model.in_size "
        f"and {info_path} does not exist (incomplete run). Pass the vocab "
        "by adding model.in_size to the run's config.yaml.")


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

    from tempo_tpu.cli.train_gpt import build_transformer_config
    from tempo_tpu.nn.transformer import Transformer, generate, num_params
    from tempo_tpu.train.checkpoint import load_params

    model_cfg = dict(train_config["model"])
    model_cfg["in_size"] = _resolve_vocab(train_config, run_dir)
    tconfig = build_transformer_config(model_cfg)
    model = Transformer(tconfig)

    sample = jnp.zeros((2, 8), jnp.int32)
    template = jax.jit(lambda k, t: model.init(k, t)["params"])(
        jax.random.PRNGKey(0), sample)

    stages = int(train_config.get("parallel", {}).get("pipeline", 1))
    if stages > 1:
        # pipeline checkpoints store (rest, stage_stack); merge back to
        # the flat h_0..h_{L-1} tree the serving graph runs
        from tempo_tpu.parallel.pipeline import (merge_pipeline_params,
                                                 split_pipeline_params)

        split_template = split_pipeline_params(template, stages)
        params = merge_pipeline_params(*load_params(ckpt, split_template))
    else:
        params = load_params(ckpt, template)

    quantize = str(config.get("quantize", "none")).lower()
    if quantize == "int8":
        from tempo_tpu.nn.quant import quantize_lm_params

        print("Quantizing block matmuls to int8 (weight-only)...")
        tconfig = dataclasses.replace(tconfig, quantize="int8")
        model = Transformer(tconfig)
        params = jax.jit(quantize_lm_params)(params)
    elif quantize != "none":
        raise ValueError(f"FATAL: unknown quantize mode {quantize!r} "
                         "(none | int8)")

    from tempo_tpu.infer.export_lm import export_lm, greedy_decode_exported

    # max_seq sizes the exported KV cache to the serving window (every
    # decode step streams the whole static buffer; shorter is exact)
    max_seq = config.get("max_seq")
    out = export_lm(params, tconfig, output_dir / "lm",
                    max_seq=int(max_seq) if max_seq else None,
                    decode_chunk=int(config.get("decode_chunk", 8)),
                    page_size=int(config.get("page_size", 0)))
    print(f"Exported prefill + decode_step to {out}")

    # smoke: the artifacts' greedy decode must equal the live model's
    limit = int(max_seq) if max_seq else tconfig.block_size
    n_check = min(4 if debug else 8, limit - 4)
    prompt = jnp.asarray(np.arange(4, dtype=np.int32)[None] % tconfig.in_size)
    got = greedy_decode_exported(out, prompt, n_check)
    ref = np.asarray(generate(model, params, prompt, n_check,
                              rng=jax.random.PRNGKey(1), temperature=0.0))
    np.testing.assert_array_equal(got, ref)
    print(f"Verified roundtrip: prompt {prompt.shape} -> {got.shape} greedy "
          "tokens match the live model")

    save_yaml({"checkpoint": str(ckpt), "quantize": quantize,
               "vocab_size": int(tconfig.in_size),
               "n_params": int(num_params(params)),
               "max_seq": int(max_seq) if max_seq else tconfig.block_size,
               "pipeline_stages_merged": stages},
              output_dir / "export_info.yaml")
    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Export a trained GPT run as StableHLO serving artifacts")
