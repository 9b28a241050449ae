"""End-to-end GPT training CLI (cli/train_gpt.py): dense, MoE, and
pipeline-parallel paths on the synthetic affine token stream."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml


def _write(path: Path, cfg: dict) -> str:
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


BASE_MODEL = {"n_layer": 2, "n_head": 2, "n_embd": 32, "block_size": 32,
              "dropout": 0.0}


def _base_cfg(out: Path, **model_extra) -> dict:
    return {
        "output_dir": str(out),
        "seed": 7,
        "data": {"synthetic": {"vocab_size": 17, "length": 20000,
                               "noise": 0.05},
                 "batch_size": 16},
        "model": {**BASE_MODEL, **model_extra},
        "optimizer": {"lr": 3.0e-3, "weight_decay": 0.1},
        "training": {"n_steps": 60, "log_every": 5, "save_every": 30,
                     "val_every": 30, "plot_every": 1000},
        "generation": {"n_tokens": 8},
    }


def test_train_gpt_learns_synthetic_stream(tmp_path):
    """The affine stream is learnable: train NLL must drop well below the
    log(V) no-learning floor; checkpoints + generation artifacts exist."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run"
    main(_write(tmp_path / "cfg.yaml", _base_cfg(out)))

    metrics = json.loads((out / "metrics.json").read_text())
    losses = [m["loss"] for m in metrics["train"]]
    floor = np.log(17)  # ≈2.83: uniform-prediction loss
    assert losses[-1] < 0.75 * floor, (losses[0], losses[-1])
    assert losses[-1] < losses[0]

    assert (out / "checkpoints" / "ckpt_step=000060.msgpack").exists()
    gen = np.load(out / "generation_final.npy")
    assert gen.shape == (1, 16) and gen.dtype == np.int32
    info = yaml.safe_load((out / "training_info.yaml").read_text())
    assert info["vocab_size"] == 17 and info["pipeline_stages"] == 1


def test_train_gpt_moe_path(tmp_path):
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_moe"
    cfg = _base_cfg(out, n_experts=2, expert_capacity_factor=2.0)
    cfg["training"]["n_steps"] = 20
    cfg["training"]["moe_aux_weight"] = 0.02
    main(_write(tmp_path / "cfg_moe.yaml", cfg))

    metrics = json.loads((out / "metrics.json").read_text())
    assert "moe_aux" in metrics["train"][0]
    assert np.isfinite(metrics["train"][-1]["moe_aux"])
    info = yaml.safe_load((out / "training_info.yaml").read_text())
    assert info["n_experts"] == 2


def test_train_gpt_pipeline_parallel(tmp_path):
    """parallel.pipeline: 2 stage-shards the block stack over the CPU mesh
    and still trains + generates (params merged back for decode)."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_pp"
    cfg = _base_cfg(out)
    cfg["parallel"] = {"pipeline": 2, "n_micro": 4}
    cfg["training"]["n_steps"] = 20
    main(_write(tmp_path / "cfg_pp.yaml", cfg))

    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["train"][-1]["loss"] < metrics["train"][0]["loss"]
    assert any((out / "checkpoints").glob("ckpt_step=*"))
    assert np.load(out / "generation_final.npy").shape == (1, 16)
    info = yaml.safe_load((out / "training_info.yaml").read_text())
    assert info["pipeline_stages"] == 2


@pytest.mark.slow
def test_export_lm_cli_from_run(tmp_path):
    """cli/export_lm.py consumes a train_gpt run dir: fp and int8 exports
    both verify their own greedy roundtrip against the live model, and a
    pipeline-parallel checkpoint is merged back to the flat tree."""
    from tempo_tpu.cli.export_lm import main as export_main
    from tempo_tpu.cli.train_gpt import main as train_main

    out = tmp_path / "run"
    cfg = _base_cfg(out)
    cfg["training"]["n_steps"] = 20
    train_main(_write(tmp_path / "cfg.yaml", cfg))

    for mode in ("none", "int8"):
        exp = tmp_path / f"export_{mode}"
        export_main(_write(tmp_path / f"exp_{mode}.yaml", {
            "run_dir": str(out), "output_dir": str(exp),
            "quantize": mode}))
        assert (exp / "lm" / "prefill.stablehlo").exists()
        assert (exp / "lm" / "decode_step.stablehlo").exists()
        info = yaml.safe_load((exp / "export_info.yaml").read_text())
        assert info["quantize"] == mode and info["vocab_size"] == 17

    # pipeline-parallel run: stage stacks merged back for serving
    out_pp = tmp_path / "run_pp"
    cfg = _base_cfg(out_pp)
    cfg["parallel"] = {"pipeline": 2, "n_micro": 4}
    cfg["training"]["n_steps"] = 10
    train_main(_write(tmp_path / "cfg_pp.yaml", cfg))
    exp = tmp_path / "export_pp"
    export_main(_write(tmp_path / "exp_pp.yaml", {
        "run_dir": str(out_pp), "output_dir": str(exp)}))
    info = yaml.safe_load((exp / "export_info.yaml").read_text())
    assert info["pipeline_stages_merged"] == 2

    # the exported artifacts decode greedily from cold, and on a TRAINED
    # model (sharp margins on the learnable affine stream) the int8
    # export agrees with the fp export on almost every greedy token
    from tempo_tpu.infer.export_lm import greedy_decode_exported

    prompt = np.zeros((1, 3), np.int32)
    fp_toks = greedy_decode_exported(tmp_path / "export_none" / "lm",
                                     prompt, 12)
    q_toks = greedy_decode_exported(tmp_path / "export_int8" / "lm",
                                    prompt, 12)
    assert fp_toks.shape == q_toks.shape == (1, 15)
    agreement = float((fp_toks == q_toks).mean())
    assert agreement >= 0.8, agreement


def test_train_gpt_config_validation(tmp_path):
    from tempo_tpu.cli.train_gpt import main

    cfg = _base_cfg(tmp_path / "x")
    cfg["parallel"] = {"pipeline": 3}  # n_layer=2 not divisible
    with pytest.raises(ValueError, match="divide"):
        main(_write(tmp_path / "bad.yaml", cfg))

    cfg2 = _base_cfg(tmp_path / "y")
    del cfg2["data"]["synthetic"]
    with pytest.raises(ValueError, match="tokens"):
        main(_write(tmp_path / "bad2.yaml", cfg2))


@pytest.mark.slow  # heavier sibling: the MoE CLI path stays fast and
# EP-sharded == unsharded is pinned fast in test_moe.py
def test_train_gpt_expert_parallel(tmp_path):
    """parallel.expert: 2 shards the [E,...] expert weights over an
    'expert' mesh and still trains end-to-end."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_ep"
    cfg = _base_cfg(out, n_experts=2, expert_capacity_factor=2.0)
    cfg["parallel"] = {"expert": 2}
    cfg["training"]["n_steps"] = 15
    main(_write(tmp_path / "cfg_ep.yaml", cfg))

    metrics = json.loads((out / "metrics.json").read_text())
    assert np.isfinite(metrics["train"][-1]["loss"])
    info = yaml.safe_load((out / "training_info.yaml").read_text())
    assert info["n_experts"] == 2


@pytest.mark.slow
def test_train_gpt_tensor_parallel(tmp_path):
    """parallel.tensor: 2 channel-shards the params over a 'model' mesh
    axis and still trains + generates end-to-end (XLA inserts the
    activation collectives)."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_tp"
    cfg = _base_cfg(out)
    cfg["parallel"] = {"tensor": 2}
    cfg["training"]["n_steps"] = 15
    main(_write(tmp_path / "cfg_tp.yaml", cfg))

    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["train"][-1]["loss"] < metrics["train"][0]["loss"]
    assert np.load(out / "generation_final.npy").shape == (1, 16)

    # tensor composes with dp only in this CLI
    cfg = _base_cfg(tmp_path / "bad")
    cfg["parallel"] = {"tensor": 2, "pipeline": 2}
    import pytest

    with pytest.raises(ValueError, match="parallel.tensor"):
        main(_write(tmp_path / "cfg_bad_tp.yaml", cfg))


def test_train_gpt_expert_parallel_validation(tmp_path):
    from tempo_tpu.cli.train_gpt import main

    cfg = _base_cfg(tmp_path / "z", n_experts=3)
    cfg["parallel"] = {"expert": 2}  # 3 % 2 != 0
    with pytest.raises(ValueError, match="multiple"):
        main(_write(tmp_path / "bad3.yaml", cfg))


@pytest.mark.slow
def test_train_gpt_resume_auto(tmp_path):
    """resume_from: auto re-enters the run's own output dir and continues
    from the latest checkpoint with the metric history intact."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_resume"
    cfg = _base_cfg(out)
    cfg["training"].update({"n_steps": 30, "save_every": 15,
                            "resume_from": "auto", "log_every": 5})
    main(_write(tmp_path / "r1.yaml", cfg))
    assert (out / "checkpoints" / "ckpt_step=000030.msgpack").exists()

    cfg["training"]["n_steps"] = 45
    main(_write(tmp_path / "r2.yaml", cfg))
    assert (out / "checkpoints" / "ckpt_step=000045.msgpack").exists()

    metrics = json.loads((out / "metrics.json").read_text())
    steps = [m["step"] for m in metrics["train"]]
    assert steps == sorted(steps) and max(steps) == 45
    assert 30 in steps and 35 in steps  # both phases in one history


@pytest.mark.slow
def test_train_gpt_context_parallel(tmp_path):
    """parallel.context: 4 shards the sequence over a 'seq' mesh axis (ring
    attention) and still trains + generates end-to-end; the decode path is
    the ordinary unsharded model on the same params."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_cp"
    cfg = _base_cfg(out, rope=True, pos_embed=False, attn_impl="xla")
    cfg["parallel"] = {"context": 4}
    cfg["training"]["n_steps"] = 15
    main(_write(tmp_path / "cfg_cp.yaml", cfg))

    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["train"][-1]["loss"] < metrics["train"][0]["loss"]
    assert np.load(out / "generation_final.npy").shape == (1, 16)

    # zigzag (load-balanced causal schedule) trains through the same path
    out_z = tmp_path / "run_cp_zigzag"
    cfg = _base_cfg(out_z, rope=True, pos_embed=False, attn_impl="xla")
    cfg["parallel"] = {"context": 4, "context_zigzag": True}
    cfg["training"]["n_steps"] = 15
    main(_write(tmp_path / "cfg_cp_z.yaml", cfg))
    metrics = json.loads((out_z / "metrics.json").read_text())
    assert metrics["train"][-1]["loss"] < metrics["train"][0]["loss"]

    # context is its own CLI path: no pipeline/tensor/expert composition
    cfg = _base_cfg(tmp_path / "bad_cp")
    cfg["parallel"] = {"context": 2, "tensor": 2}
    with pytest.raises(ValueError, match="parallel.context"):
        main(_write(tmp_path / "cfg_bad_cp.yaml", cfg))

    # block size must divide by the seq axis
    cfg = _base_cfg(tmp_path / "bad_cp2")
    cfg["parallel"] = {"context": 3}
    with pytest.raises(ValueError, match="divide"):
        main(_write(tmp_path / "cfg_bad_cp2.yaml", cfg))


@pytest.mark.slow
def test_train_gpt_fsdp(tmp_path):
    """parallel.fsdp: true shards the GPT train state (params + AdamW
    moments) over the 'data' axis and still trains + generates."""
    from tempo_tpu.cli.train_gpt import main

    out = tmp_path / "run_fsdp"
    cfg = _base_cfg(out)
    cfg["parallel"] = {"fsdp": True}
    cfg["training"]["n_steps"] = 15
    main(_write(tmp_path / "cfg_fsdp.yaml", cfg))

    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["train"][-1]["loss"] < metrics["train"][0]["loss"]
    assert np.load(out / "generation_final.npy").shape == (1, 16)

    cfg = _base_cfg(tmp_path / "bad_fsdp")
    cfg["parallel"] = {"fsdp": True, "tensor": 2}
    with pytest.raises(ValueError, match="parallel.fsdp"):
        main(_write(tmp_path / "cfg_bad_fsdp.yaml", cfg))


@pytest.mark.slow
def test_train_gpt_lora_finetune(tmp_path):
    """finetune.lora_rank: a short base run, then a LoRA run on top of its
    checkpoint — adapters-only state, loss keeps dropping from the base
    model's level, merged_final.msgpack loads as a plain param tree."""
    from tempo_tpu.cli.train_gpt import main

    base_out = tmp_path / "base"
    cfg = _base_cfg(base_out)
    cfg["training"]["n_steps"] = 40
    main(_write(tmp_path / "cfg_base.yaml", cfg))

    ft_out = tmp_path / "lora"
    ft_cfg = _base_cfg(ft_out)
    ft_cfg["training"]["n_steps"] = 40
    ft_cfg["finetune"] = {"lora_rank": 4, "base_run": str(base_out)}
    main(_write(tmp_path / "cfg_lora.yaml", ft_cfg))

    base_metrics = json.loads((base_out / "metrics.json").read_text())
    ft_metrics = json.loads((ft_out / "metrics.json").read_text())
    base_final = base_metrics["train"][-1]["loss"]
    ft_losses = [m["loss"] for m in ft_metrics["train"]]
    # step 0 of the fine-tune IS the frozen base (b=0 init), and the
    # adapters then improve on it
    assert ft_losses[0] < 1.3 * base_final, (ft_losses[0], base_final)
    assert ft_losses[-1] < ft_losses[0]

    # the adapter checkpoint is tiny next to the base one
    import os
    base_ckpt = base_out / "checkpoints" / "ckpt_step=000040.msgpack"
    lora_ckpt = ft_out / "checkpoints" / "ckpt_step=000040.msgpack"
    assert os.path.getsize(lora_ckpt) < 0.5 * os.path.getsize(base_ckpt)

    # merged artifact round-trips through the standard params loader and
    # reproduces the adapted generation path
    merged_path = ft_out / "checkpoints" / "merged_final.msgpack"
    assert merged_path.exists()
    import jax
    import jax.numpy as jnp

    from tempo_tpu.cli.train_gpt import build_transformer_config
    from tempo_tpu.nn.transformer import Transformer, generate
    from tempo_tpu.train.checkpoint import load_params

    tcfg = build_transformer_config({**BASE_MODEL, "in_size": 17})
    model = Transformer(tcfg)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 4), jnp.int32))["params"]
    merged = load_params(merged_path, template)
    toks = generate(model, merged,
                    jnp.zeros((1, 4), jnp.int32), 4,
                    jax.random.PRNGKey(0), temperature=0.0)
    assert toks.shape == (1, 8)

    # config validation: lora + model sharding is rejected
    bad = _base_cfg(tmp_path / "bad")
    bad["finetune"] = {"lora_rank": 4, "base_run": str(base_out)}
    bad["parallel"] = {"tensor": 2}
    with pytest.raises(ValueError, match="dense"):
        main(_write(tmp_path / "cfg_bad.yaml", bad))
