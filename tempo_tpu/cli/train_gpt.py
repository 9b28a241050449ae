#!/usr/bin/env python3
"""Train a GPT (optionally mixture-of-experts, optionally
pipeline-parallel) on a token stream.

Runtime surface for the transformer family the reference toolkit carries
(src/mltools/networks/networks.py:418-754 — a library with no training
script); this CLI gives it the framework's config/checkpoint/metrics
contract, reusing the same Trainer as the VAE and diffusion paths.

TPU-first: one fused jitted step (fwd+bwd+clip-free AdamW with the GPT
two-group weight decay); MoE via GShard static dispatch (nn/moe.py) with
the Switch aux loss folded in; `parallel.pipeline: S` stage-shards the
block stack over a 'pipe' mesh axis (parallel/pipeline.py) — the
ppermute microbatch schedule and its transposed backward are the same
compiled program.

Config:
  output_dir: ...
  seed: 42
  data:
    tokens: /path/stream.npy        # 1-D int token ids, or:
    synthetic: {vocab_size: 256, length: 100000, noise: 0.1}
    batch_size: 16
  model:                            # TransformerConfig fields
    n_layer: 4
    n_head: 4
    n_embd: 128
    block_size: 128
    in_size: 256                    # vocab (defaults to data vocab)
    n_kv_head: 0                    # 0 = MHA; < n_head = grouped-query
                                    #     attention (KV cache / group)
    n_experts: 0                    # >0 = MoE FFN
  optimizer: {lr: 3.0e-4, betas: [0.9, 0.95], weight_decay: 0.1}
  parallel:
    pipeline: 1                     # stages (>1 = pipeline-parallel)
    tensor: 1                       # >1 = channel-sharded params ('model'
                                    #      axis; composes with dp only)
    expert: 1                       # >1 = expert-parallel MoE weights
    context: 1                      # >1 = sequence sharded over a 'seq'
                                    #      axis (ring attention,
                                    #      parallel/context.py)
    context_zigzag: false           # true = load-balanced causal schedule
                                    #      (~half the attention FLOPs;
                                    #      block_size % 2*context == 0)
    fsdp: false                     # true = ZeRO-3: params + AdamW moments
                                    #      sharded over the 'data' axis
                                    #      (parallel/fsdp.py)
    n_micro: 4                      # microbatches per step (pipeline)
  training: {n_steps, log_every, save_every, val_every, plot_every,
             resume_from, moe_aux_weight: 0.01,
             grad_accum: 1}           # >1 = microbatches per update
                                      # (lax.scan inside the jitted step;
                                      # train/step.py)
  generation: {n_tokens: 64}        # end-of-run greedy continuation
  finetune:                         # optional: LoRA fine-tuning (nn/lora.py)
    lora_rank: 8                    # >0 = freeze the base, train adapters
    lora_scale: 1.0
    base_run: <train_gpt output dir>   # or base_checkpoint: <ckpt path>
                                    # writes checkpoints/merged_final.msgpack
                                    # (plain tree for export/serving)
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.data.tokens import TokenLoader, make_token_stream
from tempo_tpu.ops.losses import lm_cross_entropy
from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                      make_gpt_optimizer, num_params)
from tempo_tpu.train.state import create_train_state
from tempo_tpu.train.trainer import Trainer
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def build_transformer_config(model_cfg: dict) -> TransformerConfig:
    """`model:` config section -> TransformerConfig (lists become tuples).
    Shared with cli/export_lm.py so an exported run rebuilds exactly the
    model it trained."""
    return TransformerConfig(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in model_cfg.items()})


def validate_config(config) -> None:
    require_keys(config, ["output_dir", "data", "model", "training"])
    data = config["data"]
    if "tokens" not in data and "synthetic" not in data:
        raise ValueError("FATAL: data needs 'tokens' (npy path) or "
                         "'synthetic' ({vocab_size, length})")
    if "tokens" in data and not Path(data["tokens"]).exists():
        raise ValueError(f"FATAL: token stream doesn't exist: {data['tokens']}")
    stages = int(config.get("parallel", {}).get("pipeline", 1))
    n_layer = int(config["model"].get("n_layer", 12))
    if stages > 1 and n_layer % stages != 0:
        raise ValueError(f"FATAL: n_layer={n_layer} must divide by "
                         f"parallel.pipeline={stages}")
    n_expert = int(config.get("parallel", {}).get("expert", 1))
    if n_expert > 1:
        if stages > 1:
            raise ValueError("FATAL: parallel.expert with parallel.pipeline "
                             "is not a CLI path (use fsdp_experts in the "
                             "library pipeline instead)")
        n_experts = int(config["model"].get("n_experts", 0))
        if n_experts == 0 or n_experts % n_expert != 0:
            raise ValueError(f"FATAL: model.n_experts={n_experts} must be a "
                             f"positive multiple of parallel.expert="
                             f"{n_expert}")
    n_model = int(config.get("parallel", {}).get("tensor", 1))
    if n_model > 1 and (stages > 1 or n_expert > 1):
        raise ValueError("FATAL: parallel.tensor composes with data "
                         "parallelism only — not with parallel.pipeline "
                         "or parallel.expert in this CLI")
    n_seq = int(config.get("parallel", {}).get("context", 1))
    if n_seq > 1:
        if stages > 1 or n_expert > 1 or n_model > 1:
            raise ValueError("FATAL: parallel.context is its own CLI path "
                             "— not composed with pipeline/expert/tensor "
                             "here (data-axis composition lives in "
                             "parallel/context.py)")
        block = int(config["model"].get("block_size", 1024))
        if block % n_seq != 0:
            raise ValueError(f"FATAL: model.block_size={block} must divide "
                             f"by parallel.context={n_seq}")
        if (bool(config["parallel"].get("context_zigzag", False))
                and block % (2 * n_seq) != 0):
            raise ValueError(f"FATAL: context_zigzag needs model.block_size="
                             f"{block} divisible by 2*context={2 * n_seq}")
        if float(config["model"].get("dropout", 0.0)) > 0.0:
            raise ValueError("FATAL: parallel.context trains "
                             "deterministically — set model.dropout: 0")
        if int(config["model"].get("n_experts", 0)) > 0:
            raise ValueError("FATAL: parallel.context with an MoE FFN is "
                             "not a CLI path")
    if bool(config.get("parallel", {}).get("fsdp", False)):
        if stages > 1 or n_expert > 1 or n_model > 1 or n_seq > 1:
            raise ValueError("FATAL: parallel.fsdp shards state over the "
                             "'data' axis — it does not compose with "
                             "pipeline/expert/tensor/context in this CLI")
    ft = dict(config.get("finetune", {}))
    if int(ft.get("lora_rank", 0)) > 0:
        if "base_checkpoint" not in ft and "base_run" not in ft:
            raise ValueError("FATAL: finetune.lora_rank needs "
                             "finetune.base_checkpoint (ckpt path) or "
                             "finetune.base_run (train_gpt output dir)")
        if (stages > 1 or n_expert > 1 or n_model > 1 or n_seq > 1
                or bool(config.get("parallel", {}).get("fsdp", False))):
            raise ValueError("FATAL: finetune.lora_rank is the dense "
                             "data-parallel path — adapters are tiny, "
                             "model-sharding them buys nothing")


def _lm_loss_fn(model, aux_weight: float):
    """(params, batch[B,T+1], rng) -> (loss, metrics): next-token NLL plus
    the MoE aux term when the model routes. `rng` drives dropout when the
    model configures it."""
    moe = model.config.n_experts > 0
    dropout = model.config.dropout > 0.0

    def loss_fn(params, batch, rng):
        tokens, targets = batch[:, :-1], batch[:, 1:]
        if moe:
            from tempo_tpu.nn.moe import moe_lm_loss_fn

            loss, metrics = moe_lm_loss_fn(model, aux_weight)(
                params, tokens, targets, rng=rng)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return loss, metrics
        kwargs = ({"deterministic": False, "rngs": {"dropout": rng}}
                  if dropout else {})
        logits = model.apply({"params": params}, tokens, **kwargs)
        nll = lm_cross_entropy(logits, targets)
        return nll, {"loss": nll, "nll": nll}

    return loss_fn


def _pp_loss_fn(config, n_stages, n_micro, mesh):
    from tempo_tpu.parallel.pipeline import make_pp_loss_fn

    inner = make_pp_loss_fn(config, n_stages, n_micro, mesh)

    def loss_fn(params, batch, rng):
        loss = inner(params, batch[:, :-1], batch[:, 1:])
        return loss, {"loss": loss}

    return loss_fn


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    validate_config(config)

    # resume_from: auto re-enters an existing output dir and continues
    # from its latest checkpoint (preemption recovery, as in train_vae)
    from tempo_tpu.train.checkpoint import wants_auto_resume
    resume_auto = wants_auto_resume(config["training"])
    output_dir = init_directory(Path(config["output_dir"]),
                                overwrite=overwrite,
                                allow_existing=resume_auto)
    (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    copy_config(config_path, output_dir)

    seed = config.get("seed", 42)
    if debug:
        print("DEBUG MODE: Reduced training steps")
        config["training"]["n_steps"] = min(
            200, config["training"].get("n_steps", 10000))
        config["training"]["save_every"] = 100
        config["training"]["val_every"] = 50
        config["training"]["plot_every"] = 25

    data_cfg = config["data"]
    if "tokens" in data_cfg:
        stream = np.load(data_cfg["tokens"], mmap_mode="r")
    else:
        syn = dict(data_cfg["synthetic"])
        print(f"Generating synthetic token stream: {syn}")
        stream = make_token_stream(int(syn["vocab_size"]),
                                   int(syn["length"]),
                                   seed=seed,
                                   noise=float(syn.get("noise", 0.1)))

    model_cfg = dict(config["model"])
    if "in_size" not in model_cfg:
        # full-stream scan (pages in the whole mmap) — only when the config
        # doesn't pin the vocab itself
        model_cfg["in_size"] = int(stream.max()) + 1
    vocab = int(model_cfg["in_size"])
    tconfig = build_transformer_config(model_cfg)
    model = Transformer(tconfig)

    batch_size = int(data_cfg.get("batch_size", 16))
    train_loader = TokenLoader(stream, batch_size, tconfig.block_size,
                               seed=seed + 1)
    val_loader = TokenLoader(stream, batch_size, tconfig.block_size,
                             seed=seed + 2)

    print("\nInitializing GPT...")
    sample = next(iter(TokenLoader(stream, 2, tconfig.block_size, seed=0)))
    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(seed), sample[:, :-1])
    n_params = num_params(params)
    print(f"Parameters: {n_params:,} (non-embedding)")

    opt_cfg = dict(config.get("optimizer", {}))
    stages = int(config.get("parallel", {}).get("pipeline", 1))
    n_micro = int(config.get("parallel", {}).get("n_micro", 4))
    aux_weight = float(config["training"].get("moe_aux_weight", 0.01))

    mesh = None
    if stages > 1:
        from tempo_tpu.parallel.pipeline import (create_pp_mesh,
                                                 place_pipeline_params,
                                                 split_pipeline_params)

        mesh = create_pp_mesh(stages)
        params = place_pipeline_params(mesh,
                                       *split_pipeline_params(params, stages))
        if tconfig.n_experts > 0:
            print("NOTE: pipeline path trains with the LM loss only "
                  "(the MoE aux loss is not collected through the "
                  "shard_map pipeline)")
        if tconfig.dropout > 0.0:
            print("NOTE: pipeline path trains deterministically "
                  "(dropout is not threaded through the pipeline)")
        loss_fn = _pp_loss_fn(tconfig, stages, n_micro, mesh)
        print(f"Pipeline-parallel: {stages} stages x {n_micro} microbatches")
    elif int(config.get("parallel", {}).get("context", 1)) > 1:
        # sequence sharded over a 'seq' mesh axis: ring attention inside a
        # shard_map (K/V rotate via ppermute), pinned equal to unsharded in
        # tests/test_context.py. jit resharding moves the host batch onto
        # the seq shards via the shard_map in_specs — no explicit placement.
        from tempo_tpu.parallel.context import (cp_loss_fn, create_cp_mesh,
                                                make_cp_model,
                                                zigzag_permutation)

        n_seq = int(config["parallel"]["context"])
        zigzag = bool(config["parallel"].get("context_zigzag", False))
        mesh = create_cp_mesh(n_seq)
        inner = cp_loss_fn(make_cp_model(tconfig, mesh, zigzag=zigzag), mesh)
        # zigzag: permute the (already next-token-shifted) tokens/targets so
        # shard d receives chunks (d, 2S-1-d) — a static gather inside jit;
        # the shard_map in_specs then split the permuted axis contiguously
        perm = (jnp.asarray(zigzag_permutation(tconfig.block_size, n_seq))
                if zigzag else None)

        def loss_fn(params, batch, rng, _inner=inner, _perm=perm):
            tokens, targets = batch[:, :-1], batch[:, 1:]
            if _perm is not None:
                tokens = jnp.take(tokens, _perm, axis=1)
                targets = jnp.take(targets, _perm, axis=1)
            loss = _inner(params, tokens, targets)
            return loss, {"loss": loss}

        print(f"Context-parallel: sequence over {n_seq} devices "
              f"({'zigzag ' if zigzag else ''}ring attention)")
    else:
        loss_fn = _lm_loss_fn(model, aux_weight)
        n_expert = int(config.get("parallel", {}).get("expert", 1))
        if n_expert > 1:
            from tempo_tpu.parallel.expert import (create_ep_mesh,
                                                   shard_params_ep)

            params = shard_params_ep(params, create_ep_mesh(n_expert))
            print(f"Expert-parallel: [E,...] weights over {n_expert} devices")
        n_model = int(config.get("parallel", {}).get("tensor", 1))
        if n_model > 1:
            # channel-sharded params via the generic last-axis rule (the
            # same tp_sharding_rule the VAE uses; pinned equal to
            # unsharded in test_parallel.py::test_tensor_parallel_gpt_*)
            from tempo_tpu.parallel.tensor import (create_tp_mesh,
                                                   shard_params_tp)

            params = shard_params_tp(params, create_tp_mesh(n_model))
            print(f"Tensor-parallel: channels over {n_model} devices")

    # LoRA fine-tuning: freeze a trained base checkpoint, train rank-r
    # adapters only (nn/lora.py). The train state (params + AdamW moments)
    # becomes the adapter tree — optimizer memory scales with rank.
    ft_cfg = dict(config.get("finetune", {}))
    lora_rank = int(ft_cfg.get("lora_rank", 0))
    lora_base = None
    if lora_rank > 0:
        from tempo_tpu.nn.lora import apply_lora, init_lora
        from tempo_tpu.train.checkpoint import latest_checkpoint, load_params

        base_ckpt = ft_cfg.get("base_checkpoint")
        if base_ckpt is None:
            base_ckpt = latest_checkpoint(
                Path(ft_cfg["base_run"]) / "checkpoints")
            if base_ckpt is None:
                raise ValueError(f"FATAL: no checkpoints in "
                                 f"{ft_cfg['base_run']}")
        print(f"LoRA base: {base_ckpt}")
        base_params = jax.device_put(load_params(base_ckpt, params))
        lora_scale = float(ft_cfg.get("lora_scale", 1.0))
        inner_loss = loss_fn

        def loss_fn(lora, batch, rng, _base=base_params, _s=lora_scale,
                    _inner=inner_loss):
            return _inner(apply_lora(_base, lora, _s), batch, rng)

        params = init_lora(base_params, lora_rank,
                           jax.random.PRNGKey(seed + 7))
        lora_base = (base_params, lora_scale)
        n_adapter = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"LoRA fine-tune: rank {lora_rank}, scale {lora_scale}, "
              f"{n_adapter:,} trainable adapter params")

    # optimizer.schedule: constant (reference default) | cosine | linear —
    # warmup/decay via train/schedules.py lr_schedule
    from tempo_tpu.train.schedules import lr_schedule

    train_cfg = config["training"]
    lr = lr_schedule(opt_cfg, int(train_cfg.get("n_steps", 10_000)))
    tx = make_gpt_optimizer(params,
                            weight_decay=float(opt_cfg.get("weight_decay", 0.1)),
                            learning_rate=lr,
                            betas=tuple(opt_cfg.get("betas", (0.9, 0.95))),
                            moments_dtype=opt_cfg.get("moments_dtype"))
    state = create_train_state(params, tx, jax.random.PRNGKey(seed + 3))

    place_fn = None
    if bool(config.get("parallel", {}).get("fsdp", False)):
        # ZeRO-3: the whole train state (params + both AdamW moments)
        # sharded over the 'data' axis; the batch shards the same axis, so
        # XLA emits the all-gather/reduce-scatter schedule automatically.
        from tempo_tpu.parallel.fsdp import shard_state_fsdp
        from tempo_tpu.parallel.mesh import create_mesh, make_place_fn

        fsdp_mesh = create_mesh()
        state = shard_state_fsdp(state, fsdp_mesh)
        place_fn = make_place_fn(fsdp_mesh)
        print(f"FSDP (ZeRO-3): state sharded over {jax.device_count()} "
              f"devices")

    trainer = Trainer(
        loss_fn=loss_fn,
        tx=tx,
        state=state,
        output_dir=output_dir,
        save_every=train_cfg.get("save_every", 1000),
        val_every=train_cfg.get("val_every", 100),
        log_every=train_cfg.get("log_every", 10),
        plot_every=train_cfg.get("plot_every", 50),
        checkpoint_format=train_cfg.get("checkpoint_format", "msgpack"),
        grad_accum=int(train_cfg.get("grad_accum", 1)),
        place_fn=place_fn,
    )
    from tempo_tpu.train.checkpoint import resolve_resume_from

    resume_from = resolve_resume_from(train_cfg, output_dir)
    if resume_from:
        print(f"\nResuming from checkpoint: {resume_from}")
        trainer.load_checkpoint(resume_from)

    n_steps = train_cfg["n_steps"]
    print(f"\nTraining GPT for {n_steps} steps...")
    start_time = datetime.now()
    stats = trainer.train(
        train_iter=iter(train_loader),
        val_iter_factory=lambda: iter(val_loader),
        n_steps=n_steps,
    )
    end_time = datetime.now()

    save_yaml({
        "seed": seed,
        "vocab_size": vocab,
        "n_params_non_embedding": int(n_params),
        "n_experts": tconfig.n_experts,
        "pipeline_stages": stages,
        "training_time": str(end_time - start_time),
        "samples_per_sec": float(stats["samples_per_sec"]),
    }, output_dir / "training_info.yaml")

    # end-of-run greedy continuation from the stream's first tokens
    # (training_info is already on disk — generation can't lose the run)
    gen_cfg = dict(config.get("generation", {}))
    n_tokens = int(gen_cfg.get("n_tokens", 16 if debug else 64))
    prompt_len = 8
    room = tconfig.block_size - prompt_len
    if n_tokens > room:
        print(f"generation.n_tokens={n_tokens} clamped to {room} "
              f"(prompt {prompt_len} + new tokens must fit the "
              f"block size {tconfig.block_size})")
        n_tokens = room
    if lora_base is not None:
        # merged plain-tree checkpoint: zero-overhead serving artifact the
        # export/serve CLIs consume like any base checkpoint
        from flax import serialization

        from tempo_tpu.nn.lora import merge_lora

        merged = jax.device_get(merge_lora(lora_base[0],
                                           trainer.state.params,
                                           scale=lora_base[1]))
        merged_path = output_dir / "checkpoints" / "merged_final.msgpack"
        merged_path.write_bytes(serialization.msgpack_serialize({
            "step": int(jax.device_get(trainer.state.step)),
            "params": serialization.to_state_dict(merged)}))
        print(f"Merged LoRA checkpoint: {merged_path}")

    if n_tokens > 0:
        from tempo_tpu.nn.transformer import generate

        gen_params = trainer.state.params
        if lora_base is not None:
            from tempo_tpu.nn.lora import merge_lora

            gen_params = merge_lora(lora_base[0], trainer.state.params,
                                    scale=lora_base[1])
        if stages > 1:
            from tempo_tpu.parallel.pipeline import merge_pipeline_params

            gen_params = merge_pipeline_params(*jax.device_get(gen_params))
        prompt = jnp.asarray(
            np.asarray(stream[:prompt_len])[None].astype(np.int32))
        continuation = generate(model, gen_params, prompt,
                                max_new_tokens=n_tokens,
                                rng=jax.random.PRNGKey(seed + 4),
                                temperature=0.0)  # greedy
        np.save(output_dir / "generation_final.npy",
                np.asarray(continuation))
        print(f"Greedy continuation: {np.asarray(continuation)[0][:24]}...")

    print("\nDone!")


if __name__ == "__main__":
    run_cli(main, "Train a GPT (optionally MoE / pipeline-parallel) "
                  "on a token stream")
