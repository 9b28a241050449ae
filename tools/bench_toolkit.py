#!/usr/bin/env python3
"""Measured throughput for the round-3 toolkit model families on the real
chip: GPT train step (tokens/s + MFU), MoE GPT train step, and the VDM
diffusion train step on VAE-latent-shaped tiles.

The flagship VAE bench stays in bench.py (the driver contract: one JSON
line); this tool backs the DESIGN.md perf notes for the other families.

Axon-transport rules apply (CLAUDE.md): everything jitted (init included),
sync via scalar fetch, chain steps between fetches.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_toolkit.py
       [--family gpt|moe|diffusion|decode|serve|all] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_steps(step, state, batch, warmup: int, iters: int):
    """Returns (seconds per step, final metric). Sync by fetching the
    scalar loss (block_until_ready does not truly block on axon)."""
    for _ in range(warmup):
        state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    final = float(loss)
    dt = (time.perf_counter() - t0) / iters
    return dt, final


def bench_gpt(batch_size: int = 8, iters: int = 10, n_experts: int = 0,
              compute_dtype: str = "bfloat16", remat: bool = False,
              moments_dtype=None, n_layer: int = 12, n_head: int = 12,
              n_embd: int = 768) -> dict:
    """GPT LM train step; defaults to GPT-2-small scale (12L/12H/768d,
    block 1024). `--family gpt-medium` runs 24L/16H/1024d (355M) with
    remat + bf16 first moment — the scale-MFU probe."""
    import optax

    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          estimate_mfu, make_gpt_optimizer,
                                          num_params)

    cfg = TransformerConfig(in_size=50304, block_size=1024,
                            n_layer=n_layer,
                            n_head=n_head, n_embd=n_embd, rope=False,
                            compute_dtype=compute_dtype,
                            n_experts=n_experts, remat=remat)
    model = Transformer(cfg)
    # block_size+1 tokens so inputs (tok[:, :-1]) are a lane-aligned 1024
    # long — a 1023-long sequence pads every seq-tiled op
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.in_size, (batch_size, cfg.block_size + 1), dtype=np.int32))

    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), tokens[:1, :-1])
    n_params = num_params(params)
    tx = make_gpt_optimizer(params, weight_decay=0.1, learning_rate=3e-4,
                            betas=(0.9, 0.95), moments_dtype=moments_dtype)

    def loss_fn(p, tok):
        from tempo_tpu.ops.losses import lm_cross_entropy

        logits = model.apply({"params": p}, tok[:, :-1])
        return lm_cross_entropy(logits, tok[:, 1:])

    @jax.jit
    def step(state, tok):
        p, opt = state
        loss, grads = jax.value_and_grad(loss_fn)(p, tok)
        updates, opt = tx.update(grads, opt, p)
        return (optax.apply_updates(p, updates), opt), loss

    dt, loss = _timed_steps(step, (params, tx.init(params)), tokens,
                            warmup=3, iters=iters)
    tokens_per_sec = batch_size * cfg.block_size / dt
    result = {
        "family": ("moe_gpt" if n_experts else "gpt")
        + (f"_{n_layer}L{n_head}H{n_embd}d" if n_embd != 768 else "")
        + ("_remat" if remat else "")
        + (f"_mu{moments_dtype}" if moments_dtype else ""),
        "n_params": n_params,
        "n_experts": n_experts,
        "batch": batch_size,
        "step_ms": round(1000 * dt, 2),
        "tokens_per_sec": round(tokens_per_sec, 1),
        "mfu": round(estimate_mfu(cfg, n_params, batch_size, dt), 4),
        "loss": round(loss, 4),
    }
    if n_experts:
        # top-1 routing only runs 1/E of the expert FLOPs: the honest MFU
        # counts active params (full-count MFU is the "paper" number)
        expert = sum(
            int(np.prod(l.shape))
            for path, l in jax.tree_util.tree_flatten_with_path(params)[0]
            if any(getattr(k, "key", None) == "moe" for k in path)
            and not any(getattr(k, "key", None) == "router" for k in path))
        active = n_params - expert * (n_experts - 1) // n_experts
        result["n_params_active"] = active
        result["mfu_active"] = round(
            estimate_mfu(cfg, active, batch_size, dt), 4)
    return result


def bench_diffusion(batch_size: int = 64, iters: int = 10,
                    compute_dtype: str = "bfloat16") -> dict:
    """VDM + CUNet train step on VAE-latent-shaped tiles (16x16x32) — the
    score-model config of the latent-diffusion runtime
    (cli/train_diffusion.py) minus the frozen-VAE encode."""
    import optax

    from tempo_tpu.models.diffusion import VDM
    from tempo_tpu.nn.unet import CUNet

    shape = (16, 16, 32)
    score = CUNet(shape=shape, chs=(64, 128, 256), t_conditioning=True,
                  norm_groups=8, compute_dtype=compute_dtype)
    model = VDM(score_model=score, noise_schedule="fixed_linear")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size,) + shape).astype(np.float32))

    init_fn = jax.jit(lambda k1, k2, xx: model.init(k1, xx, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     x[:2])["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    tx = optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=0.05)

    def loss_fn(p, xx, rng):
        loss, _ = model.apply({"params": p}, xx, rng=rng)
        return loss

    def one_step(state, xx):
        p, opt, rng, i = state
        step_rng = jax.random.fold_in(rng, i)
        loss, grads = jax.value_and_grad(loss_fn)(p, xx, step_rng)
        updates, opt = tx.update(grads, opt, p)
        return (optax.apply_updates(p, updates), opt, rng, i + 1), loss

    step = jax.jit(one_step)

    # this step is near the transport's 7-14 ms dispatch floor, so the
    # per-dispatch timing is contaminated; a scanned 20-step chain inside
    # ONE jit gives the on-device step time
    chain = 20

    @jax.jit
    def chained(state, xx):
        return jax.lax.scan(lambda s, _: one_step(s, xx), state,
                            None, length=chain)

    state = (params, tx.init(params), jax.random.PRNGKey(2),
             jnp.zeros((), jnp.int32))
    dt, loss = _timed_steps(step, state, x, warmup=3, iters=iters)

    state = (params, tx.init(params), jax.random.PRNGKey(2),
             jnp.zeros((), jnp.int32))
    for _ in range(2):
        state, losses = chained(state, x)
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = chained(state, x)
    float(losses[-1])
    dt_chained = (time.perf_counter() - t0) / chain

    return {
        "family": "vdm_diffusion",
        "n_params": n_params,
        "batch": batch_size,
        "latent_shape": list(shape),
        "step_ms": round(1000 * dt, 2),
        "step_ms_ondevice": round(1000 * dt_chained, 2),
        "latents_per_sec": round(batch_size / dt, 1),
        "latents_per_sec_ondevice": round(batch_size / dt_chained, 1),
        "loss": round(loss, 4),
    }


def bench_decode(batch_size: int = 8, new_tokens: int = 128,
                 iters: int = 5, compute_dtype: str = "bfloat16",
                 quantize: bool = False, n_kv_head: int = 0,
                 cache_len: int = 0, decode_attn: str = "xla") -> dict:
    """Autoregressive serving throughput: KV-cache scan decode on the
    GPT-2-small shape (the inference side of the GPT family). With
    quantize=True the block matmuls run from int8 weights (nn/quant.py);
    with n_kv_head < 12 the cache shrinks by the GQA group factor —
    decode is HBM-bound, so bytes-per-token is the metric both move."""
    import dataclasses

    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          generate, num_params)

    cfg = TransformerConfig(in_size=50304, block_size=1024, n_layer=12,
                            n_head=12, n_embd=768, n_kv_head=n_kv_head,
                            compute_dtype=compute_dtype)
    model = Transformer(cfg)
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.in_size, (batch_size, 64), dtype=np.int32))
    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), prompt[:1])
    if quantize:
        from tempo_tpu.nn.quant import quantize_lm_params

        model = Transformer(dataclasses.replace(cfg, quantize="int8"))
        params = jax.jit(quantize_lm_params)(params)

    # jit the WHOLE generate (prefill + scanned decode): eager prefill
    # would dispatch hundreds of ops at the relay's 7-14 ms round-trip
    # each and swamp the decode time being measured. The KV cache follows
    # the compute dtype — at batch 8 the streamed cache bytes rival the
    # weight bytes, so a f32 cache would mask the int8 weight win.
    if decode_attn != "xla":
        model = Transformer(dataclasses.replace(model.config,
                                                decode_attn=decode_attn))

    # params/prompt as jit ARGUMENTS, not closure constants: closed-over
    # arrays embed in the serialized program, and the relay's compile
    # endpoint caps the request body (HTTP 413 at the 1024-slot window)
    run = jax.jit(lambda p, tok, key: generate(
        model, p, tok, new_tokens, rng=key, temperature=1.0,
        cache_dtype=jnp.dtype(compute_dtype),
        cache_len=cache_len or None))

    out = run(params, prompt, jax.random.PRNGKey(1))
    int(np.asarray(out)[0, -1])  # sync
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(params, prompt, jax.random.PRNGKey(2 + i))
    int(np.asarray(out)[0, -1])
    dt = (time.perf_counter() - t0) / iters
    family = "gpt_decode_int8" if quantize else "gpt_decode"
    if n_kv_head:
        family += f"_gqa{n_kv_head}"
    if cache_len:
        # full serving-window cache: the config where the active-length
        # Pallas kernel (decode_attn='pallas') stops reading dead slots
        family += f"_window{cache_len}"
    if decode_attn != "xla":
        family += f"_{decode_attn}"
    return {
        "family": family,
        "n_params": num_params(params),
        "batch": batch_size,
        "prompt_len": 64,
        "new_tokens": new_tokens,
        "ms_per_token": round(1000 * dt / new_tokens, 3),
        "tokens_per_sec": round(batch_size * new_tokens / dt, 1),
    }


def bench_serve(batch_size: int = 8, new_tokens: int = 128,
                iters: int = 5, compute_dtype: str = "bfloat16") -> dict:
    """Cost of the continuous-batching machinery: one scanned decode chain
    with per-row positions (vmapped KV scatter + per-row mask + per-row
    RoPE/wpe gather — the decode_rows surface) vs the scalar-position
    chain. Same model, same cache, same token count; the ratio is the
    per-step price of slot-level scheduling (should be ~1.0: the scatter
    and gathers are tiny next to the cache stream)."""
    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          init_cache)

    cfg = TransformerConfig(in_size=50304, block_size=1024, n_layer=12,
                            n_head=12, n_embd=768,
                            compute_dtype=compute_dtype)
    model = Transformer(cfg)
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.in_size, (batch_size, 64), dtype=np.int32))
    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), prompt[:1])
    cache_len = 256

    def chain(vector_pos: bool):
        # params/prompt as jit arguments (closure constants would ship
        # inside the relay's size-capped compile request)
        def run(p, tok_prompt, tok0):
            cache = init_cache(cfg, batch_size, jnp.dtype(compute_dtype),
                               cache_len=cache_len)
            _, cache = model.apply({"params": p}, tok_prompt, cache=cache,
                                   input_pos=jnp.int32(0))
            p0 = tok_prompt.shape[1]
            pos0 = (jnp.full((batch_size,), p0, jnp.int32) if vector_pos
                    else jnp.int32(p0))

            def step(carry, _):
                tok, cache, pos = carry
                logits, cache = model.apply({"params": p}, tok[:, None],
                                            cache=cache, input_pos=pos)
                nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                                 axis=-1).astype(jnp.int32)
                return (nxt, cache, pos + 1), ()

            (tok, _, _), _ = jax.lax.scan(
                step, (tok0, cache, pos0), None, length=new_tokens)
            return tok

        fn = jax.jit(run)
        return lambda tok0: fn(params, prompt, tok0)

    out = {"family": "serve_decode_rows", "batch": batch_size,
           "new_tokens": new_tokens, "cache_len": cache_len}
    tok0 = prompt[:, -1]
    for name, vec in (("scalar_pos", False), ("row_pos", True)):
        run = chain(vec)
        int(np.asarray(run(tok0))[0])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            got = run(tok0)
        int(np.asarray(got)[0])
        dt = (time.perf_counter() - t0) / iters
        out[f"{name}_ms_per_token"] = round(1000 * dt / new_tokens, 3)
    out["row_pos_overhead"] = round(
        out["row_pos_ms_per_token"] / out["scalar_pos_ms_per_token"], 3)
    # both chains decode greedily from the same prefill: same tokens
    return out


def bench_paged(batch_size: int = 8, new_tokens: int = 128,
                window: int = 1024, page: int = 128, prompt_len: int = 64,
                iters: int = 5, compute_dtype: str = "bfloat16") -> dict:
    """Steady-state decode cost of the PAGED cache at a full serving
    window, three formulations on one scanned chain: dense cache +
    active-length Pallas kernel (the rung-4 baseline), paged cache +
    paged Pallas kernel (block-table indirection in the index maps —
    the claim is it matches dense-pallas: same live bytes DMAd), and
    paged cache on the XLA gather path (correctness formulation; gathers
    the whole logical window every step). Pages are pre-assigned
    (shuffled) so the chain measures decode, not allocation."""
    import dataclasses

    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          init_cache, init_paged_cache)

    cfg = TransformerConfig(in_size=50304, block_size=1024, n_layer=12,
                            n_head=12, n_embd=768,
                            compute_dtype=compute_dtype)
    mp = window // page
    n_pages = batch_size * mp + 1
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.in_size, (batch_size, prompt_len), dtype=np.int32))
    model0 = Transformer(cfg)
    init_fn = jax.jit(lambda k, t: model0.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), prompt[:1])
    # shuffled non-trash page assignment: the indirection is real
    table = jnp.asarray(
        1 + np.random.default_rng(1).permutation(n_pages - 1).reshape(
            batch_size, mp), jnp.int32)
    cdt = jnp.dtype(compute_dtype)

    def chain(paged: bool, decode_attn: str):
        model = Transformer(dataclasses.replace(cfg,
                                                decode_attn=decode_attn))

        def run(p, tok_prompt, tok0):
            if paged:
                cache = init_paged_cache(cfg, batch_size, n_pages, page,
                                         cdt, window=window)
                cache = tuple((pk, pv, table) for pk, pv, _ in cache)
            else:
                cache = init_cache(cfg, batch_size, cdt, cache_len=window)
            pos0 = jnp.zeros(batch_size, jnp.int32)
            _, cache = model.apply({"params": p}, tok_prompt, cache=cache,
                                   input_pos=pos0)

            def step(carry, _):
                tok, cache, pos = carry
                logits, cache = model.apply({"params": p}, tok[:, None],
                                            cache=cache, input_pos=pos)
                nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                                 axis=-1).astype(jnp.int32)
                return (nxt, cache, pos + 1), ()

            pos0 = jnp.full((batch_size,), prompt_len, jnp.int32)
            (tok, _, _), _ = jax.lax.scan(
                step, (tok0, cache, pos0), None, length=new_tokens)
            return tok

        fn = jax.jit(run)
        return lambda tok0: fn(params, prompt, tok0)

    out = {"family": "paged_decode", "batch": batch_size, "window": window,
           "page": page, "prompt_len": prompt_len,
           "new_tokens": new_tokens}
    tok0 = prompt[:, -1]
    variants = (("dense_pallas", False, "pallas"),
                ("paged_pallas", True, "pallas"),
                ("paged_xla", True, "xla"))
    outs = {}
    for name, paged, attn in variants:
        run = chain(paged, attn)
        outs[name] = np.asarray(run(tok0))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            got = run(tok0)
        int(np.asarray(got)[0])
        dt = (time.perf_counter() - t0) / iters
        out[f"{name}_ms_per_token"] = round(1000 * dt / new_tokens, 3)
    # all three decode the same greedy chain mathematically; exactness is
    # pinned on CPU (test_paged.py). Here different compilations can flip
    # bf16 argmax near-ties, so agreement is reported, not asserted.
    out["paged_pallas_matches_xla"] = bool(
        (outs["paged_pallas"] == outs["paged_xla"]).all())
    out["paged_matches_dense"] = bool(
        (outs["dense_pallas"] == outs["paged_pallas"]).all())
    return out


def bench_host_decode(batch_size: int = 8, new_tokens: int = 64,
                      chunk: int = 8, iters: int = 3,
                      compute_dtype: str = "bfloat16") -> dict:
    """The serving host loop the decode_k artifact attacks: per-token
    serving pays one dispatch round-trip AND one [b, vocab] logits fetch
    per token (the host runs the sampling policy); the fused K-token
    greedy chunk pays one dispatch + one [b, K] int32 fetch per K tokens.
    On this transport (7-14 ms round-trip, ~12-20 MB/s fetch) the
    per-token loop is dispatch/transfer-bound, which is exactly what
    multi-step scheduling amortizes — production hosts pay a smaller but
    real per-dispatch tax. Mirrors infer/export_lm.py's decode_step /
    decode_k contracts with live jitted functions (same compute graph the
    artifacts serialize)."""
    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          init_cache)

    cfg = TransformerConfig(in_size=50304, block_size=1024, n_layer=12,
                            n_head=12, n_embd=768,
                            compute_dtype=compute_dtype)
    model = Transformer(cfg)
    cache_len = 256
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.in_size, (batch_size, 64), dtype=np.int32))
    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), prompt[:1])
    cdt = jnp.dtype(compute_dtype)

    # params as jit ARGUMENTS (closure constants embed in the relay's
    # size-capped compile request)
    def prefill(p, toks):
        cache = init_cache(cfg, batch_size, cdt, cache_len=cache_len)
        return model.apply({"params": p}, toks, cache=cache,
                           input_pos=jnp.int32(0))

    def step(p, tok, cache, pos):
        return model.apply({"params": p}, tok, cache=cache, input_pos=pos)

    def decode_k(p, tok, cache, pos):
        def body(carry, _):
            t, c, q = carry
            logits, c = model.apply({"params": p}, t, cache=c, input_pos=q)
            nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                             axis=-1).astype(jnp.int32)[:, None]
            return (nxt, c, q + 1), nxt
        (_, cache, _), steps = jax.lax.scan(
            body, (tok, cache, pos), None, length=chunk)
        return jnp.swapaxes(steps[..., 0], 0, 1), cache

    prefill_j = jax.jit(prefill)
    step_j = jax.jit(step)
    dk_j = jax.jit(decode_k)
    assert new_tokens % chunk == 0, (new_tokens, chunk)

    def per_token():
        logits, cache = prefill_j(params, prompt)
        tok = np.argmax(np.asarray(logits[:, -1], np.float32), -1)
        out = [tok]
        pos = prompt.shape[1]
        for _ in range(new_tokens - 1):
            logits, cache = step_j(params,
                                   jnp.asarray(out[-1][:, None], jnp.int32),
                                   cache, jnp.int32(pos))
            # the host policy fetch: [b, vocab] logits cross to the host
            out.append(np.argmax(np.asarray(logits[:, -1], np.float32), -1))
            pos += 1
        return np.stack(out, 1)

    def fused():
        logits, cache = prefill_j(params, prompt)
        tok = np.argmax(np.asarray(logits[:, -1], np.float32), -1)
        out = [tok[:, None]]
        pos = prompt.shape[1]
        remaining = new_tokens - 1
        while remaining >= chunk:
            toks, cache = dk_j(params,
                               jnp.asarray(out[-1][:, -1:], jnp.int32),
                               cache, jnp.int32(pos))
            out.append(np.asarray(toks))  # [b, K] int32 — the only fetch
            pos += chunk
            remaining -= chunk
        for _ in range(remaining):
            logits, cache = step_j(params,
                                   jnp.asarray(out[-1][:, -1:], jnp.int32),
                                   cache, jnp.int32(pos))
            out.append(np.argmax(np.asarray(logits[:, -1], np.float32),
                                 -1)[:, None])
            pos += 1
        return np.concatenate(out, 1)

    a = per_token()
    b = fused()
    # the scanned chunk and the single-step program are different XLA
    # compilations: bf16 fusion differences can flip argmax on near-ties
    # (random-init logits are full of them), after which the greedy
    # chains legitimately diverge. Op-level equality is pinned exactly on
    # CPU (test_export.py); here we report the agreement prefix.
    m = min(a.shape[1], b.shape[1])
    agree = int(np.min(np.argmax(a[:, :m] != b[:, :m], axis=1)
                       + (a[:, :m] == b[:, :m]).all(axis=1) * m))
    out = {"family": "serve_host_loop", "batch": batch_size,
           "new_tokens": new_tokens, "chunk": chunk, "cache_len": cache_len,
           "greedy_agreement_prefix": agree}
    for name, fn in (("per_token", per_token), (f"decode_k{chunk}", fused)):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        out[f"{name}_ms_per_token"] = round(1000 * dt / new_tokens, 3)
    out["speedup"] = round(out["per_token_ms_per_token"]
                           / out[f"decode_k{chunk}_ms_per_token"], 2)
    return out


def bench_workload(n_requests: int = 64, n_slots: int = 8,
                   k_decode: int = 16, page: int = 128,
                   window: int = 1024, n_pages: int = 41,
                   iters: int = 2,
                   compute_dtype: str = "bfloat16") -> dict:
    """THE driver-grade serving headline: a mixed-length request
    workload (prompts 32-512, 64-128 new tokens) through the BEST
    serving stack — PagedLMServer with continuous admission, an
    oversubscribed page pool, fused k-token decode, chunked prefill,
    the paged active-length Pallas decode kernel — on a GPT-2-small
    scale model, measured end-to-end on the real chip (scheduler, page
    allocator, host loop, transport included).

    Runs on a LIVE function surface (export_lm.live_paged_surface):
    weights ride as jit arguments, so the relay compile requests stay
    small (baked-weight artifacts at this scale hit the transport's
    request cap; CLAUDE.md). Prompt lengths are multiples of the
    prefill chunk so the whole workload compiles a handful of shapes.

    Reports aggregate tokens/s and % of the HBM roofline: per decoded
    token the chip must stream weights/batch + the row's LIVE KV bytes
    (the paged Pallas kernel reads only live pages), so
    floor_tokens_per_s = BW / (W_bytes/b + avg_live_kv_bytes)."""
    from tempo_tpu.infer.export_lm import live_paged_surface
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          num_params)

    cfg = TransformerConfig(in_size=50304, block_size=window, n_layer=12,
                            n_head=12, n_embd=768,
                            compute_dtype=compute_dtype,
                            decode_attn="pallas")
    model = Transformer(cfg)
    rng = np.random.default_rng(0)
    seed_tok = jnp.asarray(rng.integers(0, cfg.in_size, (1, 8),
                                        dtype=np.int32))
    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), seed_tok)
    n_par = num_params(params)

    surface = live_paged_surface(params, cfg, max_seq=window,
                                 decode_chunk=k_decode, page_size=page)

    # mixed-length workload: prompt lengths cycle over multiples of 32
    # in [32, 512]; budgets cycle 64..128. A 128-token prefill chunk
    # balances peak score memory against per-chunk dispatch cost (the
    # relay's ~10-20 ms round-trip makes tiny chunks dispatch-bound)
    chunk = 128
    lengths = [32 + 32 * (i % 16) for i in range(n_requests)]
    budgets = [64 + (i * 17) % 65 for i in range(n_requests)]
    reqs = [{"tokens": rng.integers(0, cfg.in_size, (l,)).tolist(),
             "n_tokens": n}
            for l, n in zip(lengths, budgets)]

    out = {"family": "serve_workload", "n_requests": n_requests,
           "n_slots": n_slots, "k_decode": k_decode, "page": page,
           "window": window, "n_pages": n_pages,
           "prefill_chunk": chunk,
           "prompt_lens": f"{min(lengths)}-{max(lengths)}",
           "new_tokens": f"{min(budgets)}-{max(budgets)}",
           "n_params": n_par, "compute_dtype": compute_dtype}

    def run():
        srv = PagedLMServer(surface=surface, n_slots=n_slots,
                            n_pages=n_pages, k_decode=k_decode,
                            prefill_chunk=chunk)
        resp = srv.serve(reqs)
        return srv.last_stats, resp

    stats, resp = run()  # compile pass (a handful of shapes)
    best = None
    for _ in range(iters):
        stats, _ = run()
        if best is None or stats["tokens_per_sec"] > best["tokens_per_sec"]:
            best = stats
    out["preemptions"] = best["preemptions"]
    out["peak_pages"] = best["peak_pages"]
    out["decode_steps"] = best["decode_steps"]
    out["n_generated"] = best["n_generated"]
    out["seconds"] = best["seconds"]
    out["tokens_per_sec"] = best["tokens_per_sec"]

    # HBM roofline: per SCAN STEP inside the fused dispatch the weights
    # stream once and n_slots tokens emerge (k steps = k weight
    # streams), so weights amortize over n_slots; each token also reads
    # its row's live KV (the paged Pallas kernel DMAs only live pages)
    bw = 773e9  # v5e measured stream (tools/peak_probe.py, round 2)
    w_bytes = n_par * 2  # bf16 weight stream
    kvh, hd = cfg.kv_heads, cfg.head_dim
    kv_bytes_per_tok = 2 * cfg.n_layer * kvh * hd * 2  # k+v, bf16
    avg_live = float(np.mean([l + n / 2 for l, n in
                              zip(lengths, budgets)]))
    bytes_per_token = w_bytes / n_slots + avg_live * kv_bytes_per_tok
    out["roofline_tokens_per_sec"] = round(bw / bytes_per_token)
    out["pct_of_roofline"] = round(
        100 * out["tokens_per_sec"] / out["roofline_tokens_per_sec"], 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all",
                    choices=["gpt", "gpt-medium", "moe", "diffusion",
                             "decode", "serve",
                             "hostloop", "paged", "workload", "all"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8,
                    help="GPT/MoE batch size (diffusion fixed at 64)")
    args = ap.parse_args()

    results = []
    if args.family in ("gpt", "all"):
        results.append(bench_gpt(batch_size=args.batch, iters=args.iters))
        print(json.dumps(results[-1]), flush=True)
    if args.family == "gpt-medium":
        # the scale-MFU probe (DESIGN.md's 124M account claims MFU
        # rises with width/depth — measure, don't assert): 355M with
        # remat + bf16 first moment to fit activations/state in HBM
        results.append(bench_gpt(batch_size=args.batch, iters=args.iters,
                                 n_layer=24, n_head=16, n_embd=1024,
                                 remat=True, moments_dtype="bfloat16"))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("moe", "all"):
        results.append(bench_gpt(batch_size=args.batch, iters=args.iters,
                                 n_experts=4))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("diffusion", "all"):
        results.append(bench_diffusion(iters=args.iters))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("decode", "all"):
        results.append(bench_decode(iters=max(2, args.iters // 2)))
        print(json.dumps(results[-1]), flush=True)
        results.append(bench_decode(iters=max(2, args.iters // 2),
                                    quantize=True))
        print(json.dumps(results[-1]), flush=True)
        results.append(bench_decode(iters=max(2, args.iters // 2),
                                    n_kv_head=2))
        print(json.dumps(results[-1]), flush=True)
        # full 1024-slot serving window: XLA streams every slot each
        # step; the active-length kernel reads only the live prefix
        results.append(bench_decode(iters=max(2, args.iters // 2),
                                    cache_len=1024))
        print(json.dumps(results[-1]), flush=True)
        results.append(bench_decode(iters=max(2, args.iters // 2),
                                    cache_len=1024, decode_attn="pallas"))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("serve", "all"):
        results.append(bench_serve(iters=max(2, args.iters // 2)))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("hostloop", "all"):
        results.append(bench_host_decode(iters=max(2, args.iters // 3)))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("paged", "all"):
        results.append(bench_paged(iters=max(2, args.iters // 2)))
        print(json.dumps(results[-1]), flush=True)
    if args.family in ("workload", "all"):
        results.append(bench_workload(iters=max(2, args.iters // 3)))
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
