#!/usr/bin/env python3
"""Capture a profiler trace of the GPT train step (the tools/bench_toolkit.py
`gpt` config) on the real chip and print the top device ops by self time —
the attribution backing the transformer perf notes in docs/DESIGN.md.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gpt.py \
      [--batch 8] [--top 40] [--seq 1024] [--remat]
"""

from __future__ import annotations

import argparse
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from profile_fwd import parse_trace


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--medium", action="store_true",
                    help="GPT-2-medium (24L/16H/1024d) with remat + "
                         "bf16 first moment — the scale-MFU probe")
    args = ap.parse_args()

    import optax

    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          make_gpt_optimizer)

    if args.medium:
        cfg = TransformerConfig(in_size=50304, block_size=args.seq,
                                n_layer=24, n_head=16, n_embd=1024,
                                rope=False, compute_dtype="bfloat16",
                                remat=True)
    else:
        cfg = TransformerConfig(in_size=50304, block_size=args.seq,
                                n_layer=12,
                                n_head=12, n_embd=768, rope=False,
                                compute_dtype="bfloat16")
    model = Transformer(cfg)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.in_size, (args.batch, args.seq + 1), dtype=np.int32))

    init_fn = jax.jit(lambda k, t: model.init(k, t)["params"])
    params = init_fn(jax.random.PRNGKey(0), tokens[:1, :-1])
    tx = make_gpt_optimizer(params, weight_decay=0.1, learning_rate=3e-4,
                            betas=(0.9, 0.95),
                            moments_dtype=("bfloat16" if args.medium
                                           else None))

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

    state = (params, tx.init(params))
    for _ in range(3):
        state, loss = step(state, tokens)
    float(loss)

    trace_dir = tempfile.mkdtemp(prefix="tempo_prof_gpt_")
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            state, loss = step(state, tokens)
        float(loss)
    parse_trace(trace_dir, args.top)
    if not args.keep:
        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"trace kept at {trace_dir}")


if __name__ == "__main__":
    main()
