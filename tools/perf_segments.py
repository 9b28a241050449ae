#!/usr/bin/env python3
"""Per-segment step timing on the real chip: encode fwd, full loss fwd,
fwd+bwd (grads only), and the complete fused train step (fwd+bwd+clip+
AdamW+EMA). Differences localize where the step time goes, feeding the
roofline section in docs/DESIGN.md.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_segments.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, sync, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return 1000 * (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, vae_loss
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step, vae_loss_fn

    config = VAEConfig(compute_dtype=args.dtype)
    model = AutoencoderKL(config)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, 64, 64, 1028)).astype(np.float32))
    init_fn = jax.jit(lambda k1, k2, xx: model.init(k1, xx, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     x[:2])["params"]
    tx = make_optimizer()
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    loss_fn = vae_loss_fn(model)
    key = jax.random.PRNGKey(3)

    results = {}

    @jax.jit
    def encode_fwd(p, xx):
        return jnp.sum(model.apply({"params": p}, xx,
                                   method=AutoencoderKL.encode).mean)

    results["encode_fwd_ms"] = timed(lambda: encode_fwd(params, x),
                                     lambda o: float(o))

    @jax.jit
    def loss_fwd(p, xx, k):
        return loss_fn(p, xx, k)[0]

    results["loss_fwd_ms"] = timed(lambda: loss_fwd(params, x, key),
                                   lambda o: float(o))

    @jax.jit
    def fwd_bwd(p, xx, k):
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, xx, k)[0])(p)
        # fold grads into one scalar so one fetch syncs everything
        gsum = sum(jnp.sum(jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gsum

    results["fwd_bwd_ms"] = timed(lambda: fwd_bwd(params, x, key),
                                  lambda o: float(o))

    step = make_train_step(loss_fn, tx, donate=False)
    results["full_step_ms"] = timed(
        lambda: step(state, x), lambda o: float(o[1]["loss"]))

    results["batch"] = args.batch
    results["dtype"] = args.dtype
    results["patches_per_sec"] = round(
        1000 / results["full_step_ms"] * args.batch, 1)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
