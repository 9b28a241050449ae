#!/usr/bin/env python3
"""Dump the optimized HLO of the flagship forward (as compiled for the real
chip) and summarize the named fusions the profiler flagged, so trace entries
like `fusion.3` can be attributed to model ops.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py \
      [--names fusion.3,fusion.7] [--out /tmp/loss_fwd_hlo.txt]
"""

from __future__ import annotations

import argparse
import re

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--names", default="")
    ap.add_argument("--out", default="/tmp/loss_fwd_hlo.txt")
    ap.add_argument("--what", default="loss_fwd", choices=["loss_fwd", "full_step"])
    args = ap.parse_args()

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.train.step import vae_loss_fn

    config = VAEConfig(compute_dtype="bfloat16")
    model = AutoencoderKL(config)
    x = jnp.zeros((2, 64, 64, 1028), jnp.float32)
    init_fn = jax.jit(lambda k1, k2, xx: model.init(k1, xx, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1), x)["params"]
    loss_fn = vae_loss_fn(model)
    key = jax.random.PRNGKey(3)

    xs = jax.ShapeDtypeStruct((args.batch, 64, 64, 1028), jnp.float32)
    if args.what == "full_step":
        from tempo_tpu.train.state import create_train_state, make_optimizer
        from tempo_tpu.train.step import init_ema, make_train_step

        tx = make_optimizer()
        state = create_train_state(params, tx, jax.random.PRNGKey(2))
        step = make_train_step(loss_fn, tx, donate=False)
        sa = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
        compiled = jax.jit(step).lower(sa, xs).compile()
    else:
        pa = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        fn = jax.jit(lambda p, xx, k: loss_fn(p, xx, k)[0])
        compiled = fn.lower(pa, xs, key).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} chars to {args.out}")

    if args.names:
        for name in args.names.split(","):
            name = name.strip()
            # find the fusion instruction line and its computation
            m = re.search(rf"%?{re.escape(name)} = .*", txt)
            if m:
                print(f"\n=== {name} ===")
                print(m.group(0)[:600])


if __name__ == "__main__":
    main()
