#!/usr/bin/env python3
"""Forward-pass fusion experiments on the real chip, driven by the profile
in tools/profile_fwd.py:

1. conv_out (512->1028 @64, the flagship's biggest conv) alone, vs fused
   with the L1+logvar loss reduction (XLA's default, profiled at ~57% MFU),
   vs separated by an optimization_barrier.
2. resblock conv 512->512 alone vs with the next GroupNorm's stats fused
   (XLA's default, ~70% MFU) vs barrier-separated.
3. The standalone residual+stats reduction, VPU reduce vs MXU ones-matmul.

All tensors are jit ARGUMENTS (constants would blow the remote-compile
body limit).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/fwd_experiments.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, warmup=3, iters=20):
    for _ in range(warmup):
        out = fn()
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out)
    return 1000 * (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.default_rng(0)

    h512 = jnp.asarray(rng.standard_normal(
        (B, 64, 64, 512)).astype(np.float32)).astype(jnp.bfloat16)
    x_fp32 = jnp.asarray(rng.standard_normal(
        (B, 64, 64, 1028)).astype(np.float32))
    k_out = jnp.asarray(rng.standard_normal(
        (3, 3, 512, 1028)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    b_out = jnp.zeros((1028,), jnp.bfloat16)
    k512 = jnp.asarray(rng.standard_normal(
        (3, 3, 512, 512)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal(
        (B, 64, 64, 512)).astype(np.float32)).astype(jnp.bfloat16)
    ones_hw = jnp.ones((64 * 64,), jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")
    results = {}

    def report(name, fn, *arrs):
        run = jax.jit(fn)
        ms = timed(lambda: run(*arrs))
        results[name] = round(ms, 2)
        print(json.dumps({name: results[name]}))

    def conv_out(h, k, b):
        return lax.conv_general_dilated(
            h, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + b

    def l1_loss(recon, xt):
        rec = jnp.sum(jnp.abs(recon.astype(jnp.float32) - xt))
        return rec / jnp.exp(6.0) / B + 6.0

    report("conv_out_alone", lambda h, k, b: jnp.sum(
        conv_out(h, k, b)[:, 0, 0, :].astype(jnp.float32)),
        h512, k_out, b_out)

    report("conv_out_loss_fused",
           lambda h, k, b, xt: l1_loss(conv_out(h, k, b), xt),
           h512, k_out, b_out, x_fp32)

    def barriered(h, k, b, xt):
        recon = lax.optimization_barrier(conv_out(h, k, b))
        return l1_loss(recon, xt)

    report("conv_out_loss_barrier", barriered, h512, k_out, b_out, x_fp32)

    # loss with the target pre-cast to bf16 (halves the loss pass read)
    x_bf16 = x_fp32.astype(jnp.bfloat16)

    def loss_bf16_target(h, k, b, xt):
        recon = conv_out(h, k, b)
        rec = jnp.sum(jnp.abs(recon - xt).astype(jnp.float32))
        return rec / jnp.exp(6.0) / B + 6.0

    report("conv_out_loss_bf16diff", loss_bf16_target,
           h512, k_out, b_out, x_bf16)

    def conv512(h, k):
        return lax.conv_general_dilated(
            h, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

    report("conv512_alone", lambda h, k: jnp.sum(
        conv512(h, k)[:, 0, 0, :].astype(jnp.float32)), h512, k512)

    def conv_stats(h, k):
        out = conv512(h, k)
        s = jnp.sum(out, axis=(1, 2), dtype=jnp.float32)
        ss = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(1, 2))
        return jnp.sum(s) + jnp.sum(ss) + jnp.sum(
            out[:, 0, 0, :].astype(jnp.float32))

    report("conv512_stats_fused", conv_stats, h512, k512)

    def conv_stats_barrier(h, k):
        out = lax.optimization_barrier(conv512(h, k))
        s = jnp.sum(out, axis=(1, 2), dtype=jnp.float32)
        ss = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(1, 2))
        return jnp.sum(s) + jnp.sum(ss) + jnp.sum(
            out[:, 0, 0, :].astype(jnp.float32))

    report("conv512_stats_barrier", conv_stats_barrier, h512, k512)

    def conv_stats_mxu(h, k, ones):
        out = conv512(h, k)
        y = out.reshape(B, 64 * 64, 512)
        s = jnp.einsum("bsc,s->bc", y, ones,
                       preferred_element_type=jnp.float32)
        ss = jnp.einsum("bsc,bsc->bc", y, y,
                        preferred_element_type=jnp.float32)
        return jnp.sum(s) + jnp.sum(ss) + jnp.sum(
            out[:, 0, 0, :].astype(jnp.float32))

    report("conv512_stats_mxu", conv_stats_mxu, h512, k512, ones_hw)

    def stats_vpu(h, x2_):
        y = h + x2_
        s = jnp.sum(y, axis=(1, 2), dtype=jnp.float32)
        ss = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2))
        return jnp.sum(s) + jnp.sum(ss)

    report("residual_stats_vpu", stats_vpu, h512, x2)

    def stats_mxu(h, x2_, ones):
        y = (h + x2_).reshape(B, 64 * 64, 512)
        s = jnp.einsum("bsc,s->bc", y, ones,
                       preferred_element_type=jnp.float32)
        ss = jnp.einsum("bsc,bsc->bc", y, y,
                        preferred_element_type=jnp.float32)
        return jnp.sum(s) + jnp.sum(ss)

    report("residual_stats_mxu", stats_mxu, h512, x2, ones_hw)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
