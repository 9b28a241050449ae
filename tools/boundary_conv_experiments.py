#!/usr/bin/env python3
"""The 1028-channel boundary convs (encoder conv_in, decoder conv_out) and
their gradients are the five hottest ops in the flagship train step
(~73 ms of 206 ms, trace-attributed). 1028 = 8*128 + 4 forces XLA's conv
emitter onto narrow output-channel windows. This tool times each direction
in isolation under three strategies:

  raw    — conv on the ragged shape as-is
  split  — lane-aligned 1024 conv + 4-channel tail (ops/convs.py)
  pad    — zero-pad the ragged axis to 1152 (9*128), slice after

  PYTHONPATH=/root/repo:/root/.axon_site python tools/boundary_conv_experiments.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")
PAD = [(1, 1), (1, 1)]


def timed(fn, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn()
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out)
    return 1000 * (time.perf_counter() - t0) / iters


def conv(x, k):
    return lax.conv_general_dilated(x, k, (1, 1), PAD, dimension_numbers=DN)


def main() -> None:
    B = 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           ).astype(jnp.bfloat16)

    x_in = arr(B, 64, 64, 1028)        # conv_in input
    w_in = arr(3, 3, 1028, 512)
    x_mid = arr(B, 64, 64, 512)        # conv_out input
    w_out = arr(3, 3, 512, 1028)
    dy_out = arr(B, 64, 64, 1028)      # cotangent at conv_out output
    dy_mid = arr(B, 64, 64, 512)       # cotangent at conv_in output

    results = {}

    def report(name, fn, *arrs):
        run = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        ms = timed(lambda: run(*arrs))
        results[name] = round(ms, 2)
        print(json.dumps({name: results[name]}))

    # ---------- forward ----------
    report("in_fwd_raw", conv, x_in, w_in)

    def in_fwd_split(x, k):
        return conv(x[..., :1024], k[:, :, :1024]) + conv(x[..., 1024:],
                                                          k[:, :, 1024:])

    report("in_fwd_split", in_fwd_split, x_in, w_in)

    def in_fwd_pad(x, k):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 124)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 124), (0, 0)))
        return conv(xp, kp)

    report("in_fwd_pad", in_fwd_pad, x_in, w_in)

    report("out_fwd_raw", conv, x_mid, w_out)

    def out_fwd_split(x, k):
        return jnp.concatenate([conv(x, k[..., :1024]),
                                conv(x, k[..., 1024:])], axis=-1)

    report("out_fwd_split", out_fwd_split, x_mid, w_out)

    def out_fwd_pad(x, k):
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 124)))
        return conv(x, kp)[..., :1028]

    report("out_fwd_pad", out_fwd_pad, x_mid, w_out)

    # ---------- weight gradients (d/dk of sum(conv * dy)) ----------
    def wgrad(fwd, x, k, dy):
        return jax.grad(lambda kk: jnp.sum((fwd(x, kk) * dy
                                            ).astype(jnp.float32)))(k)

    report("in_wgrad_raw", lambda x, k, dy: wgrad(conv, x, k, dy),
           x_in, w_in, dy_mid)
    report("in_wgrad_split", lambda x, k, dy: wgrad(in_fwd_split, x, k, dy),
           x_in, w_in, dy_mid)
    report("in_wgrad_pad", lambda x, k, dy: wgrad(in_fwd_pad, x, k, dy),
           x_in, w_in, dy_mid)

    report("out_wgrad_raw", lambda x, k, dy: wgrad(conv, x, k, dy),
           x_mid, w_out, dy_out)
    report("out_wgrad_split", lambda x, k, dy: wgrad(out_fwd_split, x, k, dy),
           x_mid, w_out, dy_out)
    report("out_wgrad_pad", lambda x, k, dy: wgrad(out_fwd_pad, x, k, dy),
           x_mid, w_out, dy_out)

    # ---------- input gradient of conv_out (the 1028->512 transposed conv) --
    def dgrad(fwd, x, k, dy):
        return jax.grad(lambda xx: jnp.sum((fwd(xx, k) * dy
                                            ).astype(jnp.float32)))(x)

    report("out_dgrad_raw", lambda x, k, dy: dgrad(conv, x, k, dy),
           x_mid, w_out, dy_out)
    report("out_dgrad_split", lambda x, k, dy: dgrad(out_fwd_split, x, k, dy),
           x_mid, w_out, dy_out)
    report("out_dgrad_pad", lambda x, k, dy: dgrad(out_fwd_pad, x, k, dy),
           x_mid, w_out, dy_out)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
