#!/usr/bin/env python3
"""Empirically measure the chip's attainable peaks: bf16 matmul TFLOP/s, HBM
stream bandwidth, reduction bandwidth — and the transport's per-dispatch
latency, which contaminates naive micro-benchmarks on the axon tunnel.

Every probe chains K copies of the op inside ONE jitted call so per-dispatch
latency and output-fetch traffic amortize away; the per-op time is the slope
between K1 and K2 chain lengths (intercept = dispatch+fixed overhead).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/peak_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, warmup=2, iters=5):
    for _ in range(warmup):
        out = fn()
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out)
    return 1000 * (time.perf_counter() - t0) / iters


def chained_ms(make_chain, k1=2, k2=8):
    """Per-op ms from the slope between chain lengths k1 and k2."""
    f1, f2 = make_chain(k1), make_chain(k2)
    t1, t2 = timed(f1), timed(f2)
    return (t2 - t1) / (k2 - k1), t1 - k1 * (t2 - t1) / (k2 - k1)


def main() -> None:
    rng = np.random.default_rng(0)
    results = {}

    # --- dispatch latency: tiny op, chained
    s = jnp.float32(1.5)

    def make_tiny(k):
        @jax.jit
        def f(v):
            for _ in range(k):
                v = v * 1.0000001
            return v
        f(s)  # compile
        return lambda: f(s)

    t1 = timed(make_tiny(1))
    results["dispatch_ms"] = round(t1, 2)

    # --- bf16 matmul peak: chain of 4096^2 matmuls (A @ B_i alternating to
    # avoid trivial CSE), scalar readout
    n = 4096
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def make_mm(k):
        @jax.jit
        def f(aa, bb):
            v = aa
            for _ in range(k):
                v = jnp.dot(v, bb,
                            preferred_element_type=jnp.bfloat16)
                v = v * jnp.bfloat16(1e-3)  # keep values bounded
            return jnp.sum(v[:8, :8].astype(jnp.float32))
        f(a, b)
        return lambda: f(a, b)

    ms, icpt = chained_ms(make_mm, 2, 8)
    results["matmul_bf16_tflops"] = round(2 * n**3 / (ms / 1000) / 1e12, 1)
    results["matmul_chain_intercept_ms"] = round(icpt, 2)

    # --- HBM stream: chain of elementwise scales on 512 MiB bf16
    m = 256 * 1024 * 1024
    x = jnp.zeros((m,), jnp.bfloat16)

    def make_stream(k):
        @jax.jit
        def f(xx):
            v = xx
            for _ in range(k):
                # data-dependent scale: XLA cannot fold the chain into one
                # multiply (a constant-scale chain gets constant-folded and
                # measures nothing)
                v = v * (jnp.bfloat16(1.0) + jnp.bfloat16(1e-8) * v[0])
            return jnp.sum(v[:8].astype(jnp.float32))
        f(x)
        return lambda: f(x)

    ms, _ = chained_ms(make_stream, 2, 8)
    gib = m * 2 / 2**30
    results["stream_gbs"] = round(2 * gib * 2**30 / (ms / 1000) / 1e9, 0)

    # --- reduction bandwidth: full sum of 512 MiB bf16, chained via
    # data-dependent reseed so chains don't collapse
    def make_red(k):
        @jax.jit
        def f(xx):
            acc = jnp.float32(0)
            v = xx
            for _ in range(k):
                acc = acc + jnp.sum(v, dtype=jnp.float32)
                # nonlinear coupling: a linear update lets the algebraic
                # simplifier distribute the next sum over the chain
                v = jnp.abs(v - jnp.bfloat16(1e-9) * acc.astype(jnp.bfloat16))
            return acc
        f(x)
        return lambda: f(x)

    # each chain step = read (sum) + read+write (update): 3x gib traffic
    ms, _ = chained_ms(make_red, 1, 4)
    results["reduce_rw_gbs"] = round(3 * gib * 2**30 / (ms / 1000) / 1e9, 0)

    # --- GN-shaped stats at the hot shape, chained
    xg = jnp.asarray(rng.standard_normal((64, 64, 64, 512)
                                         ).astype(np.float32)).astype(jnp.bfloat16)

    def make_stats(k):
        @jax.jit
        def f(xx):
            acc = jnp.float32(0)
            v = xx
            for _ in range(k):
                x32 = v.astype(jnp.float32)
                s1 = jnp.sum(x32, axis=(1, 2))
                s2 = jnp.sum(jnp.square(x32), axis=(1, 2))
                acc = acc + jnp.sum(s1) + jnp.sum(s2)
                v = jnp.abs(v - jnp.bfloat16(1e-9) * acc.astype(jnp.bfloat16))
            return acc
        f(xg)
        return lambda: f(xg)

    ms, _ = chained_ms(make_stats, 1, 4)
    nbytes = xg.size * 2 * 3  # stats read + update read+write
    results["gn_stats_rw_gbs"] = round(nbytes / (ms / 1000) / 1e9, 0)
    results["gn_stats_ms_incl_update"] = round(ms, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
