#!/usr/bin/env python3
"""GN statistics formulations, timed on the real chip at the hot shape
[64,64,64,512] bf16. The stats reductions measure ~4-5 ms standalone where
streaming the tensor once should cost well under 1 ms at spec bandwidth —
this isolates whether the gap is codegen (fixable by formulation) or the
chip's attainable reduction bandwidth (then the step is at speed of light).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/gn_stats_experiments.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    B, H, W, C = 64, 64, 64, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    results = {}

    def report(name, fn, *arrs, ref=None):
        run = jax.jit(lambda *a: jnp.sum(fn(*a)[0]) + jnp.sum(fn(*a)[1]))
        ms = timed(lambda: run(*arrs))
        err = None
        if ref is not None:
            s1, s2 = jax.jit(fn)(*arrs)
            err = float(jnp.max(jnp.abs(s1 - ref[0])) +
                        jnp.max(jnp.abs(s2 - ref[1])))
        gbs = x.size * 2 / (ms / 1000) / 1e9
        results[name] = {"ms": round(ms, 2), "gbs": round(gbs, 0),
                         "max_err": err}
        print(json.dumps({name: results[name]}))

    # A: current — fused one-pass over spatial axes
    def stats_a(xx):
        x32 = xx.astype(jnp.float32)
        return (jnp.sum(x32, axis=(1, 2)),
                jnp.sum(jnp.square(x32), axis=(1, 2)))

    report("a_current_spatial", stats_a, x)
    ref = jax.jit(stats_a)(x)

    # B: two-stage — W then H
    def stats_b(xx):
        x32 = xx.astype(jnp.float32)
        s1 = jnp.sum(x32, axis=2)
        s2 = jnp.sum(jnp.square(x32), axis=2)
        return jnp.sum(s1, axis=1), jnp.sum(s2, axis=1)

    report("b_two_stage_wh", stats_b, x, ref=ref)

    # C: flatten spatial then single-axis reduce
    def stats_c(xx):
        x32 = xx.reshape(B, H * W, C).astype(jnp.float32)
        return jnp.sum(x32, axis=1), jnp.sum(jnp.square(x32), axis=1)

    report("c_flat_axis1", stats_c, x, ref=ref)

    # D: concat trick — one reduction over [B, S, 2C] of (x, x^2)
    def stats_d(xx):
        x32 = xx.astype(jnp.float32)
        both = jnp.concatenate([x32, jnp.square(x32)], axis=-1)
        s = jnp.sum(both, axis=(1, 2))
        return s[:, :C], s[:, C:]

    report("d_concat_2c", stats_d, x, ref=ref)

    # E: chunked batch via scan (smaller live working set per reduction)
    def stats_e(xx):
        def body(_, xb):
            x32 = xb.astype(jnp.float32)
            return None, (jnp.sum(x32, axis=(0, 1)),
                          jnp.sum(jnp.square(x32), axis=(0, 1)))
        _, (s1, s2) = jax.lax.scan(body, None, xx)
        return s1, s2

    report("e_scan_per_sample", stats_e, x, ref=ref)

    # F: dot with ones over flattened spatial for the plain sum (MXU),
    #    elementwise-squared dot for sumsq
    ones = jnp.ones((H * W,), jnp.float32)

    def stats_f(xx, oo):
        xf = xx.reshape(B, H * W, C)
        x32 = xf.astype(jnp.float32)
        s1 = jnp.einsum("bsc,s->bc", x32, oo)
        s2 = jnp.einsum("bsc,bsc->bc", x32, x32)
        return s1, s2

    report("f_einsum", stats_f, x, ones, ref=ref)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
