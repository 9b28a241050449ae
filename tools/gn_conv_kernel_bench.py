#!/usr/bin/env python3
"""Measure the rung-2 fused GN+GELU+conv3x3 Pallas kernel against the XLA
chain at the flagship level-0 shape ([B, 64, 64, 512] -> 512, GroupNorm(8),
exact-erf GELU), forward only and fwd+bwd.

Methodology per CLAUDE.md: chained data-dependent iterations inside one jit
(single dispatch; defeats both the ~7-14 ms axon round-trip and XLA
constant folding), synced by a scalar fetch.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/gn_conv_kernel_bench.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.ops.pallas_gn_conv import _reference_chain, fused_gn_act_conv


def bench(fn, args, iters, label):
    chained = make_chained(fn, iters)
    out = chained(*args)  # compile + warm
    float(out)
    t0 = time.perf_counter()
    out = chained(*args)
    val = float(out)
    dt = time.perf_counter() - t0
    print(f"{label:28s} {1000 * dt / iters:8.3f} ms/iter  (chain value {val:.4f})")
    return dt / iters


def make_chained(fn, iters):
    @jax.jit
    def run(x, scale, bias, kern, cb):
        def body(carry, _):
            xx = carry
            y = fn(xx, scale, bias, kern, cb)
            # data-dependent feedback keeps every iteration live
            xx = xx + 0.001 * y.astype(xx.dtype)
            return xx, ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    b, h, w, c, f, groups = args.batch, 64, 64, 512, 512, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    kern = jnp.asarray((rng.standard_normal((3, 3, c, f)) * 0.01
                        ).astype(np.float32))
    cb = jnp.asarray(0.01 * rng.standard_normal(f).astype(np.float32))
    inputs = (x, scale, bias, kern, cb)

    def xla_chain(xx, ss, bb, kk, cc):
        return _reference_chain(xx, ss, bb, kk, cc, groups, 1e-6, "gelu")

    def pallas_chain(xx, ss, bb, kk, cc):
        return fused_gn_act_conv(xx, ss, bb, kk, cc, groups, 1e-6, "gelu")

    print(f"[B,H,W,C]->F = [{b},{h},{w},{c}]->{f}  "
          f"(conv MXU floor ~{2 * b * h * w * 9 * c * f / 197e12 * 1e3:.2f} ms)")
    bench(xla_chain, inputs, args.iters, "XLA GN+GELU+conv fwd")
    bench(pallas_chain, inputs, args.iters, "Pallas fused fwd")

    def make_grad(fn):
        def g(xx, ss, bb, kk, cc):
            def loss(ss2, kk2):
                return jnp.sum(fn(xx, ss2, bb, kk2, cc).astype(jnp.float32))

            gs, gk = jax.grad(loss, argnums=(0, 1))(ss, kk)
            # fold grads back into a y-like tensor so the chain stays live
            return fn(xx, ss + 0 * gs, bb, kk + 0.0 * gk, cc)

        return g

    bench(make_grad(xla_chain), inputs, args.iters, "XLA fwd+bwd")
    bench(make_grad(pallas_chain), inputs, args.iters, "Pallas fwd+bwd(remat)")
    bench_stack(layers=4, batch=args.batch)




def bench_stack(iters: int = 5, layers: int = 4, batch: int = 64):
    """Multi-layer residual context (like the level-0 encoder): here XLA can
    fuse each GN's stats into the PREVIOUS conv's epilogue — the fusion the
    custom call necessarily breaks. fwd+bwd through the stack."""
    b, h, w, c, groups = batch, 64, 64, 512, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    params = []
    for _ in range(layers):
        params.append((
            jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32)),
            jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32)),
            jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.01
                         ).astype(np.float32)),
            jnp.asarray(0.01 * rng.standard_normal(c).astype(np.float32)),
        ))

    def make(fn):
        @jax.jit
        def run(x, params):
            def loss(params):
                y = x
                for (ss, bb, kk, cc) in params:
                    y = y + fn(y, ss, bb, kk, cc).astype(y.dtype)
                return jnp.sum(y.astype(jnp.float32))

            l, grads = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(g[2].astype(jnp.float32) ** 2)
                           for g in grads)

        return run

    def xla_chain(xx, ss, bb, kk, cc):
        return _reference_chain(xx, ss, bb, kk, cc, groups, 1e-6, "gelu")

    def pallas_chain(xx, ss, bb, kk, cc):
        return fused_gn_act_conv(xx, ss, bb, kk, cc, groups, 1e-6, "gelu")

    for label, fn in (("XLA stack fwd+bwd", xla_chain),
                      ("Pallas stack fwd+bwd", pallas_chain)):
        run = make(fn)
        float(run(x, params))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x, params)
        val = float(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:28s} {1000 * dt:8.3f} ms/{layers}-layer stack "
              f"({1000 * dt / layers:.3f} ms/layer, value {val:.1f})")


if __name__ == "__main__":
    main()
