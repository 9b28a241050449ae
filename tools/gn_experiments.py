#!/usr/bin/env python3
"""Micro-experiments for forward ops measured far off their bandwidth floor
(tools/perf_blocks.py): GroupNorm(+GELU) and the space-to-depth downsample.
Times several algebraically-equivalent formulations on the real chip.

All tensors are passed as jit ARGUMENTS (closing over device arrays would
embed them as constants and blow the remote-compile body limit).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/gn_experiments.py
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
    x = jnp.asarray(rng.standard_normal((B, 64, 64, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    G, C = 8, 512
    n_per_group = 64 * 64 * C // G
    results = {}

    def gelu(v):
        return jax.nn.gelu(v, approximate=False)

    def report(name, fn, *arrs, ref=None):
        out_fn = jax.jit(fn)
        out0 = out_fn(*arrs)
        run_s = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        ms = timed(lambda: run_s(*arrs))
        err = None
        if ref is not None:
            err = float(jnp.max(jnp.abs(out0.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
        results[name] = {"ms": round(ms, 2), "max_err": err}
        print(json.dumps({name: results[name]}))
        return out0

    def finish(sum_g, sumsq_g, xf32, sc, bi):
        mean_g = sum_g / n_per_group
        var_g = jnp.maximum(sumsq_g / n_per_group - jnp.square(mean_g), 0.0)
        inv_g = lax.rsqrt(var_g + 1e-6)
        alpha = jnp.repeat(inv_g, C // G, axis=1) * sc[None, :]
        beta = -jnp.repeat(mean_g * inv_g, C // G, axis=1) * sc[None, :] \
            + bi[None, :]
        out = xf32 * alpha[:, None, None, :] + beta[:, None, None, :]
        return gelu(out).astype(jnp.bfloat16)

    # --- A: current implementation (explicit fp32 cast feeds both passes)
    def gn_a(xx, sc, bi):
        x32 = xx.astype(jnp.float32)
        sum_c = jnp.sum(x32, axis=(1, 2))
        sumsq_c = jnp.sum(jnp.square(x32), axis=(1, 2))
        sum_g = jnp.sum(sum_c.reshape(B, G, -1), axis=-1)
        sumsq_g = jnp.sum(sumsq_c.reshape(B, G, -1), axis=-1)
        return finish(sum_g, sumsq_g, x32, sc, bi)

    ref = report("gn_current_fp32cast", gn_a, x, scale, bias)

    # --- B: stats via MXU — ones-vector matmuls
    ones_hw = jnp.ones((64 * 64,), jnp.bfloat16)

    def gn_mxu(xx, sc, bi, ones):
        xf = xx.reshape(B, 64 * 64, C)
        sum_c = jnp.einsum("bsc,s->bc", xf, ones,
                           preferred_element_type=jnp.float32)
        sumsq_c = jnp.einsum("bsc,bsc->bc", xf, xf,
                             preferred_element_type=jnp.float32)
        sum_g = jnp.sum(sum_c.reshape(B, G, -1), axis=-1)
        sumsq_g = jnp.sum(sumsq_c.reshape(B, G, -1), axis=-1)
        return finish(sum_g, sumsq_g, xx.astype(jnp.float32), sc, bi)

    report("gn_mxu_stats", gn_mxu, x, scale, bias, ones_hw, ref=ref)

    # ================= space-to-depth =================
    w = jnp.asarray(rng.standard_normal((2048, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def s2d_a(xx, ww):
        h = xx.reshape(B, 32, 2, 32, 2, C).transpose(0, 1, 3, 2, 4, 5)
        h = h.reshape(B, 32, 32, 4 * C)
        return jnp.dot(h, ww, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    ref2 = report("s2d_current", s2d_a, x, w)

    def s2d_conv(xx, ww):
        return lax.conv_general_dilated(
            xx, ww.reshape(2, 2, C, 512), window_strides=(2, 2),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("s2d_as_k2s2_conv", s2d_conv, x, w, ref=ref2)

    def s2d_slices(xx, ww):
        out = None
        for di in range(2):
            for dj in range(2):
                sl = xx[:, di::2, dj::2, :]
                piece = jnp.dot(
                    sl, ww[(di * 2 + dj) * C:(di * 2 + dj + 1) * C],
                    preferred_element_type=jnp.float32)
                out = piece if out is None else out + piece
        return out.astype(jnp.bfloat16)

    report("s2d_4slices_matmul", s2d_slices, x, w, ref=ref2)

    # ================= depth-to-space (decoder upsample) ==============
    wd = jnp.asarray(rng.standard_normal((512, 2048)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    xs = jnp.asarray(rng.standard_normal((B, 32, 32, 512)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def d2s_a(xx, ww):
        h = jnp.dot(xx, ww, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        b, hh, wwd, c4 = h.shape
        c = c4 // 4
        h = h.reshape(b, hh, wwd, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(b, 2 * hh, 2 * wwd, c)

    ref3 = report("d2s_current", d2s_a, xs, wd)

    def d2s_convt(xx, ww):
        # ConvTranspose k2s2 == conv_general_dilated with lhs_dilation=2 and
        # (k-1, k-1) padding; kernel spatially flipped to match transpose
        # semantics.
        k = ww.reshape(512, 2, 2, 512).transpose(1, 2, 0, 3)  # HWIO
        k = jnp.flip(k, axis=(0, 1))
        return lax.conv_general_dilated(
            xx, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("d2s_as_convt", d2s_convt, xs, wd, ref=ref3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
