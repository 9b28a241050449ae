#!/usr/bin/env python3
"""Per-block forward timings on the real chip, each against its analytic
roofline floor (v5e: 197 TFLOP/s bf16, 819 GB/s HBM).

perf_segments.py showed the forward at ~50% MFU while the backward runs at
~87%; this tool isolates WHICH forward blocks are slow so the optimization
is aimed, not guessed.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_blocks.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def timed(fn, sync, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return 1000 * (time.perf_counter() - t0) / iters


def floor_ms(flops: float, bytes_: float) -> float:
    return max(1000 * flops / (PEAK_TFLOPS * 1e12),
               1000 * bytes_ / (PEAK_GBS * 1e9))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    B = args.batch

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.nn.blocks import AttnBlock, Conv, GroupNorm, ResNetBlock
    from tempo_tpu.ops.convs import dense, space_to_depth_2x

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def arr(shape, dtype=dt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    results = {}

    def bench(name, module, x, flops, bytes_, method=None):
        if method is None:
            fn_init = jax.jit(lambda k, xx: module.init(k, xx))
            params = fn_init(key, x)
            run = jax.jit(lambda p, xx: jnp.sum(
                module.apply(p, xx).astype(jnp.float32)))
        else:
            fn_init = jax.jit(lambda k, xx: module.init(k, xx, method=method))
            params = fn_init(key, x)
            run = jax.jit(lambda p, xx: jnp.sum(
                module.apply(p, xx, method=method).astype(jnp.float32)))
        ms = timed(lambda: run(params, x), lambda o: float(o))
        fl = floor_ms(flops, bytes_)
        results[name] = {
            "ms": round(ms, 2), "floor_ms": round(fl, 2),
            "frac_of_floor": round(fl / ms, 2),
            "tflops": round(flops / 1e12, 2),
        }
        print(json.dumps({name: results[name]}))

    # --- conv_in: [B,64,64,1028] fp32 -> bf16 conv3x3 -> 512
    x_in = arr((B, 64, 64, 1028), jnp.float32)
    conv_in = Conv(512, 3, dtype=dt)
    fl = 2 * 9 * 1028 * 512 * 64 * 64 * B
    by = (B * 64 * 64 * 1028 * (4 + 2)  # fp32 read + bf16 cast write
          + B * 64 * 64 * 512 * 2)
    bench("conv_in_1028_512@64", conv_in, x_in, fl, by)

    # --- plain 3x3 conv 512->512 @64
    x512 = arr((B, 64, 64, 512))
    conv512 = Conv(512, 3, dtype=dt)
    fl = 2 * 9 * 512 * 512 * 64 * 64 * B
    by = B * 64 * 64 * 512 * 2 * 2
    bench("conv3x3_512@64", conv512, x512, fl, by)

    # --- GroupNorm+GELU @ [B,64,64,512]
    gn = GroupNorm(8, 1e-6, True, act="gelu", dtype=dt)
    bench("gn_gelu_512@64", gn, x512, 0.0, B * 64 * 64 * 512 * 2 * 3)

    # --- full ResNetBlock 512->512 @64
    res = ResNetBlock(512, dtype=dt)
    fl = 2 * 2 * 9 * 512 * 512 * 64 * 64 * B
    by = B * 64 * 64 * 512 * 2 * 8
    bench("resblock_512@64", res, x512, fl, by)

    # --- downsample (s2d + matmul) 512->512, 64->32
    import flax.linen as nn

    class DownM(nn.Module):
        @nn.compact
        def __call__(self, x):
            k = self.param("k", nn.initializers.normal(), (4 * 512, 512))
            b = self.param("b", nn.initializers.zeros, (512,))
            h = space_to_depth_2x(x)
            return dense(h, k.astype(dt), b.astype(dt))

    fl = 2 * 2048 * 512 * 32 * 32 * B
    by = B * 64 * 64 * 512 * 2 * 2
    bench("down_s2d_matmul_512@64", DownM(), x512, fl, by)

    # --- resblock 256 @32 and 128 @16
    x256 = arr((B, 32, 32, 256))
    res256 = ResNetBlock(256, dtype=dt)
    fl = 2 * 2 * 9 * 256 * 256 * 32 * 32 * B + 2 * 256 * 256 * 32 * 32 * B
    bench("resblock_256@32", res256, x256, fl, B * 32 * 32 * 256 * 2 * 8)

    x128 = arr((B, 16, 16, 128))
    attn = AttnBlock(4, dtype=dt)
    bench("attn_128@16", attn, x128,
          4 * 2 * 128 * 128 * 256 * B + 2 * 2 * 128 * 256 * 256 * B,
          B * 16 * 16 * 128 * 2 * 10)

    # --- full encode / decode / loss
    config = VAEConfig(compute_dtype="bfloat16")
    model = AutoencoderKL(config)
    init_fn = jax.jit(lambda k1, k2, xx: model.init(k1, xx, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     jnp.zeros((2, 64, 64, 1028), jnp.float32))["params"]

    enc = jax.jit(lambda p, xx: jnp.sum(model.apply(
        {"params": p}, xx, method=AutoencoderKL.encode).mean.astype(jnp.float32)))
    ms = timed(lambda: enc(params, x_in), lambda o: float(o))
    results["encode_full"] = {"ms": round(ms, 2)}
    print(json.dumps({"encode_full": results["encode_full"]}))

    z = arr((B, 16, 16, 32))
    dec = jax.jit(lambda p, zz: jnp.sum(model.apply(
        {"params": p}, zz, method=AutoencoderKL.decode).astype(jnp.float32)))
    ms = timed(lambda: dec(params, z), lambda o: float(o))
    results["decode_full"] = {"ms": round(ms, 2)}
    print(json.dumps({"decode_full": results["decode_full"]}))

    print(json.dumps({"batch": B, "results": results}))


if __name__ == "__main__":
    main()
