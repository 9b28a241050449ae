#!/usr/bin/env python3
"""Roofline / speed-of-light analysis for the flagship train step.

Pulls FLOP and memory-traffic counts from XLA's own cost analysis of the
compiled fused train step (fwd + bwd + clip + AdamW), then combines them
with a measured step time into MFU and roofline numbers against the chip's
peak. Run on CPU (the cost model is shape-based, not backend-based):

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
      python tools/roofline.py [--batch 64] [--step-ms 211]

v5e peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
Attainable matmul rate measured on this chip via a chained-matmul probe
(tools/peak_probe.py, amortizing the axon transport's ~14 ms dispatch
latency): 173 TFLOP/s — "attainable" rows use that.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0
MEASURED_ATTAINABLE_TFLOPS = 173.0  # tools/peak_probe.py on this chip


def analyze(batch_size: int, compute_dtype: str = "bfloat16") -> dict:
    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step, vae_loss_fn

    config = VAEConfig(compute_dtype=compute_dtype)
    model = AutoencoderKL(config)
    x0 = jnp.zeros((2, 64, 64, 1028), jnp.float32)
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1), x0)["params"]
    tx = make_optimizer()
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    from tempo_tpu.train.step import init_ema

    state = init_ema(state, ["loss", "nll_loss", "kl_loss", "pixel_mse",
                             "grad_norm"])

    step = make_train_step(vae_loss_fn(model), tx, donate=False)
    batch = jax.ShapeDtypeStruct((batch_size, 64, 64, 1028), jnp.float32)
    abstract_state = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
    compiled = jax.jit(step).lower(abstract_state, batch).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per executable
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "batch": batch_size,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured step time on the TPU (from bench.py)")
    args = ap.parse_args()

    a = analyze(args.batch)
    tflop_per_step = a["flops"] / 1e12
    gb_per_step = a["bytes_accessed"] / 1e9
    out = {
        "batch": a["batch"],
        "tflop_per_step": round(tflop_per_step, 2),
        "tflop_per_patch": round(tflop_per_step / a["batch"], 4),
        "hbm_gb_per_step": round(gb_per_step, 2),
        "arithmetic_intensity_flop_per_byte": round(
            a["flops"] / max(a["bytes_accessed"], 1.0), 1),
        "compute_bound_floor_ms": round(
            1000 * tflop_per_step / V5E_PEAK_BF16_TFLOPS, 1),
        "memory_bound_floor_ms": round(
            1000 * gb_per_step / V5E_PEAK_HBM_GBS, 1),
        "attainable_compute_floor_ms": round(
            1000 * tflop_per_step / MEASURED_ATTAINABLE_TFLOPS, 1),
    }
    if args.step_ms:
        out["measured_step_ms"] = args.step_ms
        out["mfu"] = round(tflop_per_step / (args.step_ms / 1000)
                           / V5E_PEAK_BF16_TFLOPS, 3)
        floor = max(out["compute_bound_floor_ms"],
                    out["memory_bound_floor_ms"])
        out["fraction_of_roofline"] = round(floor / args.step_ms, 3)
        out["fraction_of_attainable"] = round(
            out["attainable_compute_floor_ms"] / args.step_ms, 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
