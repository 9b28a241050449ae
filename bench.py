#!/usr/bin/env python3
"""Benchmark: TEMPO VAE training + encode throughput on the local chip(s).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference PyTorch run trained 200k steps x batch 32 in ~41 h on
one GPU => ~43 patches/sec (BASELINE.md). vs_baseline is patches/sec/chip
relative to that.

Flags (each mode still prints exactly one JSON line):
  --batch N       per-chip batch size (default 64)
  --sweep A,B,C   measure several batch sizes; value = the best
  --l2            benchmark the L2-supervised multi-task train step instead
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATCHES_PER_SEC = 43.0


def _median_window(step_once, sync, iters: int, n_windows: int):
    """Robust timing: N independent windows of `iters` steps, each closed by
    a scalar-value sync (on the axon relay, block_until_ready can return
    before remote execution completes). Returns (median_dt_per_window,
    [all window dts]). A single contended window (host/relay interference —
    the round-3 BENCH capture regressed 20% on one bad window) then shifts
    one sample, not the round's official number."""
    dts = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_once()
        sync(out)
        dts.append(time.perf_counter() - t0)
    return float(np.median(dts)), dts


def bench_train(batch_size: int = 64, warmup: int = 3, iters: int = 10,
                compute_dtype: str = "bfloat16", pad_boundary: bool = True,
                remat: bool = False,
                input_dtype: str = "bfloat16") -> dict:
    """batch 64/chip measured fastest on v5e (285/293/303/304 patches/s at
    batch 16/32/64/128 round 1; 307 vs 291 at 64 vs 128 round 2 with the
    lane-split boundary convs)."""
    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.parallel.mesh import create_mesh, make_place_fn, shard_state
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step, vae_loss_fn

    n_chips = jax.device_count()
    config = VAEConfig(compute_dtype=compute_dtype,  # flagship 1028-ch model
                       pad_boundary=pad_boundary, remat=remat)
    model = AutoencoderKL(config)

    global_batch = batch_size * n_chips
    rng = np.random.default_rng(0)
    # bf16 batches: the production input path (device-resident buffer with
    # half-precision pools) feeds the step in the compute dtype, skipping
    # the 2.7 ms f32->bf16 convert/relayout the trace shows for f32 input
    # (measured 205.8 vs 207.1 ms; --input-dtype float32 reverts).
    x_host = rng.standard_normal(
        (global_batch, 64, 64, 1028)).astype(np.float32)
    x_host = x_host.astype(jnp.dtype(input_dtype))

    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     jnp.zeros((2, 64, 64, 1028), jnp.float32))["params"]
    tx = make_optimizer()

    mesh = create_mesh() if n_chips > 1 else None
    place = make_place_fn(mesh)
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    if mesh is not None:
        state = shard_state(state, mesh)
    batch = place(x_host)

    step = make_train_step(vae_loss_fn(model), tx)

    # Sync via a scalar fetch: on relayed transports (axon),
    # block_until_ready can return before remote execution finishes; a value
    # transfer is the only reliable barrier.
    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    holder = {"state": state, "metrics": metrics}

    def step_once():
        holder["state"], holder["metrics"] = step(holder["state"], batch)
        return holder["metrics"]

    dt, dts = _median_window(step_once, lambda m: float(m["loss"]),
                             iters, n_windows=5)
    loss = float(holder["metrics"]["loss"])

    patches_per_sec = global_batch * iters / dt
    return {
        "patches_per_sec": patches_per_sec,
        "patches_per_sec_per_chip": patches_per_sec / n_chips,
        "step_ms": 1000 * dt / iters,
        "window_step_ms": [round(1000 * d / iters, 2) for d in dts],
        "n_chips": n_chips,
        "global_batch": global_batch,
        "loss": loss,
    }


def bench_train_l2(batch_size: int = 64, warmup: int = 3, iters: int = 10,
                   compute_dtype: str = "bfloat16") -> dict:
    """Flagship VAE + L2 multi-task head on dict batches (spectral + 4
    products) — the fused L2-supervised step at full scale."""
    from tempo_tpu.models.vae import VAEConfig
    from tempo_tpu.models.vae_l2 import L2_PRODUCTS, VAEWithL2Head
    from tempo_tpu.parallel.mesh import create_mesh, make_place_fn, shard_state
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step

    n_chips = jax.device_count()
    config = VAEConfig(compute_dtype=compute_dtype)
    model = VAEWithL2Head(config)

    global_batch = batch_size * n_chips
    rng = np.random.default_rng(0)
    batch_host = {"spectral": rng.standard_normal(
        (global_batch, 64, 64, 1028)).astype(np.float32)}
    for p in L2_PRODUCTS:
        field = rng.standard_normal((global_batch, 64, 64)).astype(np.float32)
        field[rng.random(field.shape) < 0.1] = np.nan
        batch_host[p] = field
    sample = {k: v[:2] for k, v in batch_host.items()}

    init_fn = jax.jit(lambda k1, k2, b: model.init(
        k1, b, k2, method=VAEWithL2Head.compute_loss))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     sample)["params"]
    tx = make_optimizer()

    mesh = create_mesh() if n_chips > 1 else None
    place = make_place_fn(mesh)
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    if mesh is not None:
        state = shard_state(state, mesh)
    batch = place(batch_host)

    def loss_fn(p, b, rng):
        return model.apply({"params": p}, b, rng,
                           method=VAEWithL2Head.compute_loss)

    step = make_train_step(loss_fn, tx)
    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    holder = {"state": state, "metrics": metrics}

    def step_once():
        holder["state"], holder["metrics"] = step(holder["state"], batch)
        return holder["metrics"]

    dt, _ = _median_window(step_once, lambda m: float(m["loss"]),
                           iters, n_windows=3)
    loss = float(holder["metrics"]["loss"])

    patches_per_sec = global_batch * iters / dt
    return {
        "patches_per_sec": patches_per_sec,
        "patches_per_sec_per_chip": patches_per_sec / n_chips,
        "step_ms": 1000 * dt / iters,
        "n_chips": n_chips,
        "global_batch": global_batch,
        "loss": loss,
    }


def bench_encode(batch_size: int = 64, warmup: int = 2, iters: int = 10,
                 compute_dtype: str = "bfloat16") -> dict:
    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig

    config = VAEConfig(compute_dtype=compute_dtype)
    model = AutoencoderKL(config)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (batch_size, 64, 64, 1028)).astype(np.float32))
    init_fn = jax.jit(lambda k1, k2, xx: model.init(k1, xx, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     x[:2])["params"]

    @jax.jit
    def encode_sum(params, x):
        # scalar output => the host-side float() is a true execution barrier
        return jnp.sum(model.apply({"params": params}, x,
                                   method=AutoencoderKL.encode).mean)

    for _ in range(warmup):
        out = encode_sum(params, x)
    float(out)

    dt, _ = _median_window(lambda: encode_sum(params, x), float,
                           iters, n_windows=3)
    return {"encode_patches_per_sec": batch_size * iters / dt}


def _env_float(name: str, default: float) -> float:
    """Malformed env values must not crash before the JSON line can be
    emitted — fall back to the default."""
    import os

    try:
        return float(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _arm_watchdog(seconds: float, metric: str):
    """The driver contract is ONE JSON line no matter what. A dead device
    relay makes the first dispatch hang forever (no exception to catch),
    so a daemon timer emits the error line and hard-exits. Returns the
    timer so a successful run can cancel it (a post-result teardown wedge
    must not print a second, contradictory line)."""
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "patches/s/chip",
            "vs_baseline": 0.0,
            "error": f"watchdog: no result within {seconds:.0f}s "
                     "(device relay unresponsive?)",
        }), flush=True)
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sweep", type=str, default=None,
                    help="comma-separated batch sizes; value = best")
    ap.add_argument("--l2", action="store_true",
                    help="benchmark the L2-supervised multi-task step")
    ap.add_argument("--no-pad", action="store_true",
                    help="disable the lane-padded boundary convs (A/B)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder/decoder activations")
    ap.add_argument("--no-encode", action="store_true",
                    help="skip the encode benchmark (faster A/B runs)")
    ap.add_argument("--input-dtype", default="bfloat16",
                    choices=["bfloat16", "float16", "float32"],
                    help="host batch dtype (bfloat16 = device-buffer path)")
    ap.add_argument("--watchdog", type=float,
                    default=_env_float("TEMPO_BENCH_TIMEOUT_S", 2400),
                    help="emit the error JSON and exit if no result within "
                         "this many seconds (0 disables)")
    args = ap.parse_args()
    # single source of truth for the driver-facing metric name: the
    # watchdog, the error path and the success path must never desync
    metric = ("l2_train_patches_per_sec_per_chip" if args.l2
              else "train_patches_per_sec_per_chip")
    watchdog = None
    if args.watchdog > 0:
        watchdog = _arm_watchdog(args.watchdog, metric)
    try:
        _main(args, metric)
        if watchdog is not None:
            watchdog.cancel()  # result printed; never fire after success
    except Exception as exc:  # the driver expects exactly one JSON line
        if watchdog is not None:
            watchdog.cancel()
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "patches/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(exc).__name__}: {exc}",
        }))
        raise SystemExit(1)


def _main(args, metric):
    if args.l2:
        bench_fn = bench_train_l2
    else:
        import functools
        bench_fn = functools.partial(bench_train,
                                     pad_boundary=not args.no_pad,
                                     remat=args.remat,
                                     input_dtype=args.input_dtype)
    if args.sweep:
        sizes = [int(s) for s in args.sweep.split(",")]
        runs = {b: bench_fn(batch_size=b) for b in sizes}
        train = max(runs.values(),
                    key=lambda r: r["patches_per_sec_per_chip"])
        sweep_detail = {str(b): round(r["patches_per_sec_per_chip"], 2)
                        for b, r in runs.items()}
    else:
        train = bench_fn(batch_size=args.batch)
        sweep_detail = None

    value = train["patches_per_sec_per_chip"]
    result = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "patches/s/chip",
        "vs_baseline": round(value / BASELINE_PATCHES_PER_SEC, 3),
        "detail": {
            "step_ms": round(train["step_ms"], 2),
            "n_chips": train["n_chips"],
            "global_batch": train["global_batch"],
            "compute_dtype": "bfloat16",
        },
    }
    if "window_step_ms" in train:
        result["detail"]["window_step_ms"] = train["window_step_ms"]
    if sweep_detail:
        result["detail"]["batch_sweep"] = sweep_detail
    if not args.l2 and not args.no_encode:
        encode = bench_encode()
        result["detail"]["encode_patches_per_sec"] = round(
            encode["encode_patches_per_sec"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
