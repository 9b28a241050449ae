#!/usr/bin/env python3
"""Capture a profiler trace of the flagship forward (and optionally the full
train step) on the real chip, then print the top ops by self time parsed
from the perfetto trace.json.gz jax.profiler writes.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fwd.py \
      [--batch 64] [--what loss_fwd|full_step] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def parse_trace(trace_dir: str, top: int) -> None:
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print(json.dumps({"error": "no trace.json.gz found", "dir": trace_dir}))
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep device-lane complete events; aggregate duration by op name
    by_name = collections.Counter()
    counts = collections.Counter()
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid_ok = not device_pids or e.get("pid") in device_pids
        if not pid_ok:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # microseconds
        by_name[name] += dur
        counts[name] += 1
    total = sum(by_name.values())
    print(json.dumps({"trace_file": paths[0], "n_events": len(events),
                      "total_us": total, "pids": pid_names}))
    for name, dur in by_name.most_common(top):
        print(f"{dur/1000:10.3f} ms  x{counts[name]:<4d}  {name[:140]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--what", default="loss_fwd",
                    choices=["loss_fwd", "full_step", "encode"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step, vae_loss_fn

    config = VAEConfig(compute_dtype="bfloat16")
    model = AutoencoderKL(config)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, 64, 64, 1028)).astype(np.float32))
    init_fn = jax.jit(lambda k1, k2, xx: model.init(k1, xx, rng=k2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                     x[:2])["params"]
    loss_fn = vae_loss_fn(model)
    key = jax.random.PRNGKey(3)

    if args.what == "loss_fwd":
        run = jax.jit(lambda p, xx, k: loss_fn(p, xx, k)[0])
        call = lambda: float(run(params, x, key))
    elif args.what == "encode":
        run = jax.jit(lambda p, xx: jnp.sum(model.apply(
            {"params": p}, xx, method=AutoencoderKL.encode).mean))
        call = lambda: float(run(params, x))
    else:
        tx = make_optimizer()
        state = create_train_state(params, tx, jax.random.PRNGKey(2))
        step = make_train_step(loss_fn, tx, donate=False)
        def call():
            s, m = step(state, x)
            return float(m["loss"])

    for _ in range(3):  # compile + warm
        call()

    trace_dir = tempfile.mkdtemp(prefix="tempo_prof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            call()
    parse_trace(trace_dir, args.top)
    if not args.keep:
        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"trace kept at {trace_dir}")


if __name__ == "__main__":
    main()
