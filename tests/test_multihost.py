"""Multi-host (DCN) data parallelism, exercised for real: two coordinated
processes (4 virtual CPU devices each) form one 8-device global mesh via
jax.distributed + gloo CPU collectives, run the actual Trainer loop with
per-host batch shards, and must agree on every loss and on the final
parameters (the gradient all-reduce crossed the process boundary) — the
distributed layer the reference never had (SURVEY.md SS2.4)."""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = Path(__file__).parent / "multihost_worker.py"
N_PROC = 2
DEVICES_PER_PROC = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    """Clean env: CPU platform with forced device count, axon bootstrap off
    the path (its sitecustomize would register a TPU backend)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}")
    return env


def test_two_process_dcn_training(tmp_path):
    port = _free_port()
    outdir = tmp_path / "run"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(N_PROC), str(port),
             str(outdir)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(N_PROC)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    results = {}
    for out in outputs:
        for line in out.splitlines():
            m = re.match(r"RESULT pid=(\d+) (.*)", line)
            if not m:
                continue
            pid = int(m.group(1))
            for kv in re.finditer(r"(\w+)=(\[[^\]]*\]|\S+)", m.group(2)):
                results.setdefault(pid, {})[kv.group(1)] = kv.group(2)

    assert set(results) == {0, 1}
    for pid in (0, 1):
        assert results[pid]["local"] == str(DEVICES_PER_PROC)
        assert results[pid]["global"] == str(N_PROC * DEVICES_PER_PROC)
    # every process observed the same (globally-reduced) loss trajectory
    assert results[0]["losses"] == results[1]["losses"]
    # parameters stayed replicated after cross-process gradient sync
    assert results[0]["leafsum"] == results[1]["leafsum"]

    # only process 0 wrote artifacts
    ckpts = sorted((outdir / "checkpoints").glob("ckpt_step=*.msgpack"))
    assert [c.name for c in ckpts] == ["ckpt_step=000002.msgpack",
                                       "ckpt_step=000004.msgpack"]
    assert (outdir / "metrics.json").exists()

    # pod-run recon figures: process 0 rendered from its LOCAL batch shard
    figures = sorted((outdir / "figures").glob("reconstructions_step_*.png"))
    assert [f.name for f in figures] == ["reconstructions_step_000002.png",
                                         "reconstructions_step_000004.png"]

    # the cooperative sharded checkpoint round-tripped on both processes
    shards = outdir / "checkpoints" / "ckpt_step=000004.shards"
    assert (shards / "index.json").exists()
    for pid in (0, 1):
        assert results[pid]["shardedmatch"] == "True"

    # process-partitioned input path: disjoint per-host file ownership,
    # identical (globally-reduced) losses over the assembled batches
    owned0 = set(results[0]["owned"].split(","))
    owned1 = set(results[1]["owned"].split(","))
    assert owned0 and owned1 and not owned0 & owned1
    assert len(owned0 | owned1) == 6
    assert results[0]["buflosses"] == results[1]["buflosses"]
