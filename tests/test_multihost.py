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

    # FSDP and dp x tp across the process boundary: both processes see
    # one loss trajectory (the parameter all-gathers / gradient
    # reduce-scatters crossed DCN)
    assert results[0]["fsdplosses"] == results[1]["fsdplosses"]
    assert results[0]["tplosses"] == results[1]["tplosses"]

    # topology pin: the SAME deterministic global batches through ONE
    # 8-device process must reproduce the 2-process losses (rounded),
    # for FSDP and for the dp x tp mesh — process boundaries change the
    # transport, not the math
    solo = subprocess.run(
        [sys.executable, str(WORKER), "0", "1", str(_free_port()),
         str(tmp_path / "solo")],
        env={**_worker_env(), "XLA_FLAGS":
             "--xla_force_host_platform_device_count="
             f"{N_PROC * DEVICES_PER_PROC}"},
        capture_output=True, text=True, timeout=420)
    assert solo.returncode == 0, f"solo worker failed:\n{solo.stdout}" \
                                 f"\n{solo.stderr}"
    solo_res = {}
    for line in solo.stdout.splitlines():
        m = re.match(r"RESULT pid=0 (.*)", line)
        if not m:
            continue
        for kv in re.finditer(r"(\w+)=(\[[^\]]*\]|\S+)", m.group(1)):
            solo_res[kv.group(1)] = kv.group(2)
    assert solo_res["fsdplosses"] == results[0]["fsdplosses"]
    assert solo_res["tplosses"] == results[0]["tplosses"]

    # round B: a FRESH 2-process topology restores round A's sharded
    # checkpoint and keeps training under FSDP — cross-run resume over
    # process boundaries
    port_b = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(N_PROC),
             str(port_b), str(outdir), "restore"],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(N_PROC)
    ]
    outputs_b = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs_b.append(out)
    res_b = {}
    for pid, (p, out) in enumerate(zip(procs, outputs_b)):
        assert p.returncode == 0, f"restore worker {pid} failed:\n{out}"
    for out in outputs_b:
        for line in out.splitlines():
            m = re.match(r"RESULT pid=(\d+) (.*)", line)
            if not m:
                continue
            for kv in re.finditer(r"(\w+)=(\[[^\]]*\]|\S+)", m.group(2)):
                res_b.setdefault(int(m.group(1)), {})[kv.group(1)] = \
                    kv.group(2)
    assert set(res_b) == {0, 1}
    # the fresh processes rehydrated exactly the params round A trained
    for pid in (0, 1):
        assert res_b[pid]["restoredsum"] == results[0]["leafsum"]
    # and agree on the continued FSDP trajectory
    assert res_b[0]["resumelosses"] == res_b[1]["resumelosses"]
