"""Device selection and memory observability.

TPU-native counterpart of the reference's GPU picker
(`src/mltools/utils/cuda_tools.py:7-37`, `src/train_utils.py:24-38`): where
the reference shells out to nvidia-smi to find the CUDA device with the most
free memory, here we read `Device.memory_stats()` from the JAX runtime and
pick the accelerator with the most free HBM. On backends that don't report
memory (CPU mesh in tests, some tunnels) every candidate ties and the first
device wins — same behavior as a fresh, empty chip.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax


def _free_bytes(device) -> Optional[int]:
    """Free HBM on `device`, or None when the backend doesn't report it."""
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit")
    used = stats.get("bytes_in_use")
    if limit is None or used is None:
        return None
    return int(limit) - int(used)


def device_memory_summary() -> List[Dict]:
    """One record per local device: id, platform, free/limit/in-use bytes
    (None where unreported). The observability surface behind
    `get_freer_device` — also useful in logs before a big run."""
    out = []
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            stats = {}
        out.append({
            "id": dev.id,
            "platform": dev.platform,
            "bytes_limit": stats.get("bytes_limit"),
            "bytes_in_use": stats.get("bytes_in_use"),
            "bytes_free": _free_bytes(dev),
        })
    return out


def get_freer_device(verbose: bool = False):
    """The local device with the most free memory.

    Accelerators (anything non-cpu) are preferred over host CPU devices when
    both are visible. Ties — including the everything-unreported case —
    resolve to the lowest device id, so single-chip and CPU-mesh behavior is
    deterministic.
    """
    devices = jax.local_devices()
    accel = [d for d in devices if d.platform != "cpu"]
    candidates = accel or devices
    best = max(candidates, key=lambda d: (_free_bytes(d) or 0, -d.id))
    if verbose:
        for rec in device_memory_summary():
            marker = " <- selected" if rec["id"] == best.id else ""
            print(f"device {rec['id']} [{rec['platform']}] "
                  f"free={rec['bytes_free']}{marker}")
    return best
