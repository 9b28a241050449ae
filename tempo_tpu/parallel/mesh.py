"""Device mesh + sharding rules (the distributed layer the reference never
had — SURVEY.md SS2.4: single-GPU only; here DP rides ICI via jax.sharding).

Strategy for the TEMPO VAE (27M params, large activations):
- axis 'data': batch-dimension data parallelism. Params are replicated;
  inputs are sharded on their leading axis. Under jit, XLA partitions the
  fused train step and inserts the gradient all-reduce (psum) over ICI.
- Works identically on a real v5e slice and on the CPU host-platform
  device_count=8 test mesh.

The helpers return NamedShardings so callers can place data *before* the jit
call — compute-communication overlap comes free from the async dispatch.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis sharding for input batches."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_place_fn(mesh: Optional[Mesh], axis_name: str = DATA_AXIS):
    """Returns a host->device placement fn for batches (arrays or dicts of
    arrays), sharding the leading axis across the mesh.

    On a multi-process mesh each process passes its LOCAL batch shard (the
    loaders are process-local); the shards are assembled into one global
    array spanning the mesh, so the global batch is
    local_batch x process_count."""
    if mesh is None:
        return jax.device_put
    sharding = batch_sharding(mesh, axis_name)
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1

    if multiprocess:
        def place(batch: Any) -> Any:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), batch)
    else:
        def place(batch: Any) -> Any:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)

    return place


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train state (params/opt state) across the mesh.

    On a multi-process mesh every process holds the identical host value
    (same seeds -> same init), and the replicated global array is assembled
    from each process's local copy."""
    repl = replicate_sharding(mesh)
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1
    if multiprocess:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)), state)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)


def resolve_process_id(value) -> Optional[int]:
    """Config 'distributed.process_id': an int, None (runtime
    auto-detection), or 'auto' — read the per-process rank from the standard
    launcher environment variables."""
    if value != "auto":
        return value
    import os

    for var in ("JAX_PROCESS_ID", "SLURM_PROCID", "PMI_RANK", "RANK"):
        if var in os.environ:
            return int(os.environ[var])
    raise ValueError(
        "FATAL: distributed.process_id: auto, but none of JAX_PROCESS_ID / "
        "SLURM_PROCID / PMI_RANK / RANK is set")


def maybe_initialize_distributed(config: dict) -> Optional[Mesh]:
    """CLI hook: when the run config carries an enabled 'distributed'
    section, join the multi-host cluster and return the global mesh (must
    run before any other JAX backend use). Returns None otherwise.

    Config schema:
      distributed:
        enabled: true
        coordinator_address: host:port   # omit on auto-detecting platforms
        num_processes: N                 # omit on auto-detecting platforms
        process_id: auto                 # or an explicit int
    """
    dist_cfg = (config or {}).get("distributed", {})
    if not dist_cfg.get("enabled", False):
        return None
    return initialize_multihost(
        dist_cfg.get("coordinator_address"),
        dist_cfg.get("num_processes"),
        resolve_process_id(dist_cfg.get("process_id")))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Multi-host (DCN) data parallelism: initialize the JAX distributed
    runtime and return a mesh over ALL processes' devices. Every
    participating process must call this; gradient sync rides ICI within a
    slice and DCN across hosts via the same jit-inserted collectives.

    Arguments may be None on platforms where the runtime auto-detects the
    cluster (TPU pods, SLURM/GKE env vars); anywhere else pass them
    explicitly. Initialization failures PROPAGATE — a process that cannot
    join the cluster must not silently fall back to single-host training.
    For plain single-process use, call create_mesh() instead.
    """
    if not jax.distributed.is_initialized():
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    mesh = create_mesh()
    n_procs = len({d.process_index for d in mesh.devices.flat})
    if jax.process_count() != n_procs:
        raise RuntimeError(
            f"FATAL: mesh spans {n_procs} processes but the runtime has "
            f"{jax.process_count()} — a process failed to contribute devices")
    return mesh
