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
    arrays), sharding the leading axis across the mesh."""
    if mesh is None:
        return jax.device_put
    sharding = batch_sharding(mesh, axis_name)

    def place(batch: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    return place


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train state (params/opt state) across the mesh."""
    repl = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Multi-host (DCN) data parallelism: initialize the JAX distributed
    runtime and return a mesh over ALL processes' devices. Each host feeds
    its own per-process batch shard (the loaders are already
    process-local); gradient sync rides ICI within a slice and DCN across
    hosts via the same jit-inserted collectives. On single-process setups
    (including TPU-pod auto-detection environments) arguments may be None.
    """
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process; nothing to coordinate
    return create_mesh()
