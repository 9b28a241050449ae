"""Tensor (model-axis) parallelism: channel-sharded parameters over a
2-D ('data', 'model') mesh.

The reference is single-GPU (SURVEY.md §2.4); data parallelism and spatial
(halo) sharding are this framework's scaling axes for the 27M-parameter
flagship. Tensor parallelism is the third axis, for model configurations
wider than one chip's HBM: every conv/dense kernel is sharded on its
OUTPUT-channel (last) axis, biases and normalization affines follow, and
XLA's SPMD partitioner propagates the activation shardings and inserts the
all-gathers/psums over ICI — no manual collectives, the same
annotate-and-jit recipe as the data-parallel path (parallel/mesh.py).

Sharding rule (`tp_sharding_rule`): a float leaf is sharded on its last
axis iff that axis divides evenly by the model-axis size; everything else
(scalars, RNG keys, metric vectors, ragged channel counts like the
1028-channel spectral boundary) stays replicated. The rule is applied
uniformly to params AND optimizer state (AdamW moments share the param
tree shapes), so optimizer memory scales down with the mesh too.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tempo_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def create_tp_mesh(n_model: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """('data', 'model') mesh: the model axis is the FAST (innermost) axis so
    tensor-parallel collectives ride neighboring ICI links; data parallelism
    spans the remaining factor."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_model != 0:
        raise ValueError(
            f"FATAL: {len(devices)} devices not divisible by "
            f"tensor_parallel={n_model}")
    grid = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_sharding_rule(leaf: Any, mesh: Mesh) -> NamedSharding:
    """Last-axis ('output channel') sharding when cleanly divisible;
    replicated otherwise. Only floating-point leaves are sharded — RNG keys
    and integer state must stay replicated."""
    n_model = mesh.shape[MODEL_AXIS]
    shape = getattr(leaf, "shape", ())
    dtype = getattr(leaf, "dtype", None)
    is_float = dtype is not None and jnp.issubdtype(dtype, jnp.floating)
    if (is_float and len(shape) >= 1 and shape[-1] >= n_model
            and shape[-1] % n_model == 0):
        spec = P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def shard_state_tp(state: Any, mesh: Mesh) -> Any:
    """Place a train state with channel-sharded params/optimizer moments.

    On a multi-process mesh every process holds the identical full host
    value (same seeds -> same init); the global channel-sharded array is
    assembled from each process's copy — a bare device_put cannot place
    onto non-addressable devices (mirrors parallel.mesh.shard_state)."""
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1
    if multiprocess:
        # each process contributes the slices its addressable devices
        # own; make_array_from_process_local_data would misread the
        # full replicated host value as this process's shard of a
        # cross-process-sharded channel dim (see shard_state_fsdp)
        def place(x):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, tp_sharding_rule(arr, mesh),
                lambda idx: arr[idx])
        return jax.tree_util.tree_map(place, state)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, tp_sharding_rule(x, mesh)), state)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    return shard_state_tp(params, mesh)
