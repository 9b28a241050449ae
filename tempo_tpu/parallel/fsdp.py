"""Fully-sharded data parallelism (ZeRO-3 style) over the 'data' axis.

The reference is single-GPU with no distributed training (SURVEY.md §2.4).
Plain data parallelism (parallel/mesh.py) replicates parameters and AdamW
moments on every chip — at 3 float32 copies per parameter that is the
first thing to exceed HBM as models grow. FSDP is the TPU-idiomatic fix:
shard the TRAIN STATE itself over the same 'data' axis the batch is
sharded on. No wrapper classes, no manual gather/scatter (the
torch-FSDP/DeepSpeed machinery) — each leaf gets a NamedSharding that
splits its largest evenly-divisible dimension, and XLA's SPMD partitioner
turns the jitted train step into the ZeRO-3 schedule automatically:
parameters are all-gathered just-in-time for their op (fwd and again in
bwd), gradients leave as reduce-scatters instead of all-reduces, and the
AdamW update runs on the local 1/N shard of params + both moments.

Per-chip state memory drops ~Nx on a N-way mesh; the extra traffic vs
plain DP is one params-sized all-gather per direction, which rides ICI
and overlaps with compute (XLA schedules collectives async). Composes
with the framework's other axes by construction: the rule only touches
leaves' shardings, never their values — fsdp-sharded == replicated is
pinned exactly in tests/test_parallel.py.

Unlike tensor parallelism (parallel/tensor.py, which shards ACTIVATIONS
via last-axis output-channel splits and pays collectives per layer), FSDP
keeps every op's math local once gathered, so it is the default scaling
lever when the model fits one chip's HBM during compute but the
params+moments working set does not.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tempo_tpu.parallel.mesh import DATA_AXIS, create_mesh  # noqa: F401 (re-export)


def fsdp_sharding_rule(leaf: Any, mesh: Mesh,
                       axis: str = DATA_AXIS) -> NamedSharding:
    """Shard a float leaf's LARGEST evenly-divisible dimension over `axis`;
    replicate everything else (scalars, RNG keys, integer step counts,
    ragged dims). Largest-dim placement maximizes the bytes actually
    sharded — kernels split their fan-in/fan-out, embeddings their vocab
    row axis — while staying shape-agnostic across model families."""
    n = mesh.shape[axis]
    shape = getattr(leaf, "shape", ())
    dtype = getattr(leaf, "dtype", None)
    is_float = dtype is not None and jnp.issubdtype(dtype, jnp.floating)
    if is_float and len(shape) >= 1:
        cands = [i for i, s in enumerate(shape) if s >= n and s % n == 0]
        if cands:
            dim = max(cands, key=lambda i: shape[i])
            spec = [None] * len(shape)
            spec[dim] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_state_fsdp(state: Any, mesh: Mesh) -> Any:
    """Place a train state (params + AdamW moments + EMA) fully sharded.

    On a multi-process mesh every process holds the identical full host
    value (same seeds -> same init); each process contributes the SLICES
    its addressable devices own via make_array_from_callback — a bare
    device_put cannot place onto non-addressable devices, and
    make_array_from_process_local_data would treat the full value as
    this process's shard of a cross-process-sharded dim and DOUBLE it
    (caught by tests/test_multihost.py's FSDP phase)."""
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1
    if multiprocess:
        def place(x):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, fsdp_sharding_rule(arr, mesh),
                lambda idx: arr[idx])
        return jax.tree_util.tree_map(place, state)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_sharding_rule(x, mesh)), state)


def shard_params_fsdp(params: Any, mesh: Mesh) -> Any:
    return shard_state_fsdp(params, mesh)
