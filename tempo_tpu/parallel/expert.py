"""Expert (MoE-axis) parallelism: stacked expert weights sharded over an
('expert',) mesh axis.

The fifth scaling axis of the framework (with data, tensor, pipeline, and
spatial parallelism — the reference has none, SURVEY.md §2.4). Targets the
MoE transformer (nn/moe.py): total parameter count grows linearly with
n_experts while per-token FLOPs stay constant, so experts are the first
thing that stops fitting one chip.

Same annotate-and-jit recipe as the data/tensor axes: the [E, ...]
leading-axis expert weights get `P('expert')` shardings, everything else is
replicated, and XLA's SPMD partitioner turns the dispatch/combine einsums
of the GShard formulation into the all-to-all-shaped collectives over ICI.
No manual collectives, one compiled program. Test-pinned equal to the
unsharded model on the CPU test mesh (tests/test_moe.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_AXIS = "expert"


def create_ep_mesh(n_expert: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_expert, (
        f"need {n_expert} devices for the expert axis, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_expert]), (EXPERT_AXIS,))


def ep_sharding_rule(mesh: Mesh):
    """Path-keyed rule: leaves inside a 'moe' module whose leading axis
    divides by the expert-axis size are sharded on that axis (the stacked
    w1/b1/w2/b2); router weights and every non-MoE leaf stay replicated."""
    n_expert = mesh.shape[EXPERT_AXIS]
    rep = NamedSharding(mesh, P())
    staged = NamedSharding(mesh, P(EXPERT_AXIS))

    def rule(path, leaf) -> NamedSharding:
        names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        in_moe = any(isinstance(k, jax.tree_util.DictKey)
                     and k.key == "moe" for k in path)
        is_router = "router" in names
        if (in_moe and not is_router and hasattr(leaf, "shape")
                and leaf.ndim >= 1 and leaf.shape[0] % n_expert == 0):
            return staged
        return rep

    return rule


def shard_params_ep(params: Any, mesh: Mesh) -> Any:
    """Place a transformer param tree on the mesh with expert weights
    sharded; replicates everything else."""
    rule = ep_sharding_rule(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, rule(path, leaf)), params)
