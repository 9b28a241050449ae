from tempo_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    make_place_fn,
    replicate_sharding,
    shard_state,
)

from tempo_tpu.parallel.expert import (
    create_ep_mesh,
    ep_sharding_rule,
    shard_params_ep,
)
from tempo_tpu.parallel.pipeline import (
    create_pp_mesh,
    make_pipelined_apply,
    make_pp_loss_fn,
    merge_pipeline_params,
    place_pipeline_params,
    split_pipeline_params,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicate_sharding",
    "make_place_fn",
    "shard_state",
    "create_pp_mesh",
    "split_pipeline_params",
    "merge_pipeline_params",
    "place_pipeline_params",
    "make_pipelined_apply",
    "make_pp_loss_fn",
    "create_ep_mesh",
    "ep_sharding_rule",
    "shard_params_ep",
]
