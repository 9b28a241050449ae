from tempo_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    make_place_fn,
    replicate_sharding,
    shard_state,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicate_sharding",
    "make_place_fn",
    "shard_state",
]
