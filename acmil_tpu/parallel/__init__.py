from acmil_tpu.parallel.mesh import (
    make_mesh,
    bag_sharding,
    replicated,
    shard_bag,
    shard_params,
)

__all__ = [
    "make_mesh",
    "bag_sharding",
    "replicated",
    "shard_bag",
    "shard_params",
]
