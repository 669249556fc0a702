from acmil_tpu.parallel.mesh import (
    bag_sharding,
    init_distributed,
    make_mesh,
    make_pod_mesh,
    replicated,
    shard_bag,
    shard_params,
)

__all__ = [
    "bag_sharding",
    "init_distributed",
    "make_mesh",
    "make_pod_mesh",
    "replicated",
    "shard_bag",
    "shard_params",
]
