from acmil_tpu.parallel.mesh import (
    bag_sharding,
    init_distributed,
    make_mesh,
    make_pod_mesh,
    replicated,
    shard_bag,
    shard_params,
)
from acmil_tpu.parallel.tp import (
    make_tp_mesh,
    shard_vit_params_tp,
    tp_encoder_feature_fn,
)

__all__ = [
    "bag_sharding",
    "init_distributed",
    "make_mesh",
    "make_pod_mesh",
    "make_tp_mesh",
    "replicated",
    "shard_bag",
    "shard_params",
    "shard_vit_params_tp",
    "tp_encoder_feature_fn",
]
