from .ring_attention import ring_self_attention
from .mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "ring_self_attention",
    "batch_sharding",
    "make_mesh",
    "param_sharding_rules",
    "replicated",
    "shard_batch",
    "shard_params",
]
