from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch
from .sharded_attention import sharded_memory_readout

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "sharded_memory_readout",
]
