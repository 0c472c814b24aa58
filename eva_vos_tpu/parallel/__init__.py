from .mesh import (make_mesh, data_sharding, replicated_sharding,
                   shard_batch, init_distributed, host_shard_range)
from .sharded_attention import (sharded_memory_readout, comm_model_bytes,
                                collective_bytes_from_hlo)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "init_distributed",
    "host_shard_range",
    "sharded_memory_readout",
    "comm_model_bytes",
    "collective_bytes_from_hlo",
]
