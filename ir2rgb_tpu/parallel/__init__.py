from . import multihost
from .mesh import (
    batch_sharding,
    data_parallel_mesh,
    dp_sp_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "multihost",
    "data_parallel_mesh",
    "dp_sp_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
]
