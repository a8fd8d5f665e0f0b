from .mesh import (
    batch_sharding,
    create_mesh,
    initialize_distributed,
    is_main_process,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "is_main_process",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
