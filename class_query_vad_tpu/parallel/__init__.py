from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    initialize_distributed,
    process_allgather,
    replicate,
    replicated,
    shard_batch,
    sync_hosts,
)
