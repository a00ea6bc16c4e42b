from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    make_mesh_for_batch,
    replicated,
    shard_batch,
)
