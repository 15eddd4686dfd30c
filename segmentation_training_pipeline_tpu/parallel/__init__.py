from .mesh import (
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
