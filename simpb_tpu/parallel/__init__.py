from .mesh import (  # noqa: F401
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
    shard_batch,
)
