"""Device-mesh parallelism utilities (SPMD over ICI/DCN)."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    host_shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "host_shard_batch",
]

# tensor (channel) parallelism lives in .tensor (imported lazily by callers
# to keep bare-mesh imports light); spatial sharding in .spatial
