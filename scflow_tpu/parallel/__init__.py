from scflow_tpu.parallel.dist import (
    all_gather_object,
    maybe_initialize_distributed,
    merge_sharded_results,
)
from scflow_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "all_gather_object",
    "maybe_initialize_distributed",
    "merge_sharded_results",
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
]
