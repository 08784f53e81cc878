"""Data-parallel device mesh + sharding helpers.

This supersedes the reference's entire torch.distributed stack (SURVEY.md
§2.2): DDP gradient all-reduce, DistributedSampler and `reduce_mean` all
become implicit once the batch is sharded over a `jax.sharding.Mesh` data
axis and parameters are replicated — XLA inserts the ICI collectives.
Multi-host eval gathers use `process_allgather` (see runtime/eval).
"""

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard along the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Shard every array in the batch along its leading axis across the data
    mesh axis.

    Single-process: a plain device_put.  Multi-process: each process holds
    only ITS slice of the global batch (the DataLoader shards indices per
    host), so the global array is assembled from per-process local data —
    the TPU-native equivalent of torch's DistributedSampler + DDP input
    split (SURVEY.md §2.2).
    """
    if jax.process_count() > 1:
        sh = batch_sharding(mesh, axis_name)
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
