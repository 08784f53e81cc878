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
    """Device-put every array in the batch with its leading axis sharded
    across the data mesh axis."""
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
