"""Multi-host process bootstrap + cross-process object gather.

Reference surface: mmcv `init_dist` from the launcher (train.py:96-99,
test.py:96-100) and the pickle-based eval result gathers
(tools/eval.py:142-215).  TPU-native: `jax.distributed.initialize()` wires
every host into one JAX runtime (the mesh then spans all chips), and the
object gather rides `process_allgather` on padded uint8 payloads.

Bootstrap is env-gated and defaults OFF on a single host:
  --launcher jax            explicit opt-in from the CLI, or
  SCFLOW_DIST=1             env opt-in (what a pod launcher sets).
Coordinator parameters come from SCFLOW_COORDINATOR / SCFLOW_NUM_PROCESSES /
SCFLOW_PROCESS_ID when present; with none set, jax.distributed.initialize()
falls back to its own auto-detection (TPU pod metadata).
"""

import os
import pickle
from typing import Any, List, Sequence

import numpy as np


def maybe_initialize_distributed(launcher: str = "none", logger=None) -> bool:
    """Initialize jax.distributed if requested; returns True if initialized.

    Must run before the first JAX computation (device enumeration happens at
    backend init).  Safe to call unconditionally: a plain single-host run
    (launcher='none', no SCFLOW_DIST) is a no-op.
    """
    gated = os.environ.get("SCFLOW_DIST", "").lower() in ("1", "true", "yes")
    if launcher in (None, "none") and not gated:
        return False
    import jax

    kwargs = {}
    coord = os.environ.get("SCFLOW_COORDINATOR")
    nproc = os.environ.get("SCFLOW_NUM_PROCESSES")
    pid = os.environ.get("SCFLOW_PROCESS_ID")
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc:
        kwargs["num_processes"] = int(nproc)
    if pid:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    if logger is not None:
        logger.info(
            f"jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}"
        )
    return True


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process; returns the
    per-process list (same on all processes).

    TPU-native replacement for the reference's collect_results_gpu
    (tools/eval.py:185-215): pickle -> uint8 payload, allgather sizes, pad
    to the max, allgather payloads, unpickle each row's prefix.
    """
    import jax
    from jax.experimental import multihost_utils

    pc = jax.process_count()
    if pc == 1:
        return [obj]
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    ).reshape(pc)
    m = int(sizes.max())
    padded = np.zeros(m, np.uint8)
    padded[: payload.size] = payload
    rows = np.asarray(multihost_utils.process_allgather(padded)).reshape(pc, m)
    return [
        pickle.loads(rows[p, : int(sizes[p])].tobytes()) for p in range(pc)
    ]


def merge_sharded_results(per_process: Sequence[List[Any]]) -> List[Any]:
    """Restore dataset order from per-process result lists produced by the
    order[process_index::process_count] index sharding: image k was handled
    by process k % pc at local position k // pc, so a round-robin interleave
    reconstructs 0..n-1 (reference collect_results_cpu merge,
    tools/eval.py:173-180)."""
    queues = [list(r) for r in per_process]
    merged: List[Any] = []
    while any(queues):
        for q in queues:
            if q:
                merged.append(q.pop(0))
    return merged
