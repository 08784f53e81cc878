"""Multi-process CPU worker for tests/test_multiprocess.py.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>

Each worker gets 4 virtual CPU devices, bootstraps jax.distributed through
the SAME env-gated path the CLIs use (scflow_tpu.parallel.dist), runs the
full sharded training step on its block of the global batch, and exercises
the cross-process eval-result gather.  Prints machine-readable MP_* lines
for the parent test to assert on.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
# the env-gated bootstrap contract (what a pod launcher would set)
os.environ["SCFLOW_DIST"] = "1"
os.environ["SCFLOW_COORDINATOR"] = f"localhost:{port}"
os.environ["SCFLOW_NUM_PROCESSES"] = str(num_procs)
os.environ["SCFLOW_PROCESS_ID"] = str(proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from scflow_tpu.utils.platform import enable_compilation_cache
from scflow_tpu.parallel import (
    all_gather_object,
    maybe_initialize_distributed,
    merge_sharded_results,
)

enable_compilation_cache()
assert maybe_initialize_distributed("none"), "SCFLOW_DIST gate did not fire"
assert jax.process_count() == num_procs, jax.process_count()
assert jax.process_index() == proc_id
assert len(jax.devices()) == 4 * num_procs, jax.devices()

# --- cross-process object gather with UNEQUAL list lengths ----------------
local_results = [
    {"img": f"im_{proc_id}_{i}", "v": proc_id * 100 + i}
    for i in range(3 + proc_id)  # lengths differ per process on purpose
]
per_proc = all_gather_object(local_results)
assert len(per_proc) == num_procs
assert [len(p) for p in per_proc] == [3 + p for p in range(num_procs)]
merged = merge_sharded_results(per_proc)
assert merged[0]["img"] == "im_0_0" and merged[1]["img"] == "im_1_0"
assert len(merged) == sum(3 + p for p in range(num_procs))
print(f"MP_GATHER_OK {len(merged)}", flush=True)

# --- batch assembly exactness: each addressable shard of the global array
# --- must hold exactly its global-index slice of the host batch ------------
import numpy as np

from scflow_tpu.parallel import make_mesh, shard_batch

host_global = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
mesh = make_mesh()
blk = 8 // num_procs
local = {"x": host_global[proc_id * blk : (proc_id + 1) * blk]}
with mesh:
    sharded = shard_batch(local, mesh)
for shard in sharded["x"].addressable_shards:
    np.testing.assert_array_equal(
        np.asarray(shard.data), host_global[shard.index]
    )
print("MP_SHARD_OK", flush=True)

# warm up the 8-device gloo context NOW, while both processes are in
# lockstep (synced by the allgather above).  Gloo context init has a 30 s
# key-exchange timeout; the big train-step compile below can diverge by
# minutes across processes (shared compilation cache: one hits, one
# misses), which would blow that window on the step's first collective.
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

with mesh:
    warm = jax.jit(lambda a: jnp.sum(a),
                   out_shardings=NamedSharding(mesh, P()))(sharded["x"])
    assert float(warm) == float(host_global.sum())
print("MP_WARM_OK", flush=True)

# --- full sharded training step over the 2x4-device global mesh -----------
import __graft_entry__ as g

g._dryrun_multichip_body(4 * num_procs)
print("MP_OK", flush=True)
