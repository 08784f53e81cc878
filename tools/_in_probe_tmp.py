import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from scflow_tpu.models.raft_encoder import RAFTEncoder

def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
# doubled batch as in the real joint pass
x = jnp.asarray(rng.normal(size=(32, 256, 256, 3)).astype(np.float32))

for norm in ["IN", None, "BN"]:
    enc = RAFTEncoder(norm=norm)
    v = enc.init(key, x[:2])
    f = jax.jit(lambda v, x: enc.apply(v, x))
    print(f"norm={norm}: {timeit(f, v, x)*1e3:8.2f} ms")
