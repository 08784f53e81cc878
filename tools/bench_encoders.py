#!/usr/bin/env python
"""Isolate the context-encoder per-image cost anomaly: the BN context
encoder measures ~57% more per image than the IN feature encoder on the
flagship profile (0.154 vs 0.098 ms/img) despite inference-mode BN being
an affine while IN computes statistics.  Time BOTH encoders at BOTH batch
sizes to separate batch-efficiency from norm-type effects.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (check_remote_backend_reachable,
                                       enable_compilation_cache)

check_remote_backend_reachable()

import jax
import jax.numpy as jnp
import numpy as np

enable_compilation_cache()

from scflow_tpu.models.raft_encoder import RAFTEncoder

IMG = 256


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32)))))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32)))))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    for norm in ("IN", "BN"):
        enc = RAFTEncoder(in_channels=3, out_channels=256, net_type="Basic",
                          norm=norm, dtype=jnp.bfloat16)
        x0 = jnp.asarray(
            rng.normal(size=(128, IMG, IMG, 3)).astype(np.float32) * 0.2)
        variables = enc.init(jax.random.PRNGKey(0), x0[:2])

        @jax.jit
        def run(v, x):
            return enc.apply(v, x, train=False)

        for batch in (64, 128):
            dt = timeit(run, variables, x0[:batch])
            print(f"norm={norm} batch={batch:4d}: {dt * 1e3:7.2f} ms "
                  f"({dt / batch * 1e6:6.1f} us/img)", flush=True)


if __name__ == "__main__":
    main()
