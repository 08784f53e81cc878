#!/usr/bin/env python
"""Standalone corr-lookup kernel bench at the EXACT flagship shapes
(B = 64*32*32 rows, 4-level flat bf16 pyramid, radius 4) — fast iteration
on kernel variants without the 5-minute full-graph compile.

Env: LOOKUP_VARIANTS=tent,shift LOOKUP_BBS=256 LOOKUP_DTYPE=bf16|f32
LOOKUP_LEVELS=0,1,2,3 (subset of pyramid levels, e.g. "0" or "1,2,3" —
for measuring a split-call strategy's component costs)
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

from scflow_tpu.ops.pallas.corr_lookup import corr_lookup_pallas_flat

N, S, R = 64, 32, 4
B = N * S * S


def main():
    dt = jnp.bfloat16 if os.environ.get(
        "LOOKUP_DTYPE", "bf16") == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    levels = [int(x) for x in
              os.environ.get("LOOKUP_LEVELS", "0,1,2,3").split(",")]
    sizes = [S >> l for l in levels]
    pyr = [jnp.asarray(rng.normal(size=(B, s * s)).astype(np.float32),
                       dtype=dt) for s in sizes]
    coords = jnp.asarray(
        rng.uniform(-4, S + 4, size=(B, 2)).astype(np.float32))

    variants = os.environ.get("LOOKUP_VARIANTS", "tent,shift").split(",")
    bbs = [int(x) for x in os.environ.get("LOOKUP_BBS", "256").split(",")]
    for variant in variants:
        for bb in bbs:
            fn = jax.jit(lambda p, c, v=variant, b=bb:
                         corr_lookup_pallas_flat(p, c, radius=R, bb=b,
                                                 variant=v))
            out = fn(pyr, coords)
            float(np.asarray(jax.device_get(out)).sum())
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(pyr, coords)
            float(np.asarray(jax.device_get(out[:1, :1])))
            dtms = (time.perf_counter() - t0) / n * 1e3
            print(f"variant={variant:6s} bb={bb:4d} dtype={dt.__name__}: "
                  f"{dtms:6.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
