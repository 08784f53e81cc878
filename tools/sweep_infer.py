#!/usr/bin/env python
"""Inference throughput sweep over batch size / loop mode / dtype for the
exact bench.py graph. Env: SWEEP_BATCHES=64,96,128 SWEEP_DTYPE=bf16
SWEEP_UNROLL=0|1 SWEEP_SLIM=0|1 SWEEP_LOOKUP=pallas|xla
SWEEP_FUSE_GATES=0|1 (ConvGRU z/r gates in one conv dispatch)
SWEEP_CULL=0|1 (backface culling, the flagship bench default)
SWEEP_SCAN_UNROLL=N (lax.scan unroll factor when SWEEP_UNROLL=0)
SWEEP_ITERS=N (GRU iterations; sweep {1,2,4,8} for the recurrence's
marginal per-iteration cost = slope of ms vs iters)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (check_remote_backend_reachable,
                                       enable_compilation_cache)

check_remote_backend_reachable()

import jax
import jax.numpy as jnp

enable_compilation_cache()

from scflow_tpu.refiners import SCFlowRefiner
from scflow_tpu.refiners.system import RenderAssets, make_scflow_infer_fn
from scflow_tpu.render.meshbank import make_synthetic_bank


def run(batch, dtype, unroll):
    img, nclass = 256, 21
    iters = int(os.environ.get("SWEEP_ITERS", "8"))
    bank = make_synthetic_bank(nclass, kind="uvsphere", size=80.0)
    ra = RenderAssets.from_bank(bank)
    model = SCFlowRefiner(
        iters=iters, detach_depth_for_xy=True,
        gru_fuse_gates=os.environ.get("SWEEP_FUSE_GATES", "0") == "1",
        scan_unroll=int(os.environ.get("SWEEP_SCAN_UNROLL", "1")),
        dtype=jnp.bfloat16 if dtype == "bf16" else None,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                           in_channels=224, rotation_mode="ortho6d"),
    )
    rng = np.random.default_rng(0)
    real = jnp.asarray(
        rng.normal(size=(batch, img, img, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(np.tile(np.array(
        [[[572.4, 0, img / 2], [0, 573.5, img / 2], [0, 0, 1]]], np.float32),
        (batch, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), real, real, R, t,
                           jnp.zeros((batch, img, img)), K, labels)

    on_tpu = jax.default_backend() == "tpu"
    # SWEEP_SLIM=1: pose-only output surface (the reference's test-time
    # return, scflow_refiner.py:174-179) — the product slim path
    slim = os.environ.get("SWEEP_SLIM", "0") == "1"
    lookup = os.environ.get("SWEEP_LOOKUP",
                            "pallas" if on_tpu else "xla")
    infer = make_scflow_infer_fn(
        model, ra, image_size=(img, img),
        render_backend="pallas" if on_tpu else "xla",
        lookup_backend=lookup,
        render_cull_backfaces=os.environ.get("SWEEP_CULL", "0") == "1",
        unroll=unroll, slim=slim)
    bd = {"real_images": real, "ref_rotations": R, "ref_translations": t,
          "k": K, "labels": labels}
    out = infer(variables, bd)
    float(np.asarray(jax.device_get(out["rotations"])).sum())
    n = int(os.environ.get("SWEEP_ROUNDS", "20"))
    t0 = time.perf_counter()
    for _ in range(n):
        out = infer(variables, bd)
    float(np.asarray(jax.device_get(out["rotations"])).sum())
    dt = time.perf_counter() - t0
    su = os.environ.get("SWEEP_SCAN_UNROLL", "1")
    cull = os.environ.get("SWEEP_CULL", "0")
    print(f"batch={batch:4d} dtype={dtype} unroll={unroll} "
          f"scan_unroll={su} cull={cull} iters={iters}: "
          f"{batch * n / dt:7.1f} ref/s ({dt / n * 1e3:6.2f} ms)", flush=True)


if __name__ == "__main__":
    batches = [int(b) for b in
               os.environ.get("SWEEP_BATCHES", "96,128").split(",")]
    dtype = os.environ.get("SWEEP_DTYPE", "bf16")
    unroll = os.environ.get("SWEEP_UNROLL", "0") == "1"
    for b in batches:
        run(b, dtype, unroll)
