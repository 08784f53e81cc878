#!/usr/bin/env python
"""Train-step throughput benchmark for the flagship SCFlow config.

Measures ms/step of the full jitted train step (on-device render -> forward
-> 3-term sequence loss -> backward -> AdamW update) on the same synthetic
workload as bench.py (batch 16, 256², 8 iterations, 2048-face meshes), plus:

- a forward+loss-only timing (the step minus backward/optimizer),
- FLOPs from XLA cost analysis and the resulting MFU estimate
  (v5e peak 197 TFLOP/s -- the MXU runs one bf16 pass per fp32 matmul at
  default conv precision, so the same peak applies to both dtypes here),
- optional fp32-vs-bf16 comparison (--dtype bf16: bf16 compute with fp32
  flax params = fp32 master weights; bf16 shares fp32's exponent range so
  no loss scaling is needed).

Usage:
    python tools/bench_train.py [--dtype fp32|bf16] [--scan] [--batch N]
        [--rounds N] [--profile DIR]

Reference timing surface: the reference trains with torch DDP
(train.py:100-138); it publishes no step times (BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (apply_env_platform,
                                       check_remote_backend_reachable,
                                       enable_compilation_cache)

check_remote_backend_reachable()
apply_env_platform()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one pass per default-precision conv


def host_sync(tree):
    """Force a host fetch (block_until_ready is unreliable on axon)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--scan", action="store_true",
                    help="lax.scan recurrence instead of the unrolled loop")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler trace of 2 steps into DIR")
    ap.add_argument("--no-cull", action="store_true",
                    help="disable backface culling (shipped configs cull)")
    ap.add_argument("--skip-fwd", action="store_true",
                    help="skip the forward-only timing (one less compile)")
    args = ap.parse_args()

    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import (LossAssets, RenderAssets,
                                            make_scflow_train_step,
                                            scflow_sequence_losses)
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.runtime import TrainState, build_optimizer

    batch = args.batch
    img = 256
    iters = 8
    nclass = 21

    bank = make_synthetic_bank(nclass, kind="uvsphere", size=80.0)
    render_assets = RenderAssets.from_bank(bank)
    loss_assets = LossAssets(
        points=jnp.asarray(bank.verts),
        valid=jnp.asarray(bank.vert_valid),
        sym=jnp.zeros((nclass,), bool),
        diameters=jnp.asarray(bank.diameters),
    )

    model = SCFlowRefiner(
        iters=iters,
        detach_depth_for_xy=True,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
        unroll=not args.scan,
        pose_head_cfg=dict(
            type="MultiClassPoseHead", num_class=nclass, in_channels=224,
            rotation_mode="ortho6d",
        ),
    )

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(size=(batch, img, img, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(np.tile(
        np.array([[[572.4, 0, img / 2], [0, 573.5, img / 2], [0, 0, 1]]],
                 np.float32), (batch, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    # small gt-pose offset so the losses and grads are non-degenerate
    ang = 0.05
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    gt_R = jnp.asarray(np.tile(Rz[None], (batch, 1, 1)))
    gt_t = t + jnp.asarray(np.array([[2.0, -1.0, 5.0]], np.float32))

    key = jax.random.PRNGKey(0)
    depth0 = jnp.zeros((batch, img, img))
    variables = model.init(key, real, real, R, t, depth0, K, labels)

    tx, _ = build_optimizer(
        dict(type="AdamW", lr=4e-4, betas=(0.9, 0.999), eps=1e-8,
             weight_decay=1e-4),
        None, grad_clip=10.0)
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats"))

    on_tpu = jax.default_backend() == "tpu"
    step = make_scflow_train_step(
        model, render_assets, loss_assets, image_size=(img, img),
        render_backend="pallas" if on_tpu else "xla",
        lookup_backend="xla",  # pallas VJP measured slower in training
        render_cull_backfaces=not args.no_cull,  # shipped configs cull
    )
    batch_dict = {
        "real_images": real,
        "ref_rotations": R,
        "ref_translations": t,
        "gt_rotations": gt_R,
        "gt_translations": gt_t,
        "k": K,
        "labels": labels,
        "gt_masks": jnp.ones((batch, img, img), jnp.float32),
    }

    result = {"dtype": args.dtype, "mode": "scan" if args.scan else "unroll",
              "batch": batch, "cull": not args.no_cull}

    # FLOPs of the compiled step (XLA cost analysis)
    try:
        compiled = step.lower(state, batch_dict).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        result["step_gflops"] = round(float(ca["flops"]) / 1e9, 1)
    except Exception as e:  # axon remote backends may not expose it
        result["step_gflops"] = None
        result["cost_analysis_error"] = f"{type(e).__name__}: {e}"

    # warmup / compile
    c0 = time.perf_counter()
    state, logs = step(state, batch_dict)
    host_sync(logs["loss"])
    result["compile_s"] = round(time.perf_counter() - c0, 1)
    for _ in range(2):
        state, logs = step(state, batch_dict)
    host_sync(logs["loss"])

    t0 = time.perf_counter()
    for _ in range(args.rounds):
        state, logs = step(state, batch_dict)
    host_sync(logs["loss"])
    ms = (time.perf_counter() - t0) / args.rounds * 1e3
    result["train_step_ms"] = round(ms, 1)
    result["samples_per_sec"] = round(batch / ms * 1e3, 1)
    if result["step_gflops"]:
        result["mfu_pct"] = round(
            result["step_gflops"] * 1e9 / (ms / 1e3) / V5E_PEAK_FLOPS * 100, 1)

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(2):
                state, logs = step(state, batch_dict)
            host_sync(logs["loss"])

    if not args.skip_fwd:
        # forward+loss only (what the backward/optimizer add on top)
        from scflow_tpu.geometry.flow import (filter_flow_by_mask,
                                              flow_from_pose_and_depth)
        from scflow_tpu.refiners.system import render_and_normalize

        @jax.jit
        def fwd(params, bstats, b):
            rimg, rdepth, rmask = render_and_normalize(
                render_assets, b["ref_rotations"], b["ref_translations"],
                b["k"], b["labels"], (img, img), (0.0, 0.0, 0.0),
                (255.0, 255.0, 255.0),
                backend="pallas" if on_tpu else "xla")
            gt_flow = flow_from_pose_and_depth(
                b["ref_rotations"], b["ref_translations"],
                b["gt_rotations"], b["gt_translations"], rdepth, b["k"],
                invalid_num=400.0)
            gt_flow = filter_flow_by_mask(gt_flow, b["gt_masks"], 400.0)
            variables = {"params": params}
            mutable = []
            if bstats is not None:
                variables["batch_stats"] = bstats
                mutable = ["batch_stats"]
            out, _ = model.apply(
                variables, rimg, b["real_images"], b["ref_rotations"],
                b["ref_translations"], rdepth, b["k"], b["labels"],
                train=True, lookup_backend="xla", mutable=mutable)
            loss, _ = scflow_sequence_losses(
                out, b["gt_rotations"], b["gt_translations"], gt_flow,
                rmask, b["labels"], loss_assets)
            return loss

        loss = fwd(state.params, state.batch_stats, batch_dict)
        host_sync(loss)
        t0 = time.perf_counter()
        for _ in range(args.rounds):
            loss = fwd(state.params, state.batch_stats, batch_dict)
        host_sync(loss)
        result["forward_loss_ms"] = round(
            (time.perf_counter() - t0) / args.rounds * 1e3, 1)
        result["backward_opt_ms"] = round(
            result["train_step_ms"] - result["forward_loss_ms"], 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
