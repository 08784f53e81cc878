#!/usr/bin/env python
"""Schedule-level overlap experiment: two-step software-pipelined training.

Round-2 review question: the ~12-14% train MFU conclusion rests on
per-module timings only — would interleaving the (VPU/bandwidth-bound)
render of batch N+1 with the (MXU-bound) backward of batch N inside ONE
jitted step buy anything at the schedule level?

This tool measures exactly that, against tools/bench_train.py's workload
(synthetic batch, 256², 8 iters, 2048-face meshes):

  baseline step:  render(N) -> fwd/bwd(N) -> adamw          (the shipped step)
  pipelined step: fwd/bwd on the CARRIED render of batch N  } one jit,
                  render(N+1) -> new carry                  } independent
                                                              subgraphs

The pipelined variant gives XLA's scheduler two data-independent subgraphs
(the renderer does not read the params; the backward does not read batch
N+1), so any latency-hiding the TPU scheduler can do between VPU-heavy
raster tiles and MXU-heavy conv gradients is available to it.  Work per
step is identical (1 render + 1 fwd/bwd + 1 update); only the dependency
structure changes.  Semantics: trains on a one-step-stale render — fine
for a timing experiment, and the honest cost of this schedule if adopted.

Usage: python tools/bench_overlap.py [--dtype fp32|bf16] [--batch 16]
                                     [--rounds 10]
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


def host_sync(tree):
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--img", type=int, default=256,
                    help="image size (shrink for CPU smoke runs)")
    args = ap.parse_args()

    from scflow_tpu.geometry.flow import (filter_flow_by_mask,
                                          flow_from_pose_and_depth)
    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import (LossAssets, RenderAssets,
                                            make_scflow_train_step,
                                            optax_global_norm,
                                            render_and_normalize,
                                            scflow_sequence_losses)
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.runtime import TrainState, build_optimizer

    batch, img, iters, nclass = args.batch, args.img, 8, 21
    bank = make_synthetic_bank(nclass, kind="uvsphere", size=80.0)
    render_assets = RenderAssets.from_bank(bank)
    loss_assets = LossAssets(
        points=jnp.asarray(bank.verts), valid=jnp.asarray(bank.vert_valid),
        sym=jnp.zeros((nclass,), bool), diameters=jnp.asarray(bank.diameters))

    model = SCFlowRefiner(
        iters=iters, detach_depth_for_xy=True,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                           in_channels=224, rotation_mode="ortho6d"))

    rng = np.random.default_rng(0)
    real = jnp.asarray(
        rng.normal(size=(batch, img, img, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(np.tile(
        np.array([[[572.4, 0, img / 2], [0, 573.5, img / 2], [0, 0, 1]]],
                 np.float32), (batch, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    ang = 0.05
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    gt_R = jnp.asarray(np.tile(Rz[None], (batch, 1, 1)))
    gt_t = t + jnp.asarray(np.array([[2.0, -1.0, 5.0]], np.float32))

    key = jax.random.PRNGKey(0)
    variables = model.init(key, real, real, R, t,
                           jnp.zeros((batch, img, img)), K, labels)
    tx, _ = build_optimizer(
        dict(type="AdamW", lr=4e-4, betas=(0.9, 0.999), eps=1e-8,
             weight_decay=1e-4), None, grad_clip=10.0)

    on_tpu = jax.default_backend() == "tpu"
    rb = "pallas" if on_tpu else "xla"
    batch_dict = {
        "real_images": real, "ref_rotations": R, "ref_translations": t,
        "gt_rotations": gt_R, "gt_translations": gt_t, "k": K,
        "labels": labels, "gt_masks": jnp.ones((batch, img, img), jnp.float32),
    }
    result = {"dtype": args.dtype, "batch": batch}

    def fresh_state():
        # both steps donate their state; give each its own param buffers
        cp = lambda tr: jax.tree_util.tree_map(jnp.copy, tr)
        return TrainState.create(
            cp(variables["params"]), tx,
            None if variables.get("batch_stats") is None
            else cp(variables["batch_stats"]))

    # ---- baseline: the shipped step --------------------------------------
    state = fresh_state()
    step = make_scflow_train_step(
        model, render_assets, loss_assets, image_size=(img, img),
        render_backend=rb, lookup_backend="xla")
    state, logs = step(state, batch_dict)
    host_sync(logs["loss"])
    for _ in range(2):
        state, logs = step(state, batch_dict)
    host_sync(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        state, logs = step(state, batch_dict)
    host_sync(logs["loss"])
    result["baseline_step_ms"] = round(
        (time.perf_counter() - t0) / args.rounds * 1e3, 1)

    # ---- pipelined: fwd/bwd on carried render || render next -------------
    def render_stage(b):
        rimg, rdepth, rmask = render_and_normalize(
            render_assets, b["ref_rotations"], b["ref_translations"],
            b["k"], b["labels"], (img, img), (0.0, 0.0, 0.0),
            (255.0,) * 3, backend=rb)
        gt_flow = flow_from_pose_and_depth(
            b["ref_rotations"], b["ref_translations"], b["gt_rotations"],
            b["gt_translations"], rdepth, b["k"], invalid_num=400.0)
        gt_flow = filter_flow_by_mask(gt_flow, b["gt_masks"], 400.0)
        return dict(rimg=rimg, rdepth=rdepth, rmask=rmask, gt_flow=gt_flow)

    def pipelined(state, carry, b_cur, b_next):
        def loss_fn(params):
            vs = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                vs["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, updates = model.apply(
                vs, carry["rimg"], b_cur["real_images"],
                b_cur["ref_rotations"], b_cur["ref_translations"],
                carry["rdepth"], b_cur["k"], b_cur["labels"],
                train=True, lookup_backend="xla", mutable=mutable)
            loss, log_vars = scflow_sequence_losses(
                out, b_cur["gt_rotations"], b_cur["gt_translations"],
                carry["gt_flow"], carry["rmask"], b_cur["labels"],
                loss_assets)
            return loss, (log_vars, updates.get("batch_stats")
                          if mutable else None)

        (loss, (log_vars, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        log_vars["grad_norm"] = optax_global_norm(grads)
        return new_state, render_stage(b_next), log_vars

    pstep = jax.jit(pipelined, donate_argnums=(0, 1))
    state = fresh_state()
    carry = jax.jit(render_stage)(batch_dict)
    state, carry, logs = pstep(state, carry, batch_dict, batch_dict)
    host_sync(logs["loss"])
    for _ in range(2):
        state, carry, logs = pstep(state, carry, batch_dict, batch_dict)
    host_sync(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        state, carry, logs = pstep(state, carry, batch_dict, batch_dict)
    host_sync(logs["loss"])
    result["pipelined_step_ms"] = round(
        (time.perf_counter() - t0) / args.rounds * 1e3, 1)
    result["speedup_pct"] = round(
        (result["baseline_step_ms"] / result["pipelined_step_ms"] - 1) * 100,
        1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
