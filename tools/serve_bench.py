#!/usr/bin/env python
"""Serving throughput benchmark (BASELINE config 5): multi-object batched
refinement with device-side preprocessing, optionally bf16, data-parallel
over all visible chips.

    python tools/serve_bench.py [--batch 64] [--img 256] [--iters 8] \
        [--dtype bf16] [--frames 4] [--render-backend pallas|xla]
"""

import argparse
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

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--img", type=int, default=256)
    p.add_argument("--frame-hw", type=int, nargs=2, default=[480, 640])
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--nclass", type=int, default=21)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--render-backend", default=None,
                   help="default: pallas on TPU, xla elsewhere")
    p.add_argument("--rounds", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from scflow_tpu.parallel import batch_sharding, make_mesh, replicate
    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import RenderAssets
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.serving import make_serving_fn

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    backend = args.render_backend or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    print(f"{n_dev} device(s), backend={jax.default_backend()}, "
          f"render={backend}, dtype={args.dtype}")

    bank = make_synthetic_bank(args.nclass, kind="uvsphere", size=80.0)
    ra = RenderAssets.from_bank(bank)
    model = SCFlowRefiner(
        iters=args.iters, detach_depth_for_xy=True, dtype=dtype,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=args.nclass,
                           in_channels=224),
    )

    rng = np.random.default_rng(0)
    P = args.batch * n_dev
    hf, wf = args.frame_hw
    frames = jnp.asarray(
        rng.uniform(0, 255, (args.frames, hf, wf, 3)).astype(np.float32)
    )
    frame_idx = jnp.asarray(rng.integers(0, args.frames, P).astype(np.int32))
    R = jnp.asarray(Rotation.random(P, 1).as_matrix().astype(np.float32))
    t = jnp.asarray(
        np.stack([rng.normal(size=P) * 60, rng.normal(size=P) * 40,
                  rng.uniform(700, 1100, P)], -1).astype(np.float32)
    )
    K = jnp.asarray(
        np.tile(np.array([[[572.4, 0, wf / 2], [0, 573.5, hf / 2], [0, 0, 1]]],
                         np.float32), (P, 1, 1))
    )
    labels = jnp.asarray(rng.integers(0, args.nclass, P).astype(np.int32))

    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, args.img, args.img, 3))
    variables = model.init(
        key, dummy, dummy, R[:2], t[:2], jnp.zeros((2, args.img, args.img)),
        K[:2], labels[:2],
    )
    # slim=True matches the shipped service configuration (PoseService
    # fetches poses only; apis.make_serving_from_cfg builds slim)
    # cull_backfaces matches the flagship bench: the synthetic bank is
    # closed/outward-wound (bank.closed_consistently_wound()), so culling
    # is output-identical (docs/PERFORMANCE.md "Backface culling")
    serve = make_serving_fn(
        model, ra, ra.verts, ra.vert_valid, image_size=args.img,
        render_backend=backend, iters=args.iters, slim=True,
        render_cull_backfaces=True,
    )

    with mesh:
        sh = batch_sharding(mesh)
        variables = replicate(variables, mesh)
        batch_args = [
            frames,
            jax.device_put(frame_idx, sh),
            jax.device_put(R, sh),
            jax.device_put(t, sh),
            jax.device_put(K, sh),
            jax.device_put(labels, sh),
        ]
        # sync via host fetch — on the remote-TPU backend block_until_ready
        # does not reliably wait, a device_get does
        out = serve(variables, *batch_args)
        float(np.asarray(jax.device_get(out["rotations"])).sum())
        t0 = time.perf_counter()
        for _ in range(args.rounds):
            out = serve(variables, *batch_args)
        float(np.asarray(jax.device_get(out["rotations"])).sum())
        dt = time.perf_counter() - t0

    total = P * args.rounds / dt
    print(
        f"serving: {total:.1f} refinements/s total, "
        f"{total / n_dev:.1f} /s/chip "
        f"({dt / args.rounds * 1e3:.1f} ms / {P}-object step, incl. "
        f"device-side crop+render)"
    )


if __name__ == "__main__":
    main()
