#!/usr/bin/env python
"""Pre-populate the persistent XLA compilation cache for a config.

On the remote-compile TPU backend a fresh jit specialization costs minutes
(docs/PERFORMANCE.md); this tool compiles the train step, every eval-bucket
infer specialization, and the serving fn ahead of time so the real run (or
a preemption restart on a new host sharing the cache dir) starts hot.

    python tools/warmup_cache.py configs/refine_models/scflow.py \
        [--what train,infer,serve] [--frame-hw 480 640] [--cfg-options ...]

Compile keys bake the renderer's mesh-bank constants, so warmup MUST load
the config's real meshes (it does); parameter VALUES don't matter, so
random-init weights warm the same cache entries a checkpoint would.
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


def synthetic_batch(n, image_size, num_class, train=True):
    """Random arrays with the exact dtypes/shapes the steps are jitted for
    (values are irrelevant to the compile cache)."""
    h, w = image_size
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    batch = {
        "real_images": rng.normal(size=(n, h, w, 3)).astype(np.float32) * 0.2,
        "ref_rotations": Rotation.random(n, rng).as_matrix().astype(np.float32),
        "ref_translations": np.tile(
            np.array([[0, 0, 700.0]], np.float32), (n, 1)),
        "k": np.tile(
            np.array([[[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]]],
                     np.float32), (n, 1, 1)),
        "labels": rng.integers(0, num_class, n).astype(np.int32),
    }
    if train:
        batch["gt_rotations"] = Rotation.random(n, rng).as_matrix().astype(
            np.float32)
        batch["gt_translations"] = batch["ref_translations"] + 5.0
        batch["gt_masks"] = (
            rng.uniform(size=(n, h, w)) > 0.5).astype(np.float32)
    return batch


def _sync(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            # host fetch: block_until_ready is unreliable on the remote
            # backend (docs/PERFORMANCE.md)
            np.asarray(jax.device_get(leaf)).ravel()[:1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--what", default="train,infer,serve")
    p.add_argument("--frame-hw", type=int, nargs=2, default=[480, 640],
                   help="serving frame size (must match tools/serve.py)")
    p.add_argument("--max-objects", type=int, default=64,
                   help="serving batch budget (must match tools/serve.py)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()
    what = set(args.what.split(","))

    import jax

    from scflow_tpu.apis import (
        build_loss_assets,
        build_render_assets,
        init_model_variables,
        make_infer_from_cfg,
        make_train_step_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.parallel import make_mesh, replicate, shard_batch
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime import TrainState, build_optimizer
    from scflow_tpu.runtime.eval_loop import _bucket

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_options(args.cfg_options))

    image_size = tuple(cfg.model["renderer"].get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, bank = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size,
                                     num_class=bank.num_class)
    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    print(f"backend={jax.default_backend()}, {n_dev} device(s), "
          f"image_size={image_size}")

    if "infer" in what:
        infer, _ = make_infer_from_cfg(cfg, model, render_assets, image_size)
        test_cfg = cfg.model.get("test_cfg", {})
        max_bucket = test_cfg.get("max_bucket", 64)
        if test_cfg.get("fixed_bucket", False):
            buckets = [max_bucket]
        else:
            buckets, b = [], 1
            while b <= max_bucket:
                buckets.append(b)
                b *= 2
        for n in buckets:
            t0 = time.perf_counter()
            out = infer(variables, synthetic_batch(
                n, image_size, bank.num_class, train=False))
            _sync(out)
            print(f"infer bucket {n} compiled in "
                  f"{time.perf_counter() - t0:.1f}s")

    if "serve" in what:
        from scflow_tpu.apis import make_serving_from_cfg
        from scflow_tpu.runtime.server import PoseService

        t0 = time.perf_counter()
        # same builder as scflow-serve, so the compiled graph constants
        # (norm stats, iters) match the real server's cache keys exactly
        serve_fn, fetch_keys, post_fn = make_serving_from_cfg(
            cfg, model, render_assets)
        service = PoseService(
            serve_fn, variables, frame_hw=tuple(args.frame_hw),
            num_class=bank.num_class, max_objects=args.max_objects,
            mesh=mesh if n_dev > 1 else None,
            fetch_keys=fetch_keys, post_fn=post_fn,
        )
        service.warmup()
        print(f"serving fn compiled in {time.perf_counter() - t0:.1f}s")

    if "train" in what:
        # LAST: the train step donates its state, and on a 1-device mesh
        # replicate() is a no-op device_put that aliases variables' buffers
        # — donation would delete the params the other phases still use.
        # Host-copying the params makes the state's buffers its own.
        t0 = time.perf_counter()
        loss_assets = build_loss_assets(cfg.model, bank.num_class)
        opt_config = cfg.get("optimizer_config", {})
        tx, _ = build_optimizer(
            dict(cfg.optimizer), dict(cfg.get("lr_config", {})),
            opt_config.get("grad_clip", {}).get("max_norm"),
            frozen_prefixes=opt_config.get("frozen_prefixes"),
        )
        own = jax.tree_util.tree_map(np.asarray, variables)
        state = TrainState.create(own["params"], tx, own.get("batch_stats"))
        train_step = make_train_step_from_cfg(cfg, model, render_assets,
                                              loss_assets, image_size)
        n = cfg.data.get("samples_per_gpu", 16) * n_dev
        batch = synthetic_batch(n, image_size, bank.num_class, train=True)
        with mesh:
            state = replicate(state, mesh)
            state, logs = train_step(state, shard_batch(batch, mesh))
            _sync(logs)
        print(f"train step (batch {n}) compiled in "
              f"{time.perf_counter() - t0:.1f}s")

    print("cache warm")


if __name__ == "__main__":
    main()
