#!/usr/bin/env python
"""Stage split of the EXACT bench.py configuration (batch 64, 2048-face
sphere bank, 8 GRU iters, scan decoder) — where does the 1/582.6s go?

Stages timed independently (each its own jit, host-fetch synced):
  render+norm | encoder feat (doubled batch) | context | decoder(8it)
  | model.apply | infer end-to-end (the bench graph)
Env: PROFILE_DTYPE=bf16 repeats with model dtype bf16.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (apply_env_platform,
                                       check_remote_backend_reachable,
                                       enable_compilation_cache)

apply_env_platform()
check_remote_backend_reachable()

import jax
import jax.numpy as jnp
import numpy as np

enable_compilation_cache()


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(jax.device_get(x)).sum()), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(jax.device_get(x)).sum()), out)
    return (time.perf_counter() - t0) / n


def main():
    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import (RenderAssets,
                                            make_scflow_infer_fn,
                                            render_and_normalize)
    from scflow_tpu.render.meshbank import make_synthetic_bank

    batch, img, iters, nclass = 64, 256, 8, 21
    dtype = os.environ.get("PROFILE_DTYPE", "fp32")
    mdtype = jnp.bfloat16 if dtype == "bf16" else None
    print(f"[profile_bench64] batch={batch} dtype={dtype}")

    bank = make_synthetic_bank(nclass, kind="sphere", size=80.0,
                               subdivisions=4)
    ra = RenderAssets.from_bank(bank)
    model = SCFlowRefiner(
        iters=iters, detach_depth_for_xy=True, dtype=mdtype,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                           in_channels=224, rotation_mode="ortho6d"),
    )
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    real = jnp.asarray(
        rng.normal(size=(batch, img, img, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(np.tile(np.array(
        [[[572.4, 0, 128], [0, 573.5, 128], [0, 0, 1]]], np.float32),
        (batch, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    variables = model.init(key, real, real, R, t,
                           jnp.zeros((batch, img, img)), K, labels)

    on_tpu = jax.default_backend() == "tpu"
    rb = "pallas" if on_tpu else "xla"

    rn = jax.jit(functools.partial(
        render_and_normalize, ra, image_size=(img, img),
        norm_mean=(0.0, 0.0, 0.0), norm_std=(255.0,) * 3, backend=rb))
    print(f"render+norm:        {timeit(rn, R, t, K, labels) * 1e3:8.2f} ms")
    imgs, depths, masks = rn(R, t, K, labels)

    # encoder halves (same call pattern as the model: doubled batch feat)
    enc_in = jnp.concatenate([imgs, real], axis=0)
    feat_fn = jax.jit(lambda v, x: model.bind(v).render_encoder(x))
    print(f"feat encoder (2x):  {timeit(feat_fn, variables, enc_in) * 1e3:8.2f} ms")
    cxt_fn = jax.jit(lambda v, x: model.bind(v).context(x))
    print(f"context encoder:    {timeit(cxt_fn, variables, imgs) * 1e3:8.2f} ms")

    lb = "pallas" if on_tpu else "xla"
    apply_fn = jax.jit(lambda v, ri: model.apply(
        v, ri, real, R, t, depths, K, labels, train=False,
        output_sequences=False, unroll=False, lookup_backend=lb))
    print(f"model.apply:        {timeit(apply_fn, variables, imgs) * 1e3:8.2f} ms")

    infer = make_scflow_infer_fn(model, ra, image_size=(img, img),
                                 render_backend=rb, lookup_backend=lb)
    bd = {"real_images": real, "ref_rotations": R, "ref_translations": t,
          "k": K, "labels": labels}
    dt = timeit(infer, variables, bd)
    print(f"infer end-to-end:   {dt * 1e3:8.2f} ms  "
          f"({batch / dt:.1f} ref/s)")


if __name__ == "__main__":
    main()
