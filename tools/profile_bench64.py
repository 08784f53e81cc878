#!/usr/bin/env python
"""Stage split of the EXACT bench.py configuration (batch 64, 1024-face
uvsphere bank, 8 GRU iters, scan decoder; PROFILE_DTYPE=bf16 matches the
flagship bench) — where does each refinement's time go?

Methodology note (round 3): on the remote-TPU backend a `device_get` of a
large output tree rides the tunnel at ~15 MB/s, so any timing window that
fetches stage outputs measures the TUNNEL, not the chip (the first version
of this tool reported a 320 ms "render" that bench.py's end-to-end numbers
prove is ~9x smaller).  Every timed graph therefore reduces its outputs to
ONE scalar on device; only 4 bytes cross the tunnel at the sync point.
XLA may fuse the reduction into the producer, but the outputs were HBM
materialized in the real graph anyway — the bias is small and uniform.

Stages timed independently (each its own jit):
  render+norm | encoder feat (doubled batch) | context | decoder-only
  (render+encoders precomputed as device buffers) | infer end-to-end
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


def scalarize(fn):
    """Wrap fn so the jitted graph ends in one f32 scalar (sum of leaves)."""

    @functools.wraps(fn)
    def wrapped(*args):
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    return wrapped


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.device_get(out)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax.device_get(out)))
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
    print(f"[profile_bench64] batch={batch} dtype={dtype}", flush=True)

    bank = make_synthetic_bank(nclass, kind="uvsphere", size=80.0)
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
    lb = "pallas" if on_tpu else "xla"

    cull = os.environ.get("PROFILE_CULL", "1") == "1"  # bench.py default
    rn = functools.partial(
        render_and_normalize, ra, image_size=(img, img),
        norm_mean=(0.0, 0.0, 0.0), norm_std=(255.0,) * 3, backend=rb,
        cull_backfaces=cull)
    print(f"render+norm:        "
          f"{timeit(jax.jit(scalarize(rn)), R, t, K, labels) * 1e3:8.2f} ms",
          flush=True)
    imgs, depths, masks = jax.jit(rn)(R, t, K, labels)
    imgs, depths = jax.device_put(imgs), jax.device_put(depths)

    enc_in = jnp.concatenate([imgs, real], axis=0)
    feat_fn = jax.jit(scalarize(lambda v, x: model.bind(v).render_encoder(x)))
    print(f"feat encoder (2x):  "
          f"{timeit(feat_fn, variables, enc_in) * 1e3:8.2f} ms", flush=True)
    cxt_fn = jax.jit(scalarize(lambda v, x: model.bind(v).context(x)))
    print(f"context encoder:    "
          f"{timeit(cxt_fn, variables, imgs) * 1e3:8.2f} ms", flush=True)

    apply_fn = jax.jit(scalarize(lambda v, ri, rd: model.apply(
        v, ri, real, R, t, rd, K, labels, train=False,
        output_sequences=False, unroll=False, lookup_backend=lb)))
    print(f"model.apply:        "
          f"{timeit(apply_fn, variables, imgs, depths) * 1e3:8.2f} ms",
          flush=True)

    bd = {"real_images": real, "ref_rotations": R, "ref_translations": t,
          "k": K, "labels": labels}
    for slim in (False, True):
        infer = make_scflow_infer_fn(model, ra, image_size=(img, img),
                                     render_backend=rb, lookup_backend=lb,
                                     render_cull_backfaces=cull, slim=slim)
        # bench.py's own sync discipline: fetch one small leaf only
        for _ in range(2):
            out = infer(variables, bd)
        float(np.asarray(jax.device_get(out["rotations"])).sum())
        t0 = time.perf_counter()
        for _ in range(20):
            out = infer(variables, bd)
        float(np.asarray(jax.device_get(out["rotations"])).sum())
        dt = (time.perf_counter() - t0) / 20
        tag = "slim (bench.py)" if slim else "full"
        print(f"infer e2e {tag:15s}: {dt * 1e3:8.2f} ms  "
              f"({batch / dt:.1f} ref/s)", flush=True)


if __name__ == "__main__":
    main()
