#!/usr/bin/env python
"""In-graph cost decomposition of the decoder recurrence by ABLATION.

Standalone sub-module timings overstate in-graph cost ~5x (XLA fuses the
whole update body — docs/PERFORMANCE.md round 3), so this tool measures
each component's REAL share: rebuild the exact flagship bench graph
(batch 64, bf16, slim, culling, 8 scan iterations) with ONE component
replaced by a shape-compatible constant, and attribute the step-time delta
to that component.  Caveats: XLA re-fuses around the hole, so deltas are a
lower bound on each component's cost and need not sum to the decoder
total; ablated variants change the parameter tree (timing-only — nothing
is loaded or saved).

Components: corr lookup (+pyramid kept alive via a scalar consumer),
motion encoder, ConvGRU, flow/mask XHeads, pose head, tap reprojection.
Env: ABLATE_BATCH / ABLATE_IMG / ABLATE_ROUNDS for smoke tests.
"""

import os
import sys
import time
from typing import Any, Sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (check_remote_backend_reachable,
                                       enable_compilation_cache)

check_remote_backend_reachable()

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

enable_compilation_cache()

import scflow_tpu.models.scflow_decoder as dec
from scflow_tpu.refiners import SCFlowRefiner
from scflow_tpu.refiners.system import RenderAssets, make_scflow_infer_fn
from scflow_tpu.render.meshbank import make_synthetic_bank

BATCH = int(os.environ.get("ABLATE_BATCH", "64"))
IMG = int(os.environ.get("ABLATE_IMG", "256"))
ROUNDS = int(os.environ.get("ABLATE_ROUNDS", "20"))
ITERS, NCLASS = 8, 21


def _keep(x, *extra):
    """Zero scalar that keeps `extra` tensors alive in the graph."""
    s = sum(e.astype(jnp.float32).sum() for e in extra)
    return (s * 0.0).astype(x)


class _ZeroMotion(nn.Module):
    net_type: str = "Basic"
    dtype: Any = None

    @nn.compact
    def __call__(self, corr, flow):
        n, h, w, _ = flow.shape
        return jnp.zeros((n, h, w, 128), corr.dtype) + _keep(
            corr.dtype, corr, flow)


class _IdGRU(nn.Module):
    h_channels: int = 128
    net_type: str = "SeqConv"
    dtype: Any = None
    fuse_gates: bool = False

    @nn.compact
    def __call__(self, h, x):
        return h + _keep(h.dtype, x)


class _ZeroXHead(nn.Module):
    feat_channels: Sequence[int] = (256,)
    x_channels: int = 2
    kind: str = "flow"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        return jnp.zeros((n, h, w, self.x_channels), x.dtype) + _keep(
            x.dtype, x)


class _ZeroPose(nn.Module):
    num_class: int = 21
    in_channels: int = 224
    rotation_mode: str = "ortho6d"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, label):
        n = x.shape[0]
        keep = _keep(jnp.float32, x)
        dr = jnp.tile(
            jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32)[None], (n, 1)
        ) + keep
        dt = jnp.zeros((n, 3), jnp.float32) + keep
        return dr, dt


def zero_lookup(pyramid, flow, radius=4, backend="xla"):
    n, h, w, _ = flow.shape
    k2 = (2 * radius + 1) ** 2
    return jnp.zeros((n, h, w, len(pyramid) * k2), flow.dtype) + _keep(
        flow.dtype, *pyramid)


def zero_flow_at(points, valid, R, t, K, pix, invalid_num):
    return jnp.zeros(points.shape[:3] + (2,), jnp.float32) + _keep(
        jnp.float32, points, R, t)


def build_and_time(tag):
    model = SCFlowRefiner(
        iters=ITERS, detach_depth_for_xy=True, dtype=jnp.bfloat16,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=NCLASS,
                           in_channels=224, rotation_mode="ortho6d"),
    )
    rng = np.random.default_rng(0)
    real = jnp.asarray(
        rng.normal(size=(BATCH, IMG, IMG, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(np.tile(np.array(
        [[[572.4, 0, IMG / 2], [0, 573.5, IMG / 2], [0, 0, 1]]], np.float32),
        (BATCH, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None],
                            (BATCH, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32),
                            (BATCH, 1)))
    labels = jnp.asarray(rng.integers(0, NCLASS, BATCH).astype(np.int32))
    bank = make_synthetic_bank(NCLASS, kind="uvsphere", size=80.0)
    ra = RenderAssets.from_bank(bank)
    variables = model.init(jax.random.PRNGKey(0), real, real, R, t,
                           jnp.zeros((BATCH, IMG, IMG)), K, labels)
    on_tpu = jax.default_backend() == "tpu"
    infer = make_scflow_infer_fn(
        model, ra, image_size=(IMG, IMG),
        render_backend="pallas" if on_tpu else "xla",
        lookup_backend="pallas" if on_tpu else "xla",
        render_cull_backfaces=True, slim=True)
    bd = {"real_images": real, "ref_rotations": R, "ref_translations": t,
          "k": K, "labels": labels}
    out = infer(variables, bd)
    float(np.asarray(jax.device_get(out["rotations"])).sum())
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        out = infer(variables, bd)
    float(np.asarray(jax.device_get(out["rotations"])).sum())
    dt = (time.perf_counter() - t0) / ROUNDS
    print(f"{tag:22s}: {dt * 1e3:7.2f} ms  ({BATCH / dt:6.1f} ref/s)",
          flush=True)
    return dt


ABLATIONS = [
    ("corr lookup", dict(corr_lookup_dispatch=zero_lookup)),
    ("motion encoder", dict(MotionEncoder=_ZeroMotion)),
    ("ConvGRU", dict(ConvGRU=_IdGRU)),
    ("flow/mask heads", dict(XHead=_ZeroXHead)),
    ("pose head", dict(MultiClassPoseHead=_ZeroPose,
                       SingleClassPoseHead=_ZeroPose)),
    ("tap reprojection", dict(flow_from_object_points_at=zero_flow_at)),
]


def main():
    base = build_and_time("baseline")
    deltas = []
    for tag, patches in ABLATIONS:
        saved = {k: getattr(dec, k) for k in patches}
        for k, v in patches.items():
            setattr(dec, k, v)
        try:
            d = build_and_time(f"- {tag}")
        finally:
            for k, v in saved.items():
                setattr(dec, k, v)
        deltas.append((tag, base - d))
    print("\nattributed in-graph cost (baseline - ablated, ms):", flush=True)
    for tag, c in deltas:
        print(f"  {tag:22s}: {c * 1e3:7.2f}", flush=True)


if __name__ == "__main__":
    main()
