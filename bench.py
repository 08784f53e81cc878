"""Benchmark: SCFlow pose-refinement throughput on the flagship config.

Measures end-to-end refinements/sec/chip for the full inference path —
on-device rendering at the reference pose + 3 encoder passes + 8 GRU
shape-constraint iterations at 256x256 — i.e. what `test.py` times per image
in the reference (test.py:116-120), but batched.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is ANCHORED to a measured chain (BASELINE.md "Anchored A100
denominator" for the full derivation and sensitivity):

  1. workload = 37.54 GFLOP/refinement (XLA cost analysis of this exact
     bench graph, batch 16, incl. on-device render);
  2. measured: the full torch re-derivation of the reference network
     (tests/torch_oracle.py::SCFlowRefinerTorch, fp32, batch 16) runs at
     959.7 ms/refinement on this host's CPU, whose sustained fp32 GEMM is
     0.1366 TFLOP/s (measured) -> the torch graph sustains 28.6% of the
     host's GEMM rate;
  3. assume the same sustained-GEMM fraction on an A100 (generous to the
     reference: it also credits full cross-image batching, which the
     shipped test protocol — samples_per_gpu=1 — cannot do, and ignores
     its per-image python loops): A100 fp32 sustained GEMM
     = 19.5 TFLOP/s peak x 0.9 = 17.55
     -> 959.7 ms x 0.1366 / 17.55 = 7.47 ms/refinement = 134 ref/s.

vs_baseline = ours / 134.0 — the '5x' north star reads as vs_baseline >= 5.
"""

import json
import time

import numpy as np

A100_TORCH_REFINEMENTS_PER_SEC = 134.0


def main():
    from scflow_tpu.utils.platform import (check_remote_backend_reachable,
                                           enable_compilation_cache)

    # a dead TPU tunnel makes axon init block forever; better a fast error
    check_remote_backend_reachable()

    import jax
    import jax.numpy as jnp

    enable_compilation_cache()

    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import RenderAssets, make_scflow_infer_fn
    from scflow_tpu.render.meshbank import make_synthetic_bank

    # batch 64 is the measured fp32 throughput knee (docs/PERFORMANCE.md
    # batch-scaling table: 520.9/s @16, 520.1 @32, 582.0 @64); the
    # per-refinement baseline denominator is batch-independent and already
    # credits the reference with full cross-image batching (BASELINE.md)
    batch = 64
    img = 256
    iters = 8
    nclass = 21

    # bf16 compute (fp32 params/statistics) is the flagship dtype: the
    # eval-scale ADD-parity protocol (tools/bf16_parity.py; PERFORMANCE.md
    # "bf16 eval-scale ADD parity") measured a 0.00 ADD-table delta vs fp32
    # over 1,000 poses x 36 table entries (8 classes, 3 symmetric) at two
    # training levels, with ZERO per-pose threshold crossings — within the
    # north star's 0.1% accuracy bar. The A100 torch reference itself runs
    # TF32 convs by default (cudnn allow_tf32), so reduced-precision compute
    # is the apples-to-apples comparison.
    dtype = jnp.bfloat16

    # 1024 faces per mesh — the reference renders models_1024 assets
    # (configs/refine_datasets/ycbv_real.py:151, meshes decimated to 1024
    # faces), so this matches the reference's per-refinement render
    # workload.  Rounds 1-2 benched 2048-face meshes by mistake (2x the
    # reference's render work; docs/PERFORMANCE.md "bench asset
    # correction").
    bank = make_synthetic_bank(nclass, kind="uvsphere", size=80.0)
    render_assets = RenderAssets.from_bank(bank)

    model = SCFlowRefiner(
        iters=iters,
        detach_depth_for_xy=True,
        dtype=dtype,
        pose_head_cfg=dict(
            type="MultiClassPoseHead", num_class=nclass, in_channels=224,
            rotation_mode="ortho6d",
        ),
    )

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(size=(batch, img, img, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(
        np.tile(
            np.array(
                [[[572.4, 0, img / 2], [0, 573.5, img / 2], [0, 0, 1]]], np.float32
            ),
            (batch, 1, 1),
        )
    )
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))

    key = jax.random.PRNGKey(0)
    depth0 = jnp.zeros((batch, img, img))
    variables = model.init(key, real, real, R, t, depth0, K, labels)

    on_tpu = jax.default_backend() == "tpu"
    # slim=True: pose-only output surface — exactly what the reference's
    # timed test-time forward returns (scflow_refiner.py:174-179 returns
    # pose/labels/scores; its flow/mask stay internal). The eval CLI runs
    # the same slim path (apis.make_infer_from_cfg(slim=True)).
    # cull_backfaces: the bench meshes are closed and consistently wound
    # (like every BOP scan), so backface culling halves live rasterizer
    # faces with IDENTICAL output maps — verified exactly (tests/
    # test_pallas_raster.py::test_backface_culling_identical_render and the
    # on-hardware run recorded in docs/PERFORMANCE.md "Backface culling")
    infer = make_scflow_infer_fn(
        model, render_assets, image_size=(img, img),
        render_backend="pallas" if on_tpu else "xla",
        lookup_backend="pallas" if on_tpu else "xla",
        render_cull_backfaces=True,
        slim=True,
    )
    bdict = {
        "real_images": real,
        "ref_rotations": R,
        "ref_translations": t,
        "k": K,
        "labels": labels,
    }

    # warmup / compile; sync via host fetch — on the remote-TPU backend
    # block_until_ready does not reliably wait, a device_get does
    out = infer(variables, bdict)
    float(np.asarray(jax.device_get(out["rotations"])).sum())

    # 100 rounds: the remote-TPU tunnel adds a fixed per-dispatch cost
    # that a 20-round loop leaves ~1% of in the per-step mean (measured:
    # trivial-kernel dispatch 2.40 ms/call at n=20 vs 0.64 at n=100;
    # flagship 83.5 -> 82.6 ms at n=100).  100 rounds measures the
    # steady-state throughput a production serving loop actually sees.
    n_rounds = 100
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        out = infer(variables, bdict)
    float(np.asarray(jax.device_get(out["rotations"])).sum())
    dt = time.perf_counter() - t0

    refinements_per_sec = batch * n_rounds / dt
    print(
        json.dumps(
            {
                "metric": "scflow_refinements_per_sec_per_chip",
                "value": round(refinements_per_sec, 2),
                "unit": "refinements/s (256x256, 8 GRU iters, batch 64, bf16 compute, incl. on-device render)",
                "vs_baseline": round(
                    refinements_per_sec / A100_TORCH_REFINEMENTS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
