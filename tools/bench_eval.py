#!/usr/bin/env python
"""Eval-loop throughput A/B: pipelined vs serial schedule.

Measures `single_process_test` (the tools/test.py eval loop) on a
synthetic BOP val set with the round-3 pipelined schedule (producer-thread
prefetch + dispatch-ahead, runtime/eval_loop.py) against the serial
baseline (pipelined=False), and asserts the result lists are identical.

The reference protocol (per-image, test_samples_per_gpu=1, reference
tools/eval.py:38-80) is preserved in both schedules; only the overlap of
host work (load/collate/pad + device_get + cv2 remap) with device compute
changes.

Usage: python tools/bench_eval.py [--images 48] [--img-scale 64]
       [--model SCFlowRefiner]  (JAX_PLATFORMS=cpu for a host-only check)
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from scflow_tpu.utils.platform import (apply_env_platform,
                                       check_remote_backend_reachable,
                                       enable_compilation_cache)

apply_env_platform()
check_remote_backend_reachable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--img-scale", type=int, default=64)
    ap.add_argument("--model", default="SCFlowRefiner")
    ap.add_argument("--root", default="/tmp/bench_eval")
    args = ap.parse_args()

    from pathlib import Path

    from synthetic_bop import build_synthetic_bop
    from test_e2e_cli import CONFIG_TMPL

    root = Path(args.root)
    data_dir = root / "data"
    marker = data_dir / f".built_{args.images}"
    if not marker.exists():
        info = build_synthetic_bop(data_dir, num_images=args.images,
                                   render_images=True)
        marker.write_text(json.dumps(info["diameters"]))
    diameters = json.loads(marker.read_text())
    cfg_path = root / "cfg.py"
    decoder = ("SCFlowDecoder" if args.model == "SCFlowRefiner"
               else "RAFTDecoder")
    cfg_path.write_text(CONFIG_TMPL.format(
        root=str(data_dir), diameters=diameters, work_dir=str(root / "work"),
        model_type=args.model, decoder_type=decoder,
    ).replace("image_scale = 64", f"image_scale = {args.img_scale}"))

    import jax

    enable_compilation_cache()

    from scflow_tpu.apis import (build_render_assets, init_model_variables,
                                 make_infer_from_cfg)
    from scflow_tpu.config import Config
    from scflow_tpu.datasets import build_dataset
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime.eval_loop import single_process_test

    cfg = Config.fromfile(str(cfg_path))
    image_size = tuple(cfg.model["renderer"].get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, _ = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size)
    dataset = build_dataset(cfg.data["test"])
    infer, pose_from_output = make_infer_from_cfg(
        cfg, model, render_assets, image_size, slim=True)

    import numpy as np

    def run(pipelined):
        t0 = time.perf_counter()
        results = single_process_test(
            variables, infer, dataset, pose_from_output=pose_from_output,
            progress_interval=0, pipelined=pipelined)
        dt = time.perf_counter() - t0
        return results, dt

    # compile first (excluded from both timings)
    run(False)
    res_serial, dt_serial = run(False)
    res_pipe, dt_pipe = run(True)

    n = len(res_serial)
    assert n == len(res_pipe) == args.images
    for a, b in zip(res_serial, res_pipe):
        assert a["img_metas"]["img_path"] == b["img_metas"]["img_path"]
        np.testing.assert_allclose(a["pred"]["rotations"],
                                   b["pred"]["rotations"], atol=1e-6)
        np.testing.assert_allclose(a["pred"]["translations"],
                                   b["pred"]["translations"], atol=1e-5)

    print(json.dumps({
        "images": n,
        "serial_img_per_s": round(n / dt_serial, 2),
        "pipelined_img_per_s": round(n / dt_pipe, 2),
        "speedup": round(dt_serial / dt_pipe, 3),
        "results_identical": True,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
