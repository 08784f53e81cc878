#!/usr/bin/env python
"""Evaluation / BOP-export entry point (reference test.py CLI semantics,
with the --out flag actually defined — SURVEY.md §2.4 item 1):

    python tools/test.py configs/refine_models/scflow.py --checkpoint CKPT \
        [--eval | --format-only --save-dir DIR] [--out results.json] \
        [--eval-options k=v ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (apply_env_platform,
                                       enable_compilation_cache)

apply_env_platform()
enable_compilation_cache()

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Test a pose refiner")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--out", default=None, help="dump raw results json")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--limit", default=None, type=int,
                   help="evaluate only the first N images (smoke runs)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--eval-options", nargs="*", default=[])
    p.add_argument("--launcher", default="none", choices=["none", "jax"],
                   help="'jax' (or env SCFLOW_DIST=1) initializes "
                        "jax.distributed for multi-host runs")
    return p.parse_args()


def main():
    args = parse_args()
    from scflow_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(args.launcher)
    from scflow_tpu.apis import (
        build_render_assets,
        init_model_variables,
        load_eval_checkpoint,
        make_infer_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.datasets import build_dataset
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime.eval_loop import multi_process_test
    from scflow_tpu.utils.logging import get_logger

    logger = get_logger("scflow_tpu")
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(
            {k: Config.parse_option_value(v) for k, v in
             (opt.split("=", 1) for opt in args.cfg_options)}
        )
    np.random.seed(args.seed)

    image_size = tuple(cfg.model["renderer"].get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, _ = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size)
    variables = load_eval_checkpoint(args.checkpoint, variables, cfg.model, logger)

    dataset = build_dataset(cfg.data["test"])
    if args.limit:
        dataset.img_files = dataset.img_files[: args.limit]

    infer, pose_from_output = make_infer_from_cfg(cfg, model, render_assets,
                                                  image_size)
    t0 = time.perf_counter()
    test_cfg = cfg.model.get("test_cfg", {})
    results = multi_process_test(
        variables, infer, dataset, pose_from_output=pose_from_output,
        logger=logger,
        max_bucket=test_cfg.get("max_bucket", 64),
        fixed_bucket=test_cfg.get("fixed_bucket", False),
    )
    total = time.perf_counter() - t0
    logger.info(f"{len(results)} images in {total:.1f}s "
                f"({total / max(len(results), 1) * 1e3:.1f} ms/img)")

    if args.out:
        serializable = [
            dict(
                pred={k: np.asarray(v).tolist() for k, v in r["pred"].items()},
                img_metas=r["img_metas"],
            )
            for r in results
        ]
        with open(args.out, "w") as f:
            json.dump(serializable, f)
        logger.info(f"wrote raw results to {args.out}")

    if args.format_only:
        assert args.save_dir, "--format-only requires --save-dir"
        dataset.format_results(results, args.save_dir,
                               time=total / max(len(results), 1))
        logger.info(f"BOP-format results saved to {args.save_dir}")
    if args.eval:
        metric = cfg.get("evaluation", {}).get(
            "metric", {"add": [0.05, 0.10, 0.20, 0.50], "rep": [2, 5, 10, 20]}
        )
        if args.eval_options:
            metric = {
                k: Config.parse_option_value(v) for k, v in
                (opt.split("=", 1) for opt in args.eval_options)
            }
        metrics = dataset.evaluate(results, metric=metric)
        ts = time.strftime("%Y%m%d_%H%M%S")
        out_json = os.path.join(
            cfg.get("work_dir", "work_dirs/default"), f"eval_{ts}.json"
        )
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=1)
        logger.info(f"eval metrics dumped to {out_json}")


if __name__ == "__main__":
    main()
