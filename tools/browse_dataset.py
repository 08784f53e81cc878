#!/usr/bin/env python
"""Visual QA of the data pipeline: dump augmented samples with pose overlays
(reference tools/browse_dataset.py + browse_dataset_patch.py merged; writes
images instead of interactive display).

    python tools/browse_dataset.py configs/refine_models/scflow.py \
        --split train --num 8 --out-dir work_dirs/browse \
        [--skip-types RandomHSV RandomNoise]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import apply_env_platform

apply_env_platform()

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--out-dir", default="work_dirs/browse")
    p.add_argument("--skip-types", nargs="*", default=[])
    args = p.parse_args()

    from scflow_tpu.config import Config
    from scflow_tpu.datasets import build_dataset
    from scflow_tpu.utils.visualize import imshow_pose_axis

    cfg = Config.fromfile(args.config)
    dcfg = dict(cfg.data[args.split])
    if args.skip_types:
        pipeline = []
        for t in dcfg["pipeline"]:
            if t.get("type") not in args.skip_types:
                pipeline.append(t)
            elif "jittered_pose_field" in t and "jitter_pose_field" in t:
                # skipping a PoseJitter-style transform must still seed its
                # output pose fields for the downstream transforms: ref = gt
                pipeline.append(dict(type="CopyFields",
                                     src=list(t["jitter_pose_field"]),
                                     dst=list(t["jittered_pose_field"])))
        dcfg["pipeline"] = pipeline
    dataset = build_dataset(dcfg)
    os.makedirs(args.out_dir, exist_ok=True)

    mean = np.asarray(cfg.get("normalize_mean", [0, 0, 0]), np.float32)
    std = np.asarray(cfg.get("normalize_std", [255, 255, 255]), np.float32)
    for i in range(min(args.num, len(dataset))):
        sample = dataset[i]
        imgs = np.asarray(sample["img"])  # (n, H, W, 3) normalized RGB
        annots = sample["annots"]
        for j in range(len(imgs)):
            img = (imgs[j] * std + mean)[..., ::-1]  # denorm, RGB->BGR
            img = np.clip(img, 0, 255).astype(np.uint8)
            rot_key = "ref_rotations" if "ref_rotations" in annots else "gt_rotations"
            trans_key = rot_key.replace("rotations", "translations")
            vis = imshow_pose_axis(
                img, annots["k"][j], annots[rot_key][j], annots[trans_key][j]
            )
            out_path = os.path.join(args.out_dir, f"sample_{i:04d}_{j}.png")
            cv2.imwrite(out_path, vis)
            print(out_path)


if __name__ == "__main__":
    main()
