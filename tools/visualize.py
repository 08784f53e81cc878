#!/usr/bin/env python
"""Visualize predicted poses on test images: renders the model's pose (mask
contour / axes / projected points overlays) next to the initial pose
(reference tools/visualize.py's imshow_pose_* + Pytorch3dVisTool, using the
on-device renderer for silhouettes).

    python tools/visualize.py configs/refine_models/scflow.py \
        --checkpoint CKPT --num 6 --out-dir work_dirs/vis
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
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num", type=int, default=6)
    p.add_argument("--out-dir", default="work_dirs/vis")
    args = p.parse_args()

    from scflow_tpu.apis import (
        build_render_assets,
        init_model_variables,
        load_eval_checkpoint,
        make_infer_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.datasets import build_dataset
    from scflow_tpu.datasets.loader import collate_batch
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.render.renderer import render_batch
    from scflow_tpu.runtime.eval_loop import pad_batch, _bucket
    from scflow_tpu.utils.visualize import imshow_pose_axis, imshow_pose_contour

    cfg = Config.fromfile(args.config)
    image_size = tuple(cfg.model["renderer"].get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, _ = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size)
    variables = load_eval_checkpoint(args.checkpoint, variables, cfg.model)
    infer, pose_from_output = make_infer_from_cfg(cfg, model, render_assets, image_size)

    dataset = build_dataset(cfg.data["test"])
    os.makedirs(args.out_dir, exist_ok=True)
    mean = np.asarray(cfg.get("normalize_mean", [0, 0, 0]), np.float32)
    std = np.asarray(cfg.get("normalize_std", [255, 255, 255]), np.float32)

    for i in range(min(args.num, len(dataset))):
        sample = dataset[i]
        batch = collate_batch([sample])
        batch.pop("img_metas")
        batch.pop("per_img_patch_num")
        n = batch["labels"].shape[0]
        out = infer(variables, pad_batch(batch, _bucket(n)))
        if pose_from_output is None:
            R = np.asarray(out["rotations"])[:n]
            t = np.asarray(out["translations"])[:n]
        else:
            R, t = pose_from_output(out, batch, n)
        # render predicted-pose silhouettes for contours
        h, w = image_size
        rend = render_batch(
            render_assets.verts, render_assets.faces, render_assets.face_valid,
            render_assets.colors, render_assets.normals, render_assets.vert_valid,
            R, t, np.asarray(batch["k"])[:n], np.asarray(batch["labels"])[:n],
            h, w,
        )
        masks = np.asarray(rend["masks"])
        for j in range(n):
            img = (np.asarray(batch["real_images"])[j] * std + mean)[..., ::-1]
            img = np.clip(img, 0, 255).astype(np.uint8)
            vis = imshow_pose_contour(img, masks[j], color=(0, 255, 0))
            vis = imshow_pose_axis(vis, batch["k"][j], R[j], t[j])
            ref_vis = imshow_pose_axis(
                img, batch["k"][j], np.asarray(batch["ref_rotations"])[j],
                np.asarray(batch["ref_translations"])[j],
            )
            panel = np.concatenate([ref_vis, vis], axis=1)
            out_path = os.path.join(args.out_dir, f"img{i:04d}_obj{j}.png")
            cv2.imwrite(out_path, panel)
            print(out_path)


if __name__ == "__main__":
    main()
