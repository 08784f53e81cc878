#!/usr/bin/env python
"""Extract per-mesh 3D keypoints -> json consumed by RemapPose / the datasets
(reference tools/collect_3d_keypoints.py): modes 'bbox' (axis-aligned corner
box), 'obb' (oriented bbox via PCA), 'fps' (farthest point sampling).

    python tools/collect_3d_keypoints.py data/ycbv/models_eval \
        --out data/ycbv/keypoints/bbox.json --mode bbox --num 8
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scflow_tpu.ops.fps import farthest_point_sample
from scflow_tpu.render.ply import load_ply


def bbox_corners(verts):
    mn, mx = verts.min(0), verts.max(0)
    return np.array(
        [[x, y, z] for x in (mn[0], mx[0]) for y in (mn[1], mx[1]) for z in (mn[2], mx[2])],
        np.float32,
    )


def obb_corners(verts):
    mean = verts.mean(0)
    centered = verts - mean
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    local = centered @ vt.T
    mn, mx = local.min(0), local.max(0)
    corners_local = np.array(
        [[x, y, z] for x in (mn[0], mx[0]) for y in (mn[1], mx[1]) for z in (mn[2], mx[2])],
        np.float32,
    )
    return corners_local @ vt + mean


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mesh_dir")
    p.add_argument("--out", required=True)
    p.add_argument("--mode", choices=["bbox", "obb", "fps"], default="bbox")
    p.add_argument("--num", type=int, default=8)
    args = p.parse_args()

    paths = sorted(glob.glob(os.path.join(args.mesh_dir, "*.ply")))
    if not paths:
        raise FileNotFoundError(f"no meshes in {args.mesh_dir}")
    all_kps = []
    for path in paths:
        v = load_ply(path).vertices
        if args.mode == "bbox":
            kp = bbox_corners(v)[: args.num]
        elif args.mode == "obb":
            kp = obb_corners(v)[: args.num]
        else:
            kp = v[farthest_point_sample(v, args.num)]
        all_kps.append(kp.tolist())
        print(f"{os.path.basename(path)}: {len(kp)} keypoints")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(all_kps, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
