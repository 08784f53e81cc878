"""Synthetic on-disk BOP dataset builder shared by data-layer and E2E tests.

Creates: train_real/000001/{rgb,mask_visib,scene_*.json}, models_eval/,
models_1024/, image_lists/, keypoints.json, initial_poses/ (noisy ref poses).
Images are actual renders of the synthetic meshes at the GT pose so training
signal is real."""

import json
import os
from pathlib import Path

import cv2
import numpy as np

from scflow_tpu.render.meshbank import make_synthetic_bank

IMG_HW = (120, 160)
K = np.array([[140.0, 0, 80], [0, 140.0, 60], [0, 0, 1]], np.float32)


def write_ply(path, verts, faces, colors=None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(verts):
            line = f"{v[0]} {v[1]} {v[2]}"
            if colors is not None:
                c = (colors[i] * 255).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def build_synthetic_bop(root, num_images=3, num_class=2, render_images=False,
                        seed=0):
    root = Path(root)
    data = root / "train_real"
    seq = data / "000001"
    (seq / "rgb").mkdir(parents=True, exist_ok=True)
    (seq / "mask_visib").mkdir(parents=True, exist_ok=True)
    for sub in ("models_eval", "models_1024", "image_lists"):
        (root / sub).mkdir(exist_ok=True)

    bank = make_synthetic_bank(num_class, size=60.0)
    diameters = []
    for c in range(num_class):
        v = bank.verts[c][bank.vert_valid[c]]
        f = bank.faces[c][bank.face_valid[c]]
        col = bank.colors[c][bank.vert_valid[c]]
        for sub in ("models_eval", "models_1024"):
            write_ply(root / sub / f"obj_{c + 1:06d}.ply", v, f, col)
        diameters.append(float(np.linalg.norm(v[:, None] - v[None], axis=-1).max()))

    renderer = None
    if render_images:
        from scflow_tpu.render.renderer import Renderer

        renderer = Renderer(bank=bank, image_size=IMG_HW, chunk=16)

    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation

    scene_gt, scene_info, scene_cam, ref_gt = {}, {}, {}, {}
    img_list = []
    for img_id in range(num_images):
        anns, infos, refs = [], [], []
        poses = []
        for oi in range(num_class):
            R = Rotation.random(random_state=seed * 100 + img_id * 10 + oi).as_matrix()
            if num_class <= 4:
                t = np.array([(oi - 0.5) * 60, 0, 500.0 + 30 * oi])
            else:
                # >4 classes: 4-wide grid so every object stays in the
                # 120x160 frame (the line layout walks off the right edge)
                col, row = oi % 4, oi // 4
                nrow = (num_class + 3) // 4
                t = np.array([(col - 1.5) * 70,
                              (row - (nrow - 1) / 2) * 55,
                              500.0 + 12 * oi])
            poses.append((R, t))
            anns.append(dict(cam_R_m2c=R.reshape(-1).tolist(),
                             cam_t_m2c=t.tolist(), obj_id=oi + 1))
            dR = Rotation.from_euler(
                "xyz", rng.normal(size=3) * 6, degrees=True
            ).as_matrix()
            ref_R = dR @ R
            ref_t = t + rng.normal(size=3) * np.array([5, 5, 15])
            refs.append(dict(cam_R_m2c=ref_R.reshape(-1).tolist(),
                             cam_t_m2c=ref_t.tolist(), obj_id=oi + 1))
        if renderer is not None:
            Rb = np.stack([p[0] for p in poses]).astype(np.float32)
            tb = np.stack([p[1] for p in poses]).astype(np.float32)
            Kb = np.tile(K[None], (num_class, 1, 1))
            out = renderer(Rb, tb, Kb, np.arange(num_class))
            imgs = np.asarray(out["images"])
            masks_r = np.asarray(out["masks"])
            # composite objects into one image (per-object z not handled; ok
            # for non-overlapping translations)
            img = np.full((*IMG_HW, 3), 0.35, np.float32)
            full_masks = []
            for oi in range(num_class):
                m = masks_r[oi] > 0
                img[m] = imgs[oi][m]
                full_masks.append((m * 255).astype(np.uint8))
            img_u8 = (img[..., ::-1] * 255).astype(np.uint8)  # to BGR on disk
        else:
            img_u8 = rng.integers(0, 255, size=(*IMG_HW, 3), dtype=np.uint8)
            full_masks = []
            for oi, (R, t) in enumerate(poses):
                m = np.zeros(IMG_HW, np.uint8)
                c2d = K @ t
                cv2.circle(m, (int(c2d[0] / c2d[2]), int(c2d[1] / c2d[2])), 18, 255, -1)
                full_masks.append(m)
        cv2.imwrite(str(seq / "rgb" / f"{img_id:06d}.png"), img_u8)
        for oi, m in enumerate(full_masks):
            cv2.imwrite(str(seq / "mask_visib" / f"{img_id:06d}_{oi:06d}.png"), m)
            ys, xs = np.nonzero(m)
            x1, y1 = (int(xs.min()), int(ys.min())) if len(xs) else (0, 0)
            x2, y2 = (int(xs.max()), int(ys.max())) if len(xs) else (1, 1)
            infos.append(dict(bbox_obj=[x1, y1, x2 - x1, y2 - y1],
                              bbox_visib=[x1, y1, x2 - x1, y2 - y1],
                              visib_fract=1.0,
                              px_count_visib=int((m > 0).sum())))
        scene_gt[str(img_id)] = anns
        scene_info[str(img_id)] = infos
        scene_cam[str(img_id)] = dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0)
        ref_gt[str(img_id)] = refs
        img_list.append(f"000001/rgb/{img_id:06d}.png")

    (seq / "scene_gt.json").write_text(json.dumps(scene_gt))
    (seq / "scene_gt_info.json").write_text(json.dumps(scene_info))
    (seq / "scene_camera.json").write_text(json.dumps(scene_cam))
    (root / "image_lists" / "train.txt").write_text("\n".join(img_list))
    ref_dir = root / "initial_poses" / "000001"
    ref_dir.mkdir(parents=True, exist_ok=True)
    (ref_dir / "scene_gt.json").write_text(json.dumps(ref_gt))

    kps = []
    for c in range(num_class):
        v = bank.verts[c][bank.vert_valid[c]]
        mn, mx = v.min(0), v.max(0)
        kps.append([
            [float(x), float(y), float(z)]
            for x in (mn[0], mx[0]) for y in (mn[1], mx[1]) for z in (mn[2], mx[2])
        ])
    (root / "keypoints.json").write_text(json.dumps(kps))
    return dict(root=root, diameters=diameters, num_class=num_class)
