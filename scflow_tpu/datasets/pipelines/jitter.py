"""Pose jitter: gaussian rotation/translation noise with rejection sampling
under angle/translation/ADD caps (reference datasets/pipelines/jitter.py).

Deviations from the reference (recorded in SURVEY.md §2.4):
- item 5: the reference asserts on an unbound `mesh_vertices`; here the
  add_limit branch is implemented correctly (vertices subsampled from
  mesh_dir).
- item 9: the reference swaps rot/trans errors when unpacking; here
  init_rot_error / init_trans_error carry what their names say.
"""

import numpy as np
from scipy.spatial.transform import Rotation

from scflow_tpu.registry import PIPELINES
from scflow_tpu.render.ply import load_ply


def rot_error_deg(r1: np.ndarray, r2: np.ndarray) -> float:
    cos = (np.trace(r2 @ np.linalg.inv(r1)) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


@PIPELINES.register_module("PoseJitter")
class PoseJitter:
    def __init__(
        self,
        jitter_angle_dis,
        jitter_x_dis,
        jitter_y_dis,
        jitter_z_dis,
        jitter_pose_field,
        jittered_pose_field,
        add_limit=None,
        translation_limit=None,
        angle_limit=None,
        mesh_dir=None,
        mesh_diameter=None,
        max_attempts=200,
    ):
        self.angle_dis = jitter_angle_dis
        self.x_dis, self.y_dis, self.z_dis = jitter_x_dis, jitter_y_dis, jitter_z_dis
        self.src_field = jitter_pose_field
        self.dst_field = jittered_pose_field
        self.angle_limit = angle_limit
        self.translation_limit = translation_limit
        self.add_limit = add_limit
        self.max_attempts = max_attempts
        self.mesh_vertices = None
        if add_limit is not None:
            assert mesh_dir is not None and mesh_diameter is not None
            import glob
            from os import path as osp

            paths = sorted(glob.glob(osp.join(mesh_dir, "*.ply")))
            verts = [load_ply(p).vertices for p in paths]
            self.mesh_vertices = [
                v[np.random.choice(v.shape[0], 1000)] for v in verts
            ]
            self.mesh_diameters = mesh_diameter

    def jitter(self, rotation, translation, label):
        for _ in range(self.max_attempts):
            angle = np.random.normal(self.angle_dis[0], self.angle_dis[1], size=3)
            dR = Rotation.from_euler("zyx", angle, degrees=True).as_matrix().astype(np.float32)
            jr = dR @ rotation
            rot_err = rot_error_deg(rotation, jr)
            if self.angle_limit is not None and rot_err > self.angle_limit:
                continue
            noise = np.array(
                [
                    np.random.normal(self.x_dis[0], self.x_dis[1]),
                    np.random.normal(self.y_dis[0], self.y_dis[1]),
                    np.random.normal(self.z_dis[0], self.z_dis[1]),
                ],
                np.float32,
            )
            trans_err = float(np.linalg.norm(noise))
            if self.translation_limit is not None and trans_err > self.translation_limit:
                continue
            jt = translation + noise
            add_err = 0.0
            if self.add_limit is not None:
                verts = self.mesh_vertices[label]
                gt_pts = (rotation @ verts.T + translation[:, None]).T
                ref_pts = (jr @ verts.T + jt[:, None]).T
                add_err = float(
                    np.linalg.norm(gt_pts - ref_pts, axis=-1).mean()
                    / self.mesh_diameters[label]
                )
                if add_err > self.add_limit:
                    continue
            return jr, jt, add_err, rot_err, trans_err
        # caps too tight: fall back to the unjittered pose
        return rotation.copy(), translation.copy(), 0.0, 0.0, 0.0

    def __call__(self, results):
        rotations = results[self.src_field[0]]
        translations = results[self.src_field[1]]
        labels = results["labels"]
        n = len(rotations)
        jrs, jts, adds, rots, transs = [], [], [], [], []
        for i in range(n):
            jr, jt, add_e, rot_e, trans_e = self.jitter(
                rotations[i], translations[i], labels[i]
            )
            jrs.append(jr); jts.append(jt)
            adds.append(add_e); rots.append(rot_e); transs.append(trans_e)
        results[self.dst_field[0]] = np.stack(jrs)
        results[self.dst_field[1]] = np.stack(jts)
        results["init_add_error"] = np.asarray(adds, np.float32)
        results["init_rot_error"] = np.asarray(rots, np.float32)
        results["init_trans_error"] = np.asarray(transs, np.float32)
        return results
