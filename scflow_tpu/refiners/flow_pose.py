"""Pose recovery from predicted flow via 2D-3D correspondences + RANSAC PnP
(the RAFT-baseline test path; reference models/refiner/base_flow_refiner.py:
99-155).  Correspondence extraction is vectorized numpy on host; PnP is cv2
per object (exactly where the reference keeps it)."""

from typing import Dict, Optional

import numpy as np

from scflow_tpu.geometry.host import solve_pnp_ransac


def _lift_points(depth, K, R, t):
    ys, xs = np.nonzero(depth > 0)
    d = depth[ys, xs]
    homo = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64) * d[:, None]
    cam = (np.linalg.inv(K.astype(np.float64)) @ homo.T).T
    obj = (R.astype(np.float64).T @ (cam - t).T).T
    return np.stack([xs, ys], -1).astype(np.float32), obj.astype(np.float32)


def solve_poses_from_flow(
    flow: np.ndarray,  # (N, H, W, 2)
    rendered_depths: np.ndarray,  # (N, H, W)
    ref_rotations: np.ndarray,  # (N, 3, 3)
    ref_translations: np.ndarray,  # (N, 3)
    internal_k: np.ndarray,  # (N, 3, 3)
    occlusion: Optional[np.ndarray] = None,  # (N, H, W)
    occ_thresh: float = 0.5,
    sample_points: Optional[Dict] = None,  # {'num':..., 'mode':'random'|'topk'}
    reprojection_error: float = 3.0,
    iterations: int = 100,
    rng: Optional[np.random.Generator] = None,
):
    """Returns (rotations (N,3,3), translations (N,3), ok (N,) bool); failed
    PnP keeps the reference pose (base_flow_refiner.py:129-136)."""
    rng = rng or np.random.default_rng(0)
    n = len(flow)
    out_r = np.array(ref_rotations, np.float32, copy=True)
    out_t = np.array(ref_translations, np.float32, copy=True)
    ok = np.zeros(n, bool)
    for i in range(n):
        depth = np.asarray(rendered_depths[i])
        valid = depth > 0
        if occlusion is not None:
            valid = valid & (np.asarray(occlusion[i]) > occ_thresh)
        d = np.where(valid, depth, 0.0)
        p2d, p3d = _lift_points(d, internal_k[i], ref_rotations[i], ref_translations[i])
        if len(p2d) < 4:
            continue
        f = np.asarray(flow[i])[p2d[:, 1].astype(int), p2d[:, 0].astype(int)]
        tgt2d = p2d + f
        if sample_points is not None and len(p2d) > sample_points.get("num", 1000):
            num = sample_points.get("num", 1000)
            if sample_points.get("mode", "random") == "topk" and occlusion is not None:
                conf = np.asarray(occlusion[i])[
                    p2d[:, 1].astype(int), p2d[:, 0].astype(int)
                ]
                idx = np.argsort(-conf)[:num]
            else:
                # len-1 is the reference's own off-by-one (randperm(n-1),
                # base_flow_refiner.py:54): the last correspondence can
                # never be drawn — replicated for sampling parity
                idx = rng.permutation(len(p2d) - 1)[:num]
            tgt2d, p3d = tgt2d[idx], p3d[idx]
        R, t, ret = solve_pnp_ransac(
            p3d, tgt2d, internal_k[i],
            reprojection_error=reprojection_error, iterations=iterations,
        )
        if ret:
            out_r[i], out_t[i], ok[i] = R, t, True
    return out_r, out_t, ok
