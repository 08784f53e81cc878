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


def solve_poses_from_flow_device(
    flow,  # (N, H, W, 2) jnp
    rendered_depths,  # (N, H, W)
    ref_rotations,  # (N, 3, 3)
    ref_translations,  # (N, 3)
    internal_k,  # (N, 3, 3)
    occlusion=None,  # (N, H, W) confidence
    occ_thresh: float = 0.5,
    num_points: int = 1024,
    num_hypotheses: int = 64,
    reprojection_error: float = 3.0,
    key=None,
):
    """TPU-native pose recovery from flow: fixed-shape batched RANSAC PnP
    inside the graph (geometry/pnp.py), replacing the per-object host cv2
    loop the reference runs (base_flow_refiner.py:99-155).  Jittable; no
    device->host round trip, so eval stays on-chip end to end.

    Selection: the `num_points` highest-confidence valid pixels (occlusion
    confidence when predicted, otherwise a fixed pseudo-random score — a
    deterministic spatially-uniform subsample).  Failed solves keep the
    reference pose, as the host path does.

    The solver runs general DLT and a planar-homography decomposition side
    by side and keeps whichever reprojects better (geometry/pnp.py
    `best_of_both`), so (near-)coplanar point sets — where plain DLT is
    rank-deficient — solve correctly too.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    from scflow_tpu.geometry.camera import (coords_grid,
                                            lift_depth_to_object_points)
    from scflow_tpu.geometry.pnp import solve_pnp_ransac_jax

    n, h, w = rendered_depths.shape
    pts_obj, valid = lift_depth_to_object_points(
        rendered_depths, internal_k, ref_rotations, ref_translations)
    if occlusion is not None:
        valid = valid & (occlusion > occ_thresh)
        score = occlusion
    else:
        # fixed pseudo-random tie-break: top_k over a constant would pick
        # raster-order pixels (spatially biased toward the top rows)
        score = jax.random.uniform(jax.random.PRNGKey(7), (h, w))[None]
        score = jnp.broadcast_to(score, (n, h, w))
    score = jnp.where(valid, score.astype(flow.dtype), -jnp.inf)

    grid = coords_grid(h, w, flow.dtype)  # (H, W, 2) in (x, y)
    tgt = grid[None] + flow  # (N, H, W, 2)

    flat_score = score.reshape(n, h * w)
    _, idx = jax.lax.top_k(flat_score, num_points)  # (N, P)
    take = lambda a: jnp.take_along_axis(
        a.reshape(n, h * w, a.shape[-1]), idx[..., None], axis=1)
    p3d = take(pts_obj)
    p2d = take(tgt)
    val_sel = jnp.take_along_axis(valid.reshape(n, h * w), idx, axis=1)

    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    solver = jax.vmap(partial(
        solve_pnp_ransac_jax,
        num_hypotheses=num_hypotheses,
        inlier_thresh_px=reprojection_error,
    ))
    res = solver(p3d, p2d, internal_k, val_sel, keys)
    ok = res.ok & (val_sel.sum(axis=1) >= 4)
    R = jnp.where(ok[:, None, None], res.rotation, ref_rotations)
    t = jnp.where(ok[:, None], res.translation, ref_translations)
    return R, t, ok
