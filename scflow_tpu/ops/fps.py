"""Farthest point sampling (numpy) — replaces the CUDA
mmcv.ops.furthest_point_sample used by the offline keypoint tool
(reference tools/collect_3d_keypoints.py:9,41)."""

import numpy as np


def farthest_point_sample(points: np.ndarray, k: int) -> np.ndarray:
    """points (N, 3) -> indices (k,) of FPS-selected points; O(k*N).

    Starts from point 0 like the CUDA op (mmcv furthest_point_sample seeds
    idxs[0] = 0), so keypoints are reproducible against reference-generated
    assets.  k == N returns arange(N); k > N is an error (there is no valid
    FPS of that size, and silently returning fewer indices would break
    fixed-size keypoint banks downstream).
    """
    n = len(points)
    if k > n:
        raise ValueError(f"cannot FPS-sample {k} points from {n}")
    if k == n:
        return np.arange(n)
    idx = np.zeros(k, np.int64)
    dist = np.linalg.norm(points - points[idx[0]], axis=-1)
    for i in range(1, k):
        idx[i] = int(np.argmax(dist))
        dist = np.minimum(dist, np.linalg.norm(points - points[idx[i]], axis=-1))
    return idx
