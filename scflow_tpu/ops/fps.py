"""Farthest point sampling (numpy) — replaces the CUDA
mmcv.ops.furthest_point_sample used by the offline keypoint tool
(reference tools/collect_3d_keypoints.py:9,41)."""

import numpy as np


def farthest_point_sample(points: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """points (N, 3) -> indices (k,) of FPS-selected points; O(k*N)."""
    n = len(points)
    if k >= n:
        return np.arange(n)
    rng = np.random.default_rng(seed)
    idx = np.zeros(k, np.int64)
    idx[0] = rng.integers(n)
    dist = np.linalg.norm(points - points[idx[0]], axis=-1)
    for i in range(1, k):
        idx[i] = int(np.argmax(dist))
        dist = np.minimum(dist, np.linalg.norm(points - points[idx[i]], axis=-1))
    return idx
