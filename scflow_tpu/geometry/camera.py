"""Pinhole camera ops — dense, batched, static-shaped.

The reference lifts only foreground pixels into ragged per-image point lists
(models/utils/pose.py:44-64) and loops over images.  On TPU we lift *every*
pixel with a validity mask instead: static shapes, no host sync, fully
vectorized (SURVEY.md §7.1).
"""

from typing import Optional, Tuple

import jax.numpy as jnp


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of pixel-center coordinates in (x, y) order."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([grid_x, grid_y], axis=-1)


def project_points(
    points: jnp.ndarray,
    K: jnp.ndarray,
    R: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
    eps: float = 0.0,
) -> jnp.ndarray:
    """Project 3D points to pixels.

    points: (..., P, 3) in object frame if R/t given, else camera frame.
    K: (..., 3, 3); R: (..., 3, 3); t: (..., 3).
    Returns (..., P, 2) pixel coordinates (x, y).

    Mirrors the reprojection in the reference's pose-induced flow
    (models/utils/pose.py:82-84).
    """
    if R is not None:
        points = jnp.einsum("...ij,...pj->...pi", R, points) + t[..., None, :]
    uvw = jnp.einsum("...ij,...pj->...pi", K, points)
    return uvw[..., :2] / (uvw[..., 2:3] + eps)


def lift_depth_to_object_points(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense unprojection of a rendered depth map into the object frame.

    depth: (N, H, W) (zeros = background);  K, R: (N, 3, 3);  t: (N, 3).
    Returns (points_obj (N, H, W, 3), valid (N, H, W) bool).

    Dense-TPU equivalent of the reference `cal_3d_2d_corr` + `lift_2d_to_3d`
    (models/utils/pose.py:26-64): X_cam = depth * K^-1 [x, y, 1]^T, then
    X_obj = R^T (X_cam - t).
    """
    n, h, w = depth.shape
    grid = coords_grid(h, w, depth.dtype)  # (H, W, 2)
    homo = jnp.concatenate([grid, jnp.ones((h, w, 1), depth.dtype)], axis=-1)
    K_inv = jnp.linalg.inv(K)  # (N, 3, 3)
    rays = jnp.einsum("nij,hwj->nhwi", K_inv, homo)  # (N, H, W, 3)
    points_cam = rays * depth[..., None]
    # R is orthonormal: inverse == transpose
    points_obj = jnp.einsum("nji,nhwj->nhwi", R, points_cam - t[:, None, None, :])
    valid = depth > 0
    return points_obj, valid


def lift_depth_to_object_points_at(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    pix: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`lift_depth_to_object_points` at an explicit (sub-)grid of pixels.

    depth: (N, h', w') sampled at pixel coordinates pix (h', w', 2) in
    (x, y) order.  Same arithmetic as the dense variant — used to lift only
    the pixels a later bilinear downsample will read (scflow_decoder.py's
    in-loop low-res pose flow)."""
    hp, wp, _ = pix.shape
    homo = jnp.concatenate(
        [pix, jnp.ones((hp, wp, 1), depth.dtype)], axis=-1
    )
    K_inv = jnp.linalg.inv(K)
    rays = jnp.einsum("nij,hwj->nhwi", K_inv, homo)
    points_cam = rays * depth[..., None]
    points_obj = jnp.einsum("nji,nhwj->nhwi", R, points_cam - t[:, None, None, :])
    valid = depth > 0
    return points_obj, valid
