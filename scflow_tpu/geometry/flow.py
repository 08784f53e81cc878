"""Pose-induced optical flow and flow filtering — dense and batched.

The reference computes pose-induced flow by looping over images, lifting
ragged foreground point lists and scattering reprojections back into a flow
image (models/utils/pose.py:66-121).  Here every pixel is processed with a
validity mask: identical values at foreground pixels, `invalid_num` elsewhere,
no scatter, no host loop — XLA-friendly static shapes.
"""

from typing import Dict, Optional

import jax.numpy as jnp

from scflow_tpu.geometry.camera import coords_grid, lift_depth_to_object_points
from scflow_tpu.ops.sampling import grid_sample


def flow_from_object_points(
    points_obj: jnp.ndarray,
    valid: jnp.ndarray,
    R_dst: jnp.ndarray,
    t_dst: jnp.ndarray,
    K: jnp.ndarray,
    invalid_num: float = 400.0,
) -> jnp.ndarray:
    """Flow from precomputed dense object-frame points.

    points_obj: (N, H, W, 3); valid: (N, H, W) bool; R_dst: (N, 3, 3);
    t_dst: (N, 3); K: (N, 3, 3).  Returns flow (N, H, W, 2).

    Equivalent to the reference's per-image reproject+scatter
    `get_flow_from_delta_pose_and_points` (models/utils/pose.py:66-88).
    """
    n, h, w, _ = points_obj.shape
    pts_cam = jnp.einsum("nij,nhwj->nhwi", R_dst, points_obj) + t_dst[:, None, None, :]
    uvw = jnp.einsum("nij,nhwj->nhwi", K, pts_cam)
    # guard division at invalid pixels (z there is 0)
    z = jnp.where(valid[..., None], uvw[..., 2:3], 1.0)
    xy_dst = uvw[..., :2] / z
    grid = coords_grid(h, w, points_obj.dtype)[None]
    flow = xy_dst - grid
    return jnp.where(valid[..., None], flow, jnp.asarray(invalid_num, points_obj.dtype))


def flow_from_object_points_at(
    points_obj: jnp.ndarray,
    valid: jnp.ndarray,
    R_dst: jnp.ndarray,
    t_dst: jnp.ndarray,
    K: jnp.ndarray,
    pix: jnp.ndarray,
    invalid_num: float = 400.0,
) -> jnp.ndarray:
    """`flow_from_object_points` for points lifted at an explicit pixel
    (sub-)grid pix (h', w', 2).  Identical arithmetic, with pix standing in
    for the dense coords grid."""
    pts_cam = jnp.einsum("nij,nhwj->nhwi", R_dst, points_obj) + t_dst[:, None, None, :]
    uvw = jnp.einsum("nij,nhwj->nhwi", K, pts_cam)
    z = jnp.where(valid[..., None], uvw[..., 2:3], 1.0)
    xy_dst = uvw[..., :2] / z
    flow = xy_dst - pix[None]
    return jnp.where(valid[..., None], flow, jnp.asarray(invalid_num, points_obj.dtype))


def flow_from_pose_and_depth(
    R_src: jnp.ndarray,
    t_src: jnp.ndarray,
    R_dst: jnp.ndarray,
    t_dst: jnp.ndarray,
    depth_src: jnp.ndarray,
    K: jnp.ndarray,
    invalid_num: float = 400.0,
) -> jnp.ndarray:
    """Flow between two poses given the source rendered depth.

    Dense equivalent of `get_flow_from_delta_pose_and_depth`
    (models/utils/pose.py:92-121): lift source pixels with (R_src, t_src),
    reproject under (R_dst, t_dst).
    """
    points_obj, valid = lift_depth_to_object_points(depth_src, K, R_src, t_src)
    return flow_from_object_points(points_obj, valid, R_dst, t_dst, K, invalid_num)


def flow_to_coords(flow: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 2) flow -> absolute target coords (N, H, W, 2)."""
    n, h, w, _ = flow.shape
    return coords_grid(h, w, flow.dtype)[None] + flow


def _normalized_grid_from_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """Normalized [-1, 1] sampling grid at coords+flow, matching the
    reference's warp.coords_grid (models/utils/warp.py:9-28): scale by
    2/(size-1) regardless of align_corners."""
    n, h, w, _ = flow.shape
    coords = flow_to_coords(flow)
    gx = coords[..., 0] * 2.0 / max(w - 1, 1) - 1.0
    gy = coords[..., 1] * 2.0 / max(h - 1, 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def filter_flow_by_mask(
    flow: jnp.ndarray,
    gt_mask: jnp.ndarray,
    invalid_num: float = 400.0,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Invalidate flow whose target lands outside the target-image mask.

    flow: (N, H, W, 2); gt_mask: (N, H, W) {0,1}.  Mirrors
    models/utils/flow.py:6-26 (bilinear mask sampling, <0.9 -> invalid).
    """
    grid = _normalized_grid_from_flow(flow)
    sampled = grid_sample(
        gt_mask[..., None].astype(flow.dtype),
        grid,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )[..., 0]
    already_invalid = (flow[..., 0] >= invalid_num) & (flow[..., 1] >= invalid_num)
    bad = (sampled < 0.9) | already_invalid
    return jnp.where(bad[..., None], jnp.asarray(invalid_num, flow.dtype), flow)


def filter_flow_by_depth(
    flow: jnp.ndarray,
    depth1: jnp.ndarray,
    depth0: jnp.ndarray,
    invalid_num: float = 400.0,
    thr: float = 0.2,
) -> jnp.ndarray:
    """Depth-consistency flow filtering (models/utils/flow.py:28-45).

    flow maps image0 -> image1; pixels whose warped depth1 disagrees with
    depth0 by more than `thr` (relative) are invalidated.

    NOTE the reference combines with `not_valid & ~consistent`
    (flow.py:42) — an AND that can only re-invalidate already-invalid
    pixels, making its filter a silent no-op (contradicting the LoFTR
    source it cites).  We implement the documented intent (`| ~consistent`,
    matching the sister filters); the shipped configs leave
    filter_invalid_flow_by_depth=False either way.
    """
    grid = _normalized_grid_from_flow(flow)
    d1 = jnp.where(depth1 > 0, depth1, 0.0)
    d0 = jnp.where(depth0 > 0, depth0, 0.0)
    warped = grid_sample(
        d1[..., None], grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )[..., 0]
    consistent = jnp.abs(d0 - warped) / (d0 + 0.1) < thr
    already_invalid = (flow[..., 0] >= invalid_num) & (flow[..., 1] >= invalid_num)
    bad = already_invalid | (~consistent)
    return jnp.where(bad[..., None], jnp.asarray(invalid_num, flow.dtype), flow)


def filter_flow_by_face_index(
    flow: jnp.ndarray,
    face_index1: jnp.ndarray,
    face_index2: jnp.ndarray,
    invalid_num: float = 400.0,
) -> jnp.ndarray:
    """Invalidate flow whose warped target face id disagrees with the source
    face id (models/utils/flow.py:47-59; nearest sampling)."""
    grid = _normalized_grid_from_flow(flow)
    warped = grid_sample(
        face_index2[..., None].astype(flow.dtype), grid,
        mode="nearest", padding_mode="zeros", align_corners=True,
    )[..., 0]
    consistent = warped == face_index1.astype(flow.dtype)
    already_invalid = (flow[..., 0] >= invalid_num) & (flow[..., 1] >= invalid_num)
    bad = already_invalid | (~consistent)
    return jnp.where(bad[..., None], jnp.asarray(invalid_num, flow.dtype), flow)


def cal_epe(
    flow_tgt: jnp.ndarray,
    flow_pred: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    max_flow: float = 400.0,
    reduction: str = "mean",
    threshs=(1, 3, 5),
):
    """End-point error + accuracy-at-threshold (models/utils/flow.py:64-88).

    flow_*: (N, H, W, 2); mask: (N, H, W) or None.
    """
    mag = jnp.sqrt(jnp.sum(flow_tgt**2, axis=-1))
    valid = mag < max_flow
    if mask is not None:
        valid = valid & (mask >= 0.5)
    err = jnp.sqrt(jnp.sum((flow_tgt - flow_pred) ** 2, axis=-1))
    validf = valid.astype(err.dtype)
    if reduction == "none":
        return err * validf
    out: Dict[str, jnp.ndarray] = {}
    if reduction == "mean":
        total = validf.sum(axis=(-1, -2)) + 1e-10
        out["mean"] = (err * validf).sum(axis=(-1, -2)) / total
        err_masked = jnp.where(valid, err, jnp.inf)
        for t in threshs:
            out[f"{t}px"] = (err_masked < t).sum(axis=(-1, -2)) / total
    elif reduction == "total_mean":
        total = validf.sum() + 1e-10
        out["mean"] = (err * validf).sum() / total
        err_masked = jnp.where(valid, err, jnp.inf)
        for t in threshs:
            out[f"{t}px"] = (err_masked < t).sum() / total
    else:
        raise ValueError(reduction)
    return out
