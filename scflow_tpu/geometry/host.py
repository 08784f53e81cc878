"""Host-side (numpy/cv2) pose utilities used by the data pipeline and eval —
kept on CPU deliberately: they run inside data workers / result formatting,
exactly where the reference keeps them (datasets/pose.py:18-119)."""

import warnings
import cv2
import numpy as np


def project_3d_point(pt3d, K, rotation, translation, transform_matrix=None,
                     return_3d=False):
    """(V, 3) mesh points -> 2D projections under K, R, t (single or batched
    over the leading axis of K/R/t)."""
    single = rotation.ndim == 2
    R = rotation[None] if single else rotation
    t = np.asarray(translation).reshape(-1, 3) if single else np.asarray(translation).reshape(len(rotation), 3)
    Kb = K[None] if K.ndim == 2 else K
    cam = np.einsum("nij,vj->nvi", R, pt3d) + t[:, None]
    uvw = np.einsum("nij,nvj->nvi", Kb, cam)
    if transform_matrix is not None:
        Tm = transform_matrix[None] if transform_matrix.ndim == 2 else transform_matrix
        uvw = np.einsum("nij,nvj->nvi", Tm, uvw)
    xy = uvw[..., :2] / (uvw[..., 2:3] + 1e-8)
    if single:
        xy, cam = xy[0], cam[0]
    if return_3d:
        return xy, cam
    return xy


def remap_pose(srcK, srcR, srcT, pt3d, dstK, transform_M):
    """Re-solve the pose under a new intrinsic + 2D transform via EPnP on the
    keypoints: dstK (R_new p + T_new) = transform_M srcK (srcR p + srcT)
    (reference datasets/pose.py:80-104)."""
    dst_2d = project_3d_point(pt3d, srcK, srcR, srcT, transform_matrix=transform_M)
    retval, rot, trans = cv2.solvePnP(
        pt3d.reshape(-1, 1, 3).astype(np.float64),
        dst_2d.reshape(-1, 1, 2).astype(np.float64),
        dstK.astype(np.float64),
        None,
        flags=cv2.SOLVEPNP_EPNP,
    )
    if retval:
        newR = cv2.Rodrigues(rot)[0].astype(np.float32)
        newT = trans.reshape(-1).astype(np.float32)
        reproj = project_3d_point(pt3d, dstK, newR, newT)
        diff_pix = float(np.linalg.norm(reproj - dst_2d, axis=1).mean())
        return newR, newT, diff_pix
    warnings.warn("Error in pose remapping; keeping source pose")
    return srcR, srcT, -1.0


def solve_pnp_ransac(points_3d, points_2d, K, reprojection_error=3.0,
                     iterations=100):
    """RANSAC-EPnP (reference models/utils/pose.py:203-249 'ransacpnp').
    Returns (R, t, ok)."""
    if len(points_2d) < 4:
        return None, None, False
    retval, rvec, tvec, _ = cv2.solvePnPRansac(
        points_3d.astype(np.float64),
        points_2d.astype(np.float64),
        K.astype(np.float64),
        None,
        flags=cv2.SOLVEPNP_EPNP,
        reprojectionError=reprojection_error,
        iterationsCount=iterations,
    )
    if not retval:
        return None, None, False
    R = cv2.Rodrigues(rvec)[0].astype(np.float32)
    t = tvec.reshape(-1).astype(np.float32)
    if np.isnan(R.sum()) or np.isnan(t.sum()):
        return None, None, False
    return R, t, True


def eval_rot_error(gt_r: np.ndarray, pred_r: np.ndarray) -> np.ndarray:
    cos = np.trace(np.matmul(pred_r, np.linalg.inv(gt_r)), axis1=1, axis2=2)
    cos = np.clip(0.5 * (cos - 1.0), -1.0, 1.0)
    return np.degrees(np.arccos(cos))


def eval_tran_error(gt_t: np.ndarray, pred_t: np.ndarray):
    error = np.linalg.norm(gt_t - pred_t, axis=-1)
    error_depth = np.abs(gt_t[:, -1] - pred_t[:, -1])
    error_xy = np.linalg.norm(gt_t[:, :2] - pred_t[:, :2], axis=-1)
    return error, error_depth, error_xy


def remap_pose_to_origin_resolution(
    pred_rotations, pred_translations, internal_k, meta_info
):
    """Remap patch-frame pose predictions back to the original image
    (reference models/utils/pose.py:264-309), one image's objects at a time.

    meta_info: dict with 'geometry_transform_mode', 'transform_matrix',
    'keypoints_3d', optionally 'ori_k'.
    """
    mode = meta_info["geometry_transform_mode"]
    if mode == "adapt_intrinsic":
        return pred_rotations, pred_translations
    tms = np.asarray(meta_info["transform_matrix"])
    inv_tms = np.linalg.inv(tms)
    kp3d = np.asarray(meta_info["keypoints_3d"])
    out_R, out_t = [], []
    for i in range(len(pred_rotations)):
        if mode == "target_intrinsic":
            dstK = np.asarray(meta_info["ori_k"])
        elif mode == "keep_intrinsic":
            dstK = internal_k[i]
        else:
            raise RuntimeError(mode)
        R, t, _ = remap_pose(
            internal_k[i], pred_rotations[i], pred_translations[i], kp3d[i],
            dstK, inv_tms[i],
        )
        out_R.append(R)
        out_t.append(t)
    return np.stack(out_R), np.stack(out_t)
