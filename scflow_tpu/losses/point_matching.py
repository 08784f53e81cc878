"""Point-matching pose losses over padded per-class vertex banks.

Reference: models/loss/point_matching_loss.py (PointMatching, Disentangle
[GDR-Net style], RotPointMatching).  TPU-first: the per-image Python loop and
pytorch3d `knn_points` become a vmapped batch with a brute-force NN matmul
over fixed-size padded banks (SURVEY.md §2.3).

Vertex bank layout:
  points_bank:  (C, V, 3)  per-class mesh vertices, zero-padded to V
  points_valid: (C, V)     bool padding mask
  sym_mask:     (C,)       bool, class is symmetric (NN-matched loss)
  diameters:    (C,)       mesh diameter normalizer
"""

import jax.numpy as jnp

from scflow_tpu.ops.knn import nn_points


def sym_mask_from_types(symmetry_types: dict, num_class: int) -> jnp.ndarray:
    """{'cls_13': {...}, ...} (1-based, as the reference configs) -> (C,) bool."""
    import numpy as np

    m = np.zeros((num_class,), bool)
    for k in symmetry_types:
        idx = int(k.split("_")[-1]) - 1
        if 0 <= idx < num_class:
            m[idx] = True
    return jnp.asarray(m)


def _vnorm(diff: jnp.ndarray, loss_type: int) -> jnp.ndarray:
    """torch.linalg.norm(dim=-1, ord=loss_type): 1 -> sum|x|, 2 -> sqrt(sum x^2)."""
    if loss_type == 1:
        return jnp.sum(jnp.abs(diff), axis=-1)
    return jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    vf = valid.astype(x.dtype)
    return (x * vf).sum(axis=-1) / jnp.maximum(vf.sum(axis=-1), 1.0)


def _gather(bank, labels):
    return jnp.take(bank, labels, axis=0)


def _scale_translations(pred_t, gt_t, scale_factors, scale_xy, scale_depth, scale_depth_factor):
    sp, sg = pred_t, gt_t
    if scale_xy:
        sp = sp.at[..., :2].set(pred_t[..., :2] * scale_factors[:, None])
        sg = sg.at[..., :2].set(gt_t[..., :2] * scale_factors[:, None])
    if scale_depth:
        sp = sp.at[..., 2].set(pred_t[..., 2] * scale_factors * scale_depth_factor)
        sg = sg.at[..., 2].set(gt_t[..., 2] * scale_factors * scale_depth_factor)
    else:
        sp = sp.at[..., 2].set(pred_t[..., 2] * scale_depth_factor)
        sg = sg.at[..., 2].set(gt_t[..., 2] * scale_depth_factor)
    return sp, sg


def point_matching_loss(
    pred_r: jnp.ndarray,
    pred_t: jnp.ndarray,
    gt_r: jnp.ndarray,
    gt_t: jnp.ndarray,
    labels: jnp.ndarray,
    points_bank: jnp.ndarray,
    points_valid: jnp.ndarray,
    sym_mask: jnp.ndarray,
    diameters: jnp.ndarray,
    loss_type: int = 2,
    loss_weight: float = 1.0,
    scale_factors: jnp.ndarray = None,
    scale_xy: bool = False,
    scale_depth: bool = False,
    scale_depth_factor: float = 1.0,
) -> jnp.ndarray:
    """ADD(-S)-style loss (point_matching_loss.py:62-103), batch-vectorized."""
    pts = _gather(points_bank, labels)  # (N, V, 3)
    valid = _gather(points_valid, labels)  # (N, V)
    sym = _gather(sym_mask, labels)  # (N,)
    diam = _gather(diameters, labels)  # (N,)
    sp, sg = _scale_translations(
        pred_t, gt_t, scale_factors, scale_xy, scale_depth, scale_depth_factor
    )

    pred = jnp.einsum("nij,nvj->nvi", pred_r, pts) + sp[:, None]
    target = jnp.einsum("nij,nvj->nvi", gt_r, pts) + sg[:, None]

    # symmetric branch: match each target point to its nearest pred point
    idx, _ = nn_points(target, pred, ref_valid=valid)
    pred_matched = jnp.take_along_axis(pred, idx[..., None], axis=1)
    pred_eff = jnp.where(sym[:, None, None], pred_matched, pred)

    per_pt = _vnorm(pred_eff - target, loss_type)  # (N, V)
    per_img = _masked_mean(per_pt, valid) / diam
    return loss_weight * per_img.mean()


def disentangle_point_matching_loss(
    pred_r: jnp.ndarray,
    pred_t: jnp.ndarray,
    gt_r: jnp.ndarray,
    gt_t: jnp.ndarray,
    labels: jnp.ndarray,
    points_bank: jnp.ndarray,
    points_valid: jnp.ndarray,
    sym_mask: jnp.ndarray,
    diameters: jnp.ndarray,
    loss_type: int = 1,
    disentangle_z: bool = True,
    loss_weight: float = 1.0,
    scale_factors: jnp.ndarray = None,
    scale_xy: bool = False,
    scale_depth: bool = False,
    scale_depth_factor: float = 1.0,
) -> jnp.ndarray:
    """Disentangled PM loss (point_matching_loss.py:160-218): rotation term
    uses pred R + gt t (NN-matched for symmetric classes); translation split
    into z (pred z, gt rot/xy) and xy (pred xy, gt rot/z) terms."""
    pts = _gather(points_bank, labels)
    valid = _gather(points_valid, labels)
    sym = _gather(sym_mask, labels)
    diam = _gather(diameters, labels)
    sp, sg = _scale_translations(
        pred_t, gt_t, scale_factors, scale_xy, scale_depth, scale_depth_factor
    )

    pts_gt_rot = jnp.einsum("nij,nvj->nvi", gt_r, pts)
    pts_gt_rt = pts_gt_rot + sg[:, None]

    # rotation term
    pts_pred_rot = jnp.einsum("nij,nvj->nvi", pred_r, pts) + sg[:, None]
    idx, _ = nn_points(pts_gt_rt, pts_pred_rot, ref_valid=valid)
    matched = jnp.take_along_axis(pts_pred_rot, idx[..., None], axis=1)
    pts_pred_rot_eff = jnp.where(sym[:, None, None], matched, pts_pred_rot)
    loss_rot = _masked_mean(_vnorm(pts_pred_rot_eff - pts_gt_rt, loss_type), valid)

    if disentangle_z:
        t_pred_z = jnp.concatenate([sg[..., :2], sp[..., 2:3]], axis=-1)
        loss_z = _masked_mean(
            _vnorm(pts_gt_rot + t_pred_z[:, None] - pts_gt_rt, loss_type), valid
        )
        t_pred_xy = jnp.concatenate([sp[..., :2], sg[..., 2:3]], axis=-1)
        loss_xy = _masked_mean(
            _vnorm(pts_gt_rot + t_pred_xy[:, None] - pts_gt_rt, loss_type), valid
        )
        loss_trans = loss_z + loss_xy
    else:
        loss_trans = _masked_mean(
            _vnorm(pts_gt_rot + sp[:, None] - pts_gt_rt, loss_type), valid
        )

    per_img = (loss_rot + loss_trans) / diam
    return loss_weight * per_img.mean()


def rot_point_matching_loss(
    pred_r: jnp.ndarray,
    gt_r: jnp.ndarray,
    labels: jnp.ndarray,
    points_bank: jnp.ndarray,
    points_valid: jnp.ndarray,
    sym_mask: jnp.ndarray,
    diameters: jnp.ndarray,
    loss_type: int = 2,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Rotation-only PM loss (point_matching_loss.py:222-291)."""
    pts = _gather(points_bank, labels)
    valid = _gather(points_valid, labels)
    sym = _gather(sym_mask, labels)
    diam = _gather(diameters, labels)
    pred = jnp.einsum("nij,nvj->nvi", pred_r, pts)
    target = jnp.einsum("nij,nvj->nvi", gt_r, pts)
    idx, _ = nn_points(target, pred, ref_valid=valid)
    matched = jnp.take_along_axis(pred, idx[..., None], axis=1)
    pred_eff = jnp.where(sym[:, None, None], matched, pred)
    per_img = _masked_mean(_vnorm(pred_eff - target, loss_type), valid) / diam
    return loss_weight * per_img.mean()
