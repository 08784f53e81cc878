"""On-device serving pipeline: full camera frames + initial poses -> refined
poses, with ALL preprocessing on the TPU (BASELINE config 5).

The offline pipeline (datasets/pipelines) runs numpy/cv2 on the host; for
serving, that round trip disappears:

  1. object bboxes: project each object's padded vertex bank under its
     initial pose (one einsum), min/max the valid projections
  2. square crop boxes (scale margin, reference Crop semantics)
  3. patch extraction: axis-aligned crop+resize as two separable tent-weight
     matmuls per patch (MXU work, no gathers — the corr-lookup trick)
  4. intrinsics adapted per patch (K' = T K, 'adapt_intrinsic' mode), so
     refined poses are already in the original camera frame — no host remap
  5. render at the initial pose (fused Pallas raster+shade on TPU) and run
     the SCFlow recurrence, optionally in bf16

Everything is one jit; scale-out is the standard data-parallel mesh (shard
the patch batch, replicate params).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from scflow_tpu.refiners.system import RenderAssets, render_and_normalize


def project_bboxes(
    points_bank: jnp.ndarray,  # (C, V, 3) vertex bank (losses/eval bank is fine)
    valid_bank: jnp.ndarray,  # (C, V)
    rotations: jnp.ndarray,  # (P, 3, 3)
    translations: jnp.ndarray,  # (P, 3)
    K: jnp.ndarray,  # (P, 3, 3)
    labels: jnp.ndarray,  # (P,)
) -> jnp.ndarray:
    """xyxy bboxes of the projected meshes (ComputeBbox, on device)."""
    pts = jnp.take(points_bank, labels, axis=0)
    valid = jnp.take(valid_bank, labels, axis=0)
    cam = jnp.einsum("pij,pvj->pvi", rotations, pts) + translations[:, None]
    uvw = jnp.einsum("pij,pvj->pvi", K, cam)
    xy = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-6)
    big = jnp.float32(1e9)
    x = jnp.where(valid, xy[..., 0], big)
    y = jnp.where(valid, xy[..., 1], big)
    x1 = x.min(axis=1)
    y1 = y.min(axis=1)
    x = jnp.where(valid, xy[..., 0], -big)
    y = jnp.where(valid, xy[..., 1], -big)
    x2 = x.max(axis=1)
    y2 = y.max(axis=1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _tent_matrix(src_start, src_step, n_out: int, n_in: int, dtype):
    """(P, n_out, n_in) bilinear interpolation matrices for uniform sampling
    at src_start + i*src_step (per patch)."""
    i = jnp.arange(n_out, dtype=dtype)
    src = src_start[:, None] + i[None, :] * src_step[:, None]  # (P, n_out)
    j = jnp.arange(n_in, dtype=dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - j[None, None, :]))
    return w  # zero outside [0, n_in-1]: border pixels fade to 0 (pad black)


def crop_resize_patches(
    frames: jnp.ndarray,  # (I, Hf, Wf, 3) float images (0..1 or 0..255)
    boxes: jnp.ndarray,  # (P, 4) xyxy crop boxes (may exceed frame)
    frame_idx: jnp.ndarray,  # (P,) which frame each patch comes from
    K: jnp.ndarray,  # (P, 3, 3) per-patch source intrinsics
    out_size: int = 256,
    margin: float = 1.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Square crop (max side * margin, centered) + resize to out_size, as two
    separable tent matmuls; returns (patches (P, S, S, 3), K' (P, 3, 3))."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    side = jnp.maximum(x2 - x1, y2 - y1) * margin
    sx1 = cx - side / 2
    sy1 = cy - side / 2
    step = side / out_size
    # sample positions at pixel centers of the output grid
    wx = _tent_matrix(sx1 + 0.5 * step - 0.5, step, out_size, frames.shape[2], frames.dtype)
    wy = _tent_matrix(sy1 + 0.5 * step - 0.5, step, out_size, frames.shape[1], frames.dtype)
    imgs = jnp.take(frames, frame_idx, axis=0)  # (P, Hf, Wf, 3) row gather
    tmp = jnp.einsum("poh,phwc->powc", wy, imgs)
    patches = jnp.einsum("pqw,powc->poqc", wx, tmp)

    scale = out_size / side
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    # T = scale о translate(-sx1, -sy1), applied at output pixel centers:
    # x' = (x - sx1 - 0.5*step + 0.5*step) * scale ... = (x - sx1) * scale - 0.5*(1 - scale*step)...
    # with step = 1/scale the affine is exactly x' = (x - sx1)*scale + 0.5*scale*step - 0.5
    off = 0.5 * scale * step - 0.5  # = 0 by construction (scale*step == 1)
    T = jnp.stack(
        [
            jnp.stack([scale, zeros, -sx1 * scale + off], -1),
            jnp.stack([zeros, scale, -sy1 * scale + off], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=1,
    )  # (P, 3, 3)
    new_K = T @ K
    return patches, new_K


def make_raft_serving_fn(
    model,
    render_assets: RenderAssets,
    points_bank: jnp.ndarray,
    valid_bank: jnp.ndarray,
    image_size: int = 256,
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    margin: float = 1.1,
    iters: Optional[int] = None,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "auto",
    pnp_backend: str = "host",
    pnp_cfg=None,
):
    """RAFT-family serving: same device-side preprocessing as the SCFlow
    path, but the network outputs flow (+occlusion), and the pose comes
    from host PnP downstream (`flow_pose.solve_poses_from_flow`, as in the
    reference's test path, raft_refiner_flow.py:141-169).  The returned
    dict carries everything that host stage needs; poses solved with the
    adapted intrinsics are already in the original camera frame.

    pnp_backend='device' solves the pose in-graph instead
    (`flow_pose.solve_poses_from_flow_device`), making the whole serve one
    jit with direct rotations/translations output (DLT-based — see that
    function's planar-degeneracy note)."""
    pnp_cfg = dict(pnp_cfg or {})

    @jax.jit
    def serve(variables, frames, frame_idx, ref_rotations, ref_translations,
              K, labels):
        boxes = project_bboxes(
            points_bank, valid_bank, ref_rotations, ref_translations, K, labels
        )
        patches, newK = crop_resize_patches(
            frames, boxes, frame_idx, K, image_size, margin
        )
        mean = jnp.asarray(norm_mean, jnp.float32) / 255.0
        std = jnp.asarray(norm_std, jnp.float32) / 255.0
        real_images = (patches - mean) / std
        rendered_images, rendered_depths, _ = render_and_normalize(
            render_assets, ref_rotations, ref_translations, newK, labels,
            (image_size, image_size), norm_mean, norm_std,
            backend=render_backend,
            cull_backfaces=render_cull_backfaces,
        )
        out = model.apply(
            variables, rendered_images, real_images, iters=iters,
            train=False, lookup_backend=lookup_backend,
        )
        res = {
            "flow": out["flow"][-1],
            "rendered_depths": rendered_depths,
            "new_k": newK,
            "ref_rotations": ref_rotations,
            "ref_translations": ref_translations,
        }
        if "occlusion" in out:
            res["occlusion"] = out["occlusion"][-1]
        if pnp_backend == "device":
            from scflow_tpu.refiners.flow_pose import \
                solve_poses_from_flow_device

            R, t, ok = solve_poses_from_flow_device(
                res["flow"], rendered_depths, ref_rotations,
                ref_translations, newK, occlusion=res.get("occlusion"),
                **pnp_cfg,
            )
            res.update({"rotations": R, "translations": t, "pnp_ok": ok})
        return res

    return serve


def make_serving_fn(
    model,
    render_assets: RenderAssets,
    points_bank: jnp.ndarray,
    valid_bank: jnp.ndarray,
    image_size: int = 256,
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    margin: float = 1.1,
    iters: Optional[int] = None,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "auto",
    slim: bool = False,
):
    """Returns jitted serve(variables, frames, frame_idx, ref_R, ref_t, K,
    labels) -> {'rotations', 'translations'} in the original camera frame.

    frames: (I, Hf, Wf, 3) in [0, 1] RGB; K: (P, 3, 3) original intrinsics.

    slim=True drops the 'masks' output and runs the model pose-only
    (skips the full-res flow/mask reconstructions) — use when the service
    fetches only poses, which is the default PoseService configuration.
    """

    @jax.jit
    def serve(variables, frames, frame_idx, ref_rotations, ref_translations,
              K, labels):
        boxes = project_bboxes(
            points_bank, valid_bank, ref_rotations, ref_translations, K, labels
        )
        patches, newK = crop_resize_patches(
            frames, boxes, frame_idx, K, image_size, margin
        )
        mean = jnp.asarray(norm_mean, jnp.float32) / 255.0
        std = jnp.asarray(norm_std, jnp.float32) / 255.0
        real_images = (patches - mean) / std
        rendered_images, rendered_depths, _ = render_and_normalize(
            render_assets, ref_rotations, ref_translations, newK, labels,
            (image_size, image_size), norm_mean, norm_std,
            backend=render_backend,
            cull_backfaces=render_cull_backfaces,
        )
        out = model.apply(
            variables, rendered_images, real_images, ref_rotations,
            ref_translations, rendered_depths, newK, labels, iters=iters,
            train=False, output_sequences=False, unroll=False,
            lookup_backend=lookup_backend, pose_only=slim,
        )
        # adapt_intrinsic: poses live in the original camera frame already
        res = {
            "rotations": out["rotations"][-1],
            "translations": out["translations"][-1],
        }
        if not slim:
            res["masks"] = out["masks"][-1]
        return res

    return serve
