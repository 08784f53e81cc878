"""Backward warping by optical flow (reference models/utils/warp.py:32-105)."""

from typing import Tuple, Union

import jax.numpy as jnp

from scflow_tpu.ops.sampling import grid_sample


def backward_warp(
    feat: jnp.ndarray,
    flow: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
    use_mask: bool = True,
    return_mask: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Warp feat (N, H, W, C) by flow (N, H, W, 2); out[p] = feat[p + flow[p]].

    With use_mask, positions sampling outside the image are zeroed
    (validity threshold 0.9999, as the reference).
    """
    n, h, w, _ = flow.shape
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx, gy], axis=-1)[None] + flow
    grid = jnp.stack(
        [
            coords[..., 0] * 2.0 / max(w - 1, 1) - 1.0,
            coords[..., 1] * 2.0 / max(h - 1, 1) - 1.0,
        ],
        axis=-1,
    )
    out = grid_sample(feat, grid, mode=mode, padding_mode="zeros", align_corners=align_corners)
    if not use_mask:
        return out
    ones = jnp.ones_like(feat[..., :1])
    mask = grid_sample(ones, grid, mode=mode, padding_mode="zeros", align_corners=align_corners)
    mask = (mask > 0.9999).astype(feat.dtype)
    out = out * mask
    if return_mask:
        return out, mask
    return out
