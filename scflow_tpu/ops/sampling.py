"""Bilinear/nearest grid sampling (torch `F.grid_sample` semantics) in pure JAX.

Replaces the cuDNN grid_sample calls in the reference's correlation lookup
(models/utils/corr_lookup.py:67,130) and flow filtering (models/utils/flow.py)
with XLA gathers: four clipped `take`s + weight masking, which XLA fuses into
a single gather-heavy kernel on TPU.
"""

import jax
import jax.numpy as jnp


def _gather_hw(feat_flat: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, w: int):
    """feat_flat: (N, H*W, C); ix, iy: (N, P) int32 (already clipped) -> (N, P, C)."""
    idx = iy * w + ix
    return jnp.take_along_axis(feat_flat, idx[..., None], axis=1)


def sample_at_pixels(
    feat: jnp.ndarray,
    xy: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample `feat` (N, H, W, C) at float pixel coords `xy` (N, P, 2) -> (N, P, C).

    Coordinates are unnormalized pixel positions; (0, 0) is the center of the
    top-left pixel (torch grid_sample align_corners=True convention on
    unnormalized coords).
    """
    n, h, w, c = feat.shape
    feat_flat = feat.reshape(n, h * w, c)
    x, y = xy[..., 0], xy[..., 1]

    if mode == "nearest":
        # torch rounds half away from floor via round-to-nearest-even on the
        # normalized value; plain round matches in practice for our uses
        ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        out = _gather_hw(feat_flat, ix, iy, w)
        if padding_mode == "zeros":
            inside = (x >= -0.5) & (x <= w - 0.5) & (y >= -0.5) & (y <= h - 0.5)
            out = out * inside[..., None].astype(feat.dtype)
        return out

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    if padding_mode == "zeros":
        # zero the weight of any corner that falls outside the image
        vx0 = (ix0 >= 0) & (ix0 <= w - 1)
        vx1 = (ix1 >= 0) & (ix1 <= w - 1)
        vy0 = (iy0 >= 0) & (iy0 <= h - 1)
        vy1 = (iy1 >= 0) & (iy1 <= h - 1)
        wx0 = wx0 * vx0.astype(feat.dtype)
        wx1 = wx1 * vx1.astype(feat.dtype)
        wy0 = wy0 * vy0.astype(feat.dtype)
        wy1 = wy1 * vy1.astype(feat.dtype)

    cx0 = jnp.clip(ix0, 0, w - 1)
    cx1 = jnp.clip(ix1, 0, w - 1)
    cy0 = jnp.clip(iy0, 0, h - 1)
    cy1 = jnp.clip(iy1, 0, h - 1)

    v00 = _gather_hw(feat_flat, cx0, cy0, w)
    v01 = _gather_hw(feat_flat, cx1, cy0, w)
    v10 = _gather_hw(feat_flat, cx0, cy1, w)
    v11 = _gather_hw(feat_flat, cx1, cy1, w)

    out = (
        v00 * (wx0 * wy0)[..., None]
        + v01 * (wx1 * wy0)[..., None]
        + v10 * (wx0 * wy1)[..., None]
        + v11 * (wx1 * wy1)[..., None]
    )
    return out


def grid_sample(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent, NHWC.

    feat: (N, H, W, C); grid: (N, Ho, Wo, 2) normalized coords in [-1, 1]
    (x, y) order.  Returns (N, Ho, Wo, C).
    """
    n, h, w, _ = feat.shape
    gshape = grid.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        px = (gx + 1.0) * 0.5 * (w - 1)
        py = (gy + 1.0) * 0.5 * (h - 1)
    else:
        px = ((gx + 1.0) * w - 1.0) * 0.5
        py = ((gy + 1.0) * h - 1.0) * 0.5
    xy = jnp.stack([px, py], axis=-1).reshape(n, -1, 2)
    out = sample_at_pixels(feat, xy, mode=mode, padding_mode=padding_mode)
    return out.reshape(gshape[:-1] + (feat.shape[-1],))
