"""Convex (learned) flow upsampling, NHWC.

Reference: models/decoder/raft_decoder.py:381-416 — a learned softmax over a
3x3 neighborhood per 8x8 subpixel.  Implemented with shifted-pad slices
(instead of unfold) + einsum; XLA fuses the 9 shifts and the combine.
"""

import jax
import jax.numpy as jnp


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W, 9, C), zero-padded 3x3 neighborhoods.

    Tap index t = ky*3 + kx, matching torch F.unfold channel ordering.
    """
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, ky : ky + h, kx : kx + w, :] for ky in range(3) for kx in range(3)]
    return jnp.stack(taps, axis=3)


def convex_upsample(
    x: jnp.ndarray, mask: jnp.ndarray, scale: int = 8, multiplier: float = None
) -> jnp.ndarray:
    """Upsample (N, H, W, C) -> (N, scale*H, scale*W, C) with learned weights.

    mask: (N, H, W, 9*scale*scale) logits laid out as torch channel index
    ((g*scale + i)*scale + j), g in 0..8 grid tap, (i, j) subpixel — the layout
    the reference's mask head produces (raft_decoder.py:404).
    multiplier: value scaling applied to x before combination (the flow
    magnitude scale; `scale` for flow, 1.0 for occlusion masks).
    """
    if multiplier is None:
        multiplier = float(scale)
    n, h, w, c = x.shape
    m = mask.reshape(n, h, w, 9, scale, scale)
    m = jax.nn.softmax(m, axis=3)
    taps = unfold3x3(x * multiplier)  # (N, H, W, 9, C)
    up = jnp.einsum("nhwgij,nhwgc->nhwijc", m, taps)
    # (N, H, W, i, j, C) -> (N, H, i, W, j, C) -> (N, H*scale, W*scale, C)
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(n, h * scale, w * scale, c)
