"""Bilinear resize with torch `F.interpolate(align_corners=True)` semantics,
plus 2x average pooling — the two resamplers used throughout the reference
decoders (models/decoder/scflow_decoder.py:196-227, raft_decoder.py:32).

Implemented as separable 1-D interpolation matrices applied with einsum so
XLA lowers them to MXU matmuls instead of gathers.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def interp_taps(n_in: int, n_out: int, align_corners: bool = True):
    """Per-output-row bilinear taps: (lo, hi, w_lo, w_hi) int32/float32
    arrays of shape (n_out,).  `_interp_matrix` is built from these, so a
    2-tap blend over gathered rows reproduces the matrix product exactly
    (adding the matrix's zero entries is an exact no-op for finite values)."""
    lo = np.zeros(n_out, np.int32)
    hi = np.zeros(n_out, np.int32)
    w_lo = np.ones(n_out, np.float32)
    w_hi = np.zeros(n_out, np.float32)
    if n_out == 1:
        return lo, hi, w_lo, w_hi
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1)
        else:
            src = max(0.0, min(n_in - 1.0, (i + 0.5) * n_in / n_out - 0.5))
        lo[i] = int(np.floor(src))
        hi[i] = min(lo[i] + 1, n_in - 1)
        frac = src - lo[i]
        w_lo[i] = 1.0 - frac
        w_hi[i] = frac
    return lo, hi, w_lo, w_hi


@lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool = True) -> np.ndarray:
    """(n_out, n_in) sparse-ish bilinear interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    lo, hi, w_lo, w_hi = interp_taps(n_in, n_out, align_corners)
    for i in range(n_out):
        m[i, lo[i]] += w_lo[i]
        m[i, hi[i]] += w_hi[i]
    return m


def resize_align_corners(x: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    """x: (N, H, W, C) -> (N, h_out, w_out, C), bilinear, align_corners=True."""
    n, h, w, c = x.shape
    if h == h_out and w == w_out:
        return x
    mh = jnp.asarray(_interp_matrix(h, h_out, True))
    mw = jnp.asarray(_interp_matrix(w, w_out, True))
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    x = jnp.einsum("pw,nowc->nopc", mw, x)
    return x


def interpolate_bilinear(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """F.interpolate(x, scale_factor=scale, mode='bilinear', align_corners=True)."""
    n, h, w, c = x.shape
    return resize_align_corners(x, int(h * scale), int(w * scale))


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool, NHWC (torch nn.AvgPool2d(2, 2))."""
    n, h, w, c = x.shape
    if h < 2 or w < 2:
        raise ValueError(
            f"avg_pool2 needs h, w >= 2, got {(h, w)} — with a 4-level "
            "correlation pyramid the crop must be at least 64px per side "
            "(feature maps are 1/8 scale and halve per level)"
        )
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))
