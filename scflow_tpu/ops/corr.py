"""All-pairs correlation pyramid + windowed lookup (the RAFT hot path).

Reference: models/decoder/raft_decoder.py:19-58 (pyramid) and
models/utils/corr_lookup.py:102-136 (lookup).  The pyramid is one big
(HW, C) x (C, HW) matmul per image — ideal MXU work.  The lookup gathers a
(2r+1)^2 window per source pixel from each pyramid level with bilinear taps.

Tap ordering parity note: the reference adds a (dy, dx)-stacked meshgrid to
(x, y) coordinates (corr_lookup.py:118-128), so the *first* window axis
offsets x and the *second* offsets y.  Channel order here reproduces that
exactly — it is load-bearing for torch checkpoint conversion, because the
motion encoder's first conv consumes these channels.
"""

from typing import List, Sequence

import jax.numpy as jnp

from scflow_tpu.ops.resize import avg_pool2
from scflow_tpu.ops.sampling import sample_at_pixels


def correlation_pyramid(
    feat1: jnp.ndarray, feat2: jnp.ndarray, num_levels: int = 4
) -> List[jnp.ndarray]:
    """feat1, feat2: (N, H, W, C) -> list of (N*H*W, Hl, Wl, 1), Hl = H/2^l.

    corr[n, s, y, x] = <feat1[n, s/W, s%W, :], feat2[n, y, x, :]> / sqrt(C)
    """
    n, h, w, c = feat1.shape
    f1 = feat1.reshape(n, h * w, c)
    f2 = feat2.reshape(n, h * w, c)
    corr = jnp.einsum("nsc,ntc->nst", f1, f2, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, corr.dtype))
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(avg_pool2(pyramid[-1]))
    return pyramid


def corr_lookup(
    pyramid: Sequence[jnp.ndarray], flow: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Index the pyramid at coords+flow with a (2r+1)^2 bilinear window.

    pyramid: list of (N*H*W, Hl, Wl, 1); flow: (N, H, W, 2) at the feature
    resolution.  Returns (N, H, W, L*(2r+1)^2), level-major channels.
    """
    n, h, w, _ = flow.shape
    k = 2 * radius + 1
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx, gy], axis=-1)[None] + flow  # (N, H, W, 2) in (x, y)

    offs = jnp.arange(-radius, radius + 1, dtype=flow.dtype)
    # window tap (k0, k1): x += offs[k0], y += offs[k1]  (see module docstring)
    dx = jnp.broadcast_to(offs[:, None], (k, k))
    dy = jnp.broadcast_to(offs[None, :], (k, k))
    delta = jnp.stack([dx, dy], axis=-1).reshape(1, k * k, 2)

    outs = []
    base = coords.reshape(n * h * w, 1, 2)
    for lvl, corr in enumerate(pyramid):
        xy = base / (2.0**lvl) + delta
        sampled = sample_at_pixels(corr, xy, mode="bilinear", padding_mode="zeros")
        outs.append(sampled.reshape(n, h, w, k * k))
    return jnp.concatenate(outs, axis=-1)
