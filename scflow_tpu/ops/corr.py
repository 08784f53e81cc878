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

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.ops.resize import avg_pool2
from scflow_tpu.ops.sampling import sample_at_pixels
from scflow_tpu.utils.platform import resolve_backend as resolve_lookup_backend


def _all_pairs_correlation(feat1, feat2, out_dtype):
    """(N, H, W, C) x2 -> (N, H*W, H*W) normalized by sqrt(C) — the shared
    prologue of both pyramid layouts (the /sqrt(C) convention is
    load-bearing for torch checkpoint parity)."""
    n, h, w, c = feat1.shape
    f1 = feat1.reshape(n, h * w, c)
    f2 = feat2.reshape(n, h * w, c)
    corr = jnp.einsum("nsc,ntc->nst", f1, f2, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, corr.dtype))
    if out_dtype is not None:
        corr = corr.astype(out_dtype)
    return corr


def correlation_pyramid(
    feat1: jnp.ndarray, feat2: jnp.ndarray, num_levels: int = 4,
    out_dtype=None,
) -> List[jnp.ndarray]:
    """feat1, feat2: (N, H, W, C) -> list of (N*H*W, Hl, Wl, 1), Hl = H/2^l.

    corr[n, s, y, x] = <feat1[n, s/W, s%W, :], feat2[n, y, x, :]> / sqrt(C)
    """
    n, h, w, c = feat1.shape
    corr = _all_pairs_correlation(feat1, feat2, out_dtype)
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(avg_pool2(pyramid[-1]))
    return pyramid


@functools.lru_cache(maxsize=None)
def _pool_matrix(h: int, w: int) -> np.ndarray:
    """(h*w, (h/2)*(w/2)) one-hot*0.25 matrix: 2x2 avg-pool as a matmul on
    the flat (B, H*W) layout."""
    if h < 2 or w < 2 or h % 2 or w % 2:
        raise ValueError(
            f"flat pyramid pooling needs even h, w >= 2, got {(h, w)} — "
            "with a 4-level correlation pyramid the crop must be at least "
            "64px per side and divisible by 64"
        )
    P = np.zeros((h * w, (h // 2) * (w // 2)), np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    P[ys.ravel() * w + xs.ravel(),
      (ys.ravel() // 2) * (w // 2) + xs.ravel() // 2] = 0.25
    return P


def correlation_pyramid_flat(
    feat1: jnp.ndarray, feat2: jnp.ndarray, num_levels: int = 4,
    out_dtype=None,
) -> List[jnp.ndarray]:
    """correlation_pyramid in the FLAT layout: level l is (N*H*W, Sl*Sl).

    The (B, S, S, 1) layout stores a 1-wide lane dimension (pads to 128 on
    TPU) and every Pallas lookup re-flattens it — a relayout copy per GRU
    iteration.  Here the maps are lane-dense from birth and the avg-pool
    levels are (B, S^2) x pool-matrix matmuls (Precision.HIGH: ~2e-5 of
    the exact pool, 1.6x faster than HIGHEST).  Feeds
    corr_lookup_pallas_flat directly."""
    n, h, w, c = feat1.shape
    corr = _all_pairs_correlation(feat1, feat2, out_dtype)
    pyramid = [corr.reshape(n * h * w, h * w)]
    hl, wl = h, w
    for _ in range(num_levels - 1):
        pyramid.append(
            jax.lax.dot(pyramid[-1], jnp.asarray(_pool_matrix(hl, wl)).astype(
                pyramid[-1].dtype), precision=jax.lax.Precision.HIGH)
        )
        hl //= 2
        wl //= 2
    return pyramid


def corr_lookup_gather(
    pyramid: Sequence[jnp.ndarray], flow: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Gather-based lookup (reference semantics; slow on TPU — kept as the
    numerical oracle for `corr_lookup`).

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


def corr_lookup(
    pyramid: Sequence[jnp.ndarray], flow: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """MXU-native windowed bilinear lookup — no gathers.

    TPU re-design of the reference CorrLookup (corr_lookup.py:102-136):
    because the (2r+1)^2 taps lie on an integer-offset grid around one float
    center per source pixel, the bilinear window extraction is *separable*:

        out[b, k0, k1] = sum_{h,w} Wy[b, k1, h] * Wx[b, k0, w] * map[b, h, w]

    where Wx/Wy are per-row tent ('hat') weight matrices with two nonzeros
    per tap: W[b, k, j] = max(0, 1 - |center + offs_k - j|).  The hat weights
    vanish outside [0, size-1], reproducing grid_sample zeros padding
    exactly.  The two contractions are batched (9, Hl) x (Hl, Wl) x (Wl, 9)
    matmuls — MXU work instead of 5M scalar gathers (which cost ~220 ms/call
    on v5e; this path measures ~100x faster).

    pyramid: list of (N*H*W, Hl, Wl, 1); flow: (N, H, W, 2).
    Returns (N, H, W, L*(2r+1)^2), level-major, tap index = k0*(2r+1)+k1
    with k0 offsetting x and k1 offsetting y (reference tap-order parity).
    """
    n, h, w, _ = flow.shape
    k = 2 * radius + 1
    b = n * h * w
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = (gx[None] + flow[..., 0]).reshape(b)  # (B,)
    cy = (gy[None] + flow[..., 1]).reshape(b)
    offs = jnp.arange(-radius, radius + 1, dtype=flow.dtype)  # (k,)

    outs = []
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[1], corr.shape[2]
        px = cx / (2.0**lvl)
        py = cy / (2.0**lvl)
        # tent weights: (B, k, size)
        jx = jnp.arange(wl, dtype=flow.dtype)
        jy = jnp.arange(hl, dtype=flow.dtype)
        wx = jnp.maximum(
            0.0, 1.0 - jnp.abs(px[:, None, None] + offs[None, :, None] - jx[None, None, :])
        )
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(py[:, None, None] + offs[None, :, None] - jy[None, None, :])
        )
        m = corr[..., 0]  # (B, Hl, Wl)
        # match the map dtype (bf16 maps halve the lookup bandwidth; the
        # einsums still accumulate in fp32)
        wy = wy.astype(m.dtype)
        wx = wx.astype(m.dtype)
        tmp = jnp.einsum("bkh,bhw->bkw", wy, m, preferred_element_type=jnp.float32)
        out = jnp.einsum(
            "bjw,bkw->bjk", wx, tmp, preferred_element_type=jnp.float32
        )  # (B, k0, k1)
        outs.append(out.reshape(b, k * k))
    # flat concat + one final reshape (XLA places the same layout-change
    # copies either way — the (B,9,9) tiles pad 9->128 lanes regardless; a
    # pallas lookup kernel emitting (B, L*81) directly is the known fix)
    return jnp.concatenate(outs, axis=-1).reshape(n, h, w, len(pyramid) * k * k)




def corr_lookup_dispatch(
    pyramid: Sequence[jnp.ndarray], flow: jnp.ndarray, radius: int = 4,
    backend: str = "xla",
) -> jnp.ndarray:
    """Backend-selectable lookup: 'xla' = tent-matmul einsums (above),
    'pallas' = the fused kernel (ops/pallas/corr_lookup.py) writing
    (B, L*k^2) directly — ~2x faster on v5e and *closer* to the fp64
    oracle than the XLA path (both are MXU-bf16-rounded; measured rel err
    4.0e-3 vs 6.3e-3).  Both are differentiable (the pallas path carries
    a custom VJP whose backward is the XLA tent formulation).
    'auto' resolves to pallas on TPU, xla elsewhere."""
    backend = resolve_lookup_backend(backend)
    if backend == "pallas" and (
        any(m.ndim == 4 and m.shape[1] != m.shape[2] for m in pyramid)
        or (flow.shape[1] != flow.shape[2]
            and any(m.ndim == 2 for m in pyramid))
    ):
        backend = "xla"  # the fused kernel's index math assumes square maps
    if backend == "pallas":
        import os

        from scflow_tpu.ops.pallas.corr_lookup import corr_lookup_pallas_diff

        # experiment knobs (docs/PERFORMANCE.md "corr-lookup kernel
        # experiments"): SCFLOW_LOOKUP_BB row-block size,
        # SCFLOW_LOOKUP_VARIANT tent|shift|bdiag
        bb = int(os.environ.get("SCFLOW_LOOKUP_BB", "256"))
        variant = os.environ.get("SCFLOW_LOOKUP_VARIANT", "tent")
        return corr_lookup_pallas_diff(tuple(pyramid), flow, radius, bb,
                                       False, variant)
    if backend == "xla":
        # accept flat (B, Hl*Wl) levels too (correlation_pyramid_flat), so
        # the dispatch is layout-agnostic regardless of which backend built
        # the pyramid; (Hl, Wl) of level l is the flow resolution halved l
        # times (the flat layout itself carries no geometry, and a sqrt
        # guess would mis-fold non-square maps)
        h0, w0 = flow.shape[1], flow.shape[2]
        levels = []
        for lvl, m in enumerate(pyramid):
            if m.ndim == 2:
                hl, wl = h0 >> lvl, w0 >> lvl
                if hl * wl != m.shape[1]:
                    raise ValueError(
                        f"flat pyramid level {lvl} has size {m.shape[1]}, "
                        f"expected {hl}x{wl} from the {h0}x{w0} flow"
                    )
                m = m.reshape(m.shape[0], hl, wl, 1)
            levels.append(m)
        return corr_lookup(levels, flow, radius)
    raise KeyError(f"unknown corr-lookup backend {backend!r}")


def local_correlation(
    feat1: jnp.ndarray, feat2: jnp.ndarray, max_displacement: int = 4,
    normalize: bool = True,
) -> jnp.ndarray:
    """Local-window correlation (the mmcv.ops.Correlation CUDA op wrapped by
    the reference's CorrBlock util, models/utils/corr_block.py:9-109 —
    registered but unused by shipped configs; provided for parity).

    feat*: (N, H, W, C); returns (N, H, W, (2d+1)^2) with channel
    (dy+d)*(2d+1)+(dx+d) = <feat1[p], feat2[p+(dy,dx)]>, implemented as
    shifted zero-padded products (pure elementwise + reduce, no gathers).
    """
    n, h, w, c = feat1.shape
    d = max_displacement
    if normalize:
        feat1 = feat1 / jnp.maximum(
            jnp.linalg.norm(feat1, axis=-1, keepdims=True), 1e-9
        )
        feat2 = feat2 / jnp.maximum(
            jnp.linalg.norm(feat2, axis=-1, keepdims=True), 1e-9
        )
    padded = jnp.pad(feat2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = padded[:, d + dy : d + dy + h, d + dx : d + dx + w, :]
            outs.append(jnp.sum(feat1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
