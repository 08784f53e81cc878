"""Pallas TPU kernel for the multi-level windowed bilinear corr lookup.

Replaces the XLA tent-matmul formulation (ops/corr.py::corr_lookup, itself a
TPU re-design of the reference CorrLookup grid_samples,
models/utils/corr_lookup.py:102-136) with one fused kernel over all pyramid
levels that writes the (B, L*(2r+1)^2) tap tensor directly — no per-level
(B, 9, 9) intermediates (whose 9-lane tiles pad to 128 and cost ~2.3 ms/step
in layout copies at batch 16).

Formulation per level (size S = Hl = Wl, window k = 2r+1):

    out[b, j*k + i] = sum_{h,w} wy[b,i,h] * wx[b,j,w] * m[b,h,w]

with tent weights wy[b,i,h] = max(0, 1 - |py_b + off_i - h|) (two nonzeros
per tap; exactly grid_sample-with-zeros-padding).  The kernel keeps the map
FLAT on the lane axis (m is (BB, S*S), lanes l = h*S + w) so every VPU op
uses full 128-lane vectors:

  pass 1 (y-taps): for each i, multiply m by wy_flat_i[l] = tent(py - l//S)
      and contract h with a static 0/1 matrix G1[l, w] = (l%S == w) on the
      MXU -> tmp_i (BB, S); tmp packs as (BB, k*S) at columns i*S + w.
  pass 2 (x-taps): for each j, multiply tmp by wx_flat_j[l] = tent(px - l%S)
      and contract w with G2[l, i] = (l//S == i) -> out columns j*k + i.

Levels share one grid over B row-blocks; each level's taps land at its
static column offset of the (BB, L*k*k) output block.
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _tent(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _kernel_shift(coords_ref, *refs, sizes, radius: int, bb: int):
    """One-hot shifted-row variant of `_kernel` (same output contract).

    The tent weight has exactly two nonzeros (floor/ceil of the sample
    line), so instead of k dense tent-multiplies over the whole map per
    pass, extract the k+1 INTEGER rows the window touches with exact 0/1
    one-hot multiplies (2 VPU ops each vs ~5 for tent), then blend
    adjacent rows with the shared fractional weight — the standard
    bilinear identity lookup(py + i) = (1-fy)·m[y0+i] + fy·m[y0+i+1].
    Less than half the VPU work of the tent kernel on the dominant
    level-0 pass, and numerically EXACT bilinear: the one-hot dot picks
    a single row (no accumulation rounding), and only the final 2-term
    blend rounds in f32.  Out-of-range rows match grid_sample
    zeros-padding (no one-hot match -> zero row).
    """
    m_refs = refs[:-1]
    out_ref = refs[-1]
    k = 2 * radius + 1
    cx = coords_ref[:, 0:1]  # (BB, 1)
    cy = coords_ref[:, 1:2]

    outs = []
    for lvl, (m_ref, s) in enumerate(zip(m_refs, sizes)):
        inv = 1.0 / 2.0**lvl
        px = cx * inv
        py = cy * inv
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0  # (BB, 1) in [0, 1)
        fy = py - y0
        # pass 1 stays in the map's storage dtype: the one-hot selection
        # has no products and a single nonzero per output column, so a
        # bf16 map loses NOTHING (the dot's f32 accumulator receives the
        # exact bf16 values) while the 10 LHS temps halve in VMEM traffic
        # and the dots run native single-pass bf16 on the MXU
        m = m_ref[...]  # (BB, S*S)
        ss = s * s
        lidx = jax.lax.broadcasted_iota(jnp.int32, (1, ss), 1)
        hidx = (lidx // s).astype(jnp.float32)  # (1, SS)
        g1 = (
            jax.lax.broadcasted_iota(jnp.int32, (ss, s), 0) % s
            == jax.lax.broadcasted_iota(jnp.int32, (ss, s), 1)
        ).astype(m.dtype)
        ks = k * s
        g2 = (
            jax.lax.broadcasted_iota(jnp.int32, (ks, k), 0) // s
            == jax.lax.broadcasted_iota(jnp.int32, (ks, k), 1)
        ).astype(jnp.float32)
        l2w = jax.lax.broadcasted_iota(jnp.int32, (1, ks), 1) % s
        l2w = l2w.astype(jnp.float32)

        # pass 1: integer rows V_d[b, w] = m[b, y0+d, w], d = -r .. r+1
        zero = jnp.zeros_like(m)
        vs = []
        for d in range(-radius, radius + 2):
            sel = jnp.where(hidx == y0 + d, m, zero)  # (BB, SS), m dtype
            vs.append(
                jax.lax.dot_general(
                    sel, g1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (BB, S) f32
        one_m_fy = 1.0 - fy
        tmp = jnp.concatenate(
            [one_m_fy * vs[i] + fy * vs[i + 1] for i in range(k)], axis=-1
        )  # (BB, k*S), columns i*S + w

        # pass 2: integer columns U_d[b, i] = tmp[b, i*S + x0+d]
        us = []
        for d in range(-radius, radius + 2):
            selx = jnp.where(l2w == x0 + d, tmp, 0.0)  # (BB, k*S)
            us.append(
                jax.lax.dot_general(
                    selx, g2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (BB, k)
        one_m_fx = 1.0 - fx
        for j in range(k):
            outs.append(one_m_fx * us[j] + fx * us[j + 1])  # (BB, k)
    out_ref[...] = jnp.concatenate(outs, axis=-1)


def _kernel(coords_ref, *refs, sizes, radius: int, bb: int):
    m_refs = refs[:-1]
    out_ref = refs[-1]
    k = 2 * radius + 1
    cx = coords_ref[:, 0:1]  # (BB, 1)
    cy = coords_ref[:, 1:2]

    outs = []
    for lvl, (m_ref, s) in enumerate(zip(m_refs, sizes)):
        px = cx * (1.0 / 2.0**lvl)
        py = cy * (1.0 / 2.0**lvl)
        m = m_ref[...].astype(jnp.float32)  # (BB, S*S)
        ss = s * s
        lidx = jax.lax.broadcasted_iota(jnp.int32, (1, ss), 1)
        hidx = (lidx // s).astype(jnp.float32)  # (1, SS)
        widx = (lidx % s).astype(jnp.float32)
        # G1[l, w] = (l % S == w); G2[l2, i] = (l2 // S == i)
        g1 = (
            jax.lax.broadcasted_iota(jnp.int32, (ss, s), 0) % s
            == jax.lax.broadcasted_iota(jnp.int32, (ss, s), 1)
        ).astype(jnp.float32)
        ks = k * s
        g2 = (
            jax.lax.broadcasted_iota(jnp.int32, (ks, k), 0) // s
            == jax.lax.broadcasted_iota(jnp.int32, (ks, k), 1)
        ).astype(jnp.float32)
        l2w = jax.lax.broadcasted_iota(jnp.int32, (1, ks), 1) % s  # (1, k*S)
        l2w = l2w.astype(jnp.float32)

        # pass 1: y-taps -> tmp (BB, k*S), columns i*S + w
        tmps = []
        for i in range(k):
            wy = _tent(py + (i - radius) - hidx)  # (BB, SS)
            tmps.append(
                jax.lax.dot_general(
                    wy * m, g1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (BB, S)
        tmp = jnp.concatenate(tmps, axis=-1)  # (BB, k*S)

        # pass 2: x-taps -> (BB, k*k), columns j*k + i
        for j in range(k):
            wx = _tent(px + (j - radius) - l2w)  # (BB, k*S)
            outs.append(
                jax.lax.dot_general(
                    wx * tmp, g2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (BB, k)
    out_ref[...] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("radius", "bb", "interpret", "variant"))
def corr_lookup_pallas_flat(
    pyramid_flat: Sequence[jnp.ndarray],  # level l: (B, Sl*Sl)
    coords: jnp.ndarray,  # (B, 2) float32 full-scale window centers (x, y)
    radius: int = 4,
    bb: int = 256,
    interpret: bool = False,
    variant: str = "tent",  # 'tent' (default, fastest measured) | 'shift'
) -> jnp.ndarray:
    """Returns (B, L*(2r+1)^2) f32, level-major, tap index j*k+i (j offsets
    x, i offsets y — reference tap-order parity, see ops/corr.py)."""
    b = coords.shape[0]
    sizes = []
    for m in pyramid_flat:
        s = int(round(m.shape[1] ** 0.5))
        assert s * s == m.shape[1], m.shape
        sizes.append(s)
    k = 2 * radius + 1
    n_out = len(pyramid_flat) * k * k
    assert b % bb == 0, (b, bb)
    grid = (b // bb,)
    kern = functools.partial(
        _kernel_shift if variant == "shift" else _kernel,
        sizes=tuple(sizes), radius=radius, bb=bb)
    in_specs = [pl.BlockSpec((bb, 2), lambda i: (i, 0))]
    in_specs += [
        pl.BlockSpec((bb, m.shape[1]), lambda i: (i, 0)) for m in pyramid_flat
    ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n_out), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, n_out), lambda i: (i, 0)),
        interpret=interpret,
    )(coords, *pyramid_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def corr_lookup_pallas_diff(
    pyramid: tuple,  # level l: (N*H*W, Sl, Sl, 1)
    flow: jnp.ndarray,  # (N, H, W, 2)
    radius: int = 4,
    bb: int = 256,
    interpret: bool = False,
    variant: str = "tent",
) -> jnp.ndarray:
    """Differentiable wrapper: Pallas kernel forward, XLA tent-formulation
    backward (the kernel itself has no transpose rule).  Gradients match
    the autodiff of ops.corr.corr_lookup: tent subgradient 0 at the kinks,
    per-level 1/2^l chain factor onto the flow."""
    return corr_lookup_pallas(list(pyramid), flow, radius, bb=bb,
                              interpret=interpret, variant=variant)


def _lookup_fwd(pyramid, flow, radius, bb, interpret, variant):
    out = corr_lookup_pallas_diff(pyramid, flow, radius, bb, interpret,
                                  variant)
    return out, (tuple(pyramid), flow)


def _lookup_bwd(radius, bb, interpret, variant, res, g):
    pyramid, flow = res
    n, h, w, _ = flow.shape
    k = 2 * radius + 1
    b = n * h * w
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = (gx[None] + flow[..., 0]).reshape(b)
    cy = (gy[None] + flow[..., 1]).reshape(b)
    offs = jnp.arange(-radius, radius + 1, dtype=flow.dtype)
    g = g.reshape(b, len(pyramid), k, k)  # [..., j, i]: j offsets x, i y

    grad_pyr = []
    gfx = jnp.zeros((b,), flow.dtype)
    gfy = jnp.zeros((b,), flow.dtype)
    for lvl, corr in enumerate(pyramid):
        in_shape = corr.shape
        if corr.ndim == 2:  # flat (B, S*S) level
            s = int(round(corr.shape[1] ** 0.5))
            corr = corr.reshape(corr.shape[0], s, s, 1)
        hl, wl = corr.shape[1], corr.shape[2]
        inv = 1.0 / 2.0**lvl
        px = cx * inv
        py = cy * inv
        jx = jnp.arange(wl, dtype=flow.dtype)
        jy = jnp.arange(hl, dtype=flow.dtype)
        ux = px[:, None, None] + offs[None, :, None] - jx[None, None, :]
        uy = py[:, None, None] + offs[None, :, None] - jy[None, None, :]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux))  # (B, k, Wl)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy))  # (B, k, Hl)
        dwx = jnp.where(jnp.abs(ux) < 1.0, -jnp.sign(ux), 0.0)
        dwy = jnp.where(jnp.abs(uy) < 1.0, -jnp.sign(uy), 0.0)
        gl = g[:, lvl]  # (B, j, i)
        m = corr[..., 0]  # (B, Hl, Wl)

        a = jnp.einsum("bji,bjw->biw", gl, wx)
        grad_m = jnp.einsum("bih,biw->bhw", wy, a)
        grad_pyr.append(grad_m[..., None].astype(corr.dtype).reshape(in_shape))

        t2 = jnp.einsum("bih,bhw->biw", wy, m.astype(flow.dtype))
        gpx = jnp.einsum("bji,bjw,biw->b", gl, dwx, t2)
        t3 = jnp.einsum("bjw,bhw->bjh", wx, m.astype(flow.dtype))
        gpy = jnp.einsum("bji,bih,bjh->b", gl, dwy, t3)
        gfx = gfx + gpx * inv
        gfy = gfy + gpy * inv

    grad_flow = jnp.stack([gfx, gfy], axis=-1).reshape(n, h, w, 2)
    return tuple(grad_pyr), grad_flow


corr_lookup_pallas_diff.defvjp(_lookup_fwd, _lookup_bwd)


def corr_lookup_pallas(
    pyramid: Sequence[jnp.ndarray],  # level l: (N*H*W, Sl, Sl, 1)
    flow: jnp.ndarray,  # (N, H, W, 2) at feature resolution
    radius: int = 4,
    bb: int = 256,
    interpret: bool = False,
    variant: str = "tent",
) -> jnp.ndarray:
    """Drop-in for ops.corr.corr_lookup with the same (N, H, W, L*k^2)
    output; see module docstring.  Accepts pyramid levels as either
    (B, Sl, Sl, 1) or lane-dense flat (B, Sl*Sl) (correlation_pyramid_flat
    — avoids a relayout copy per call)."""
    n, h, w, _ = flow.shape
    k = 2 * radius + 1
    b = n * h * w
    bb = min(bb, max(8, -(-b // 8) * 8))
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = (gx[None] + flow[..., 0]).reshape(b)
    cy = (gy[None] + flow[..., 1]).reshape(b)
    coords = jnp.stack([cx, cy], axis=-1).astype(jnp.float32)
    flat = [m if m.ndim == 2 else m.reshape(b, -1) for m in pyramid]
    pad = (-b) % bb
    if pad:
        coords = jnp.pad(coords, ((0, pad), (0, 0)))
        flat = [jnp.pad(m, ((0, pad), (0, 0))) for m in flat]
    out = corr_lookup_pallas_flat(flat, coords, radius=radius, bb=bb,
                                  interpret=interpret, variant=variant)
    if pad:
        out = out[:b]
    return out.reshape(n, h, w, len(pyramid) * k * k)
