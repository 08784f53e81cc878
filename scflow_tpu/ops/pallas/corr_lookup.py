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


def _kernel_bdiag(coords_ref, *refs, sizes, radius: int, bb: int):
    """Block-diagonal variant: ONE dot per tap across ALL pyramid levels.

    Why: the per-level formulation issues 2k dots per level per grid step
    (72 for 4 levels at k=9); the small levels' dots are tiny-K (256/64/16)
    with N<=16 padded to 128 lanes, so they run at MXU dispatch latency,
    not throughput — measured: levels 1-3 alone cost ~2.6 ms/call, almost
    as much as level 0's ~2.0 despite 3x less data.  Concatenating the
    levels on the contraction axis and using block-diagonal 0/1 selection
    matrices computes the SAME MACs (each level's N already padded to a
    full 128-lane tile either way) in 2k dots total — 4x fewer dispatches.

    Layout: levels concat on lanes.  LHS pass-1 lanes = sum SS_l (1360 for
    32/16/8/4); tmp per tap = sum S_l (60) columns; pass-2 output per tap
    j = L*k columns (level-major within the tap), reassembled to the
    standard level-major (B, L*k*k) contract at the end with static lane
    slices.  Numerics identical to `_kernel` (same tent weights, same
    f32 accumulation; the block-diagonal zeros contribute exact 0)."""
    m_refs = refs[:-1]
    out_ref = refs[-1]
    k = 2 * radius + 1
    nl = len(sizes)
    cx = coords_ref[:, 0:1]  # (BB, 1)
    cy = coords_ref[:, 1:2]

    # per-level static pieces, then lane-concat
    ss_list = [s * s for s in sizes]
    hidx_parts, widx_parts, m_parts = [], [], []
    pys, pxs = [], []
    for lvl, (m_ref, s) in enumerate(zip(m_refs, sizes)):
        inv = 1.0 / 2.0**lvl
        pxs.append(cx * inv)
        pys.append(cy * inv)
        m_parts.append(m_ref[...].astype(jnp.float32))
        lidx = jax.lax.broadcasted_iota(jnp.int32, (1, s * s), 1)
        hidx_parts.append((lidx // s).astype(jnp.float32))
        widx_parts.append((lidx % s).astype(jnp.float32))
    mcat = jnp.concatenate(m_parts, axis=-1)  # (BB, sum SS)

    # g1cat (sum SS, sum S): block-diag of per-level [l%S == w]
    scol = sum(sizes)
    g1_blocks = []
    for li, s in enumerate(sizes):
        g1 = (
            jax.lax.broadcasted_iota(jnp.int32, (s * s, s), 0) % s
            == jax.lax.broadcasted_iota(jnp.int32, (s * s, s), 1)
        ).astype(jnp.float32)
        left = sum(sizes[:li])
        g1_blocks.append(jnp.pad(g1, ((0, 0), (left, scol - left - s))))
    g1cat = jnp.concatenate(g1_blocks, axis=0)  # (sum SS, sum S)

    # pass 1: one dot per y-tap i over the level-concat lanes
    tmp_parts = []
    for i in range(k):
        wy = jnp.concatenate(
            [_tent(pys[li] + (i - radius) - hidx_parts[li])
             for li in range(nl)], axis=-1)  # (BB, sum SS)
        tmp_parts.append(
            jax.lax.dot_general(
                wy * mcat, g1cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # (BB, sum S)
    tmp = jnp.concatenate(tmp_parts, axis=-1)  # (BB, k * sum S)

    # pass-2 selection g2cat (k*sum S, nl*k): column c = i*scol + off_l + w
    # -> output o = l*k + i (sum over w inside the level block)
    ks2 = k * scol
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (ks2, nl * k), 0)
    o_idx = jax.lax.broadcasted_iota(jnp.int32, (ks2, nl * k), 1)
    q = r_idx % scol
    lvl_q = jnp.zeros_like(q)
    acc = 0
    for s in sizes[:-1]:
        acc += s
        lvl_q = lvl_q + (q >= acc).astype(q.dtype)
    g2cat = ((o_idx % k == r_idx // scol)
             & (o_idx // k == lvl_q)).astype(jnp.float32)

    # per-column x-tap weights: column i*scol + off_l + w gets
    # tent(px_l + (j - r) - w); the (BB, scol) level-concat piece tiles k
    # times over i
    wxs = []
    for j in range(k):
        wx_one = jnp.concatenate(
            [_tent(pxs[li] + (j - radius) - widx_parts[li][:, : sizes[li]])
             for li in range(nl)], axis=-1)  # (BB, sum S)
        wxs.append(jnp.concatenate([wx_one] * k, axis=-1))  # (BB, k*sum S)

    outs_j = []
    for j in range(k):
        outs_j.append(
            jax.lax.dot_general(
                wxs[j] * tmp, g2cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # (BB, nl*k) = [l*k + i]
    # reassemble to the standard level-major contract: level l block at
    # offset l*k*k, tap index j*k + i
    pieces = []
    for li in range(nl):
        for j in range(k):
            pieces.append(outs_j[j][:, li * k : (li + 1) * k])
    out_ref[...] = jnp.concatenate(pieces, axis=-1)


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
        {"shift": _kernel_shift, "bdiag": _kernel_bdiag}.get(
            variant, _kernel),
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
