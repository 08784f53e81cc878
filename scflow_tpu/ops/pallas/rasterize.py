"""Pallas TPU rasterization kernel: tile-binned packed z-buffer pass.

The XLA rasterizer's depth pass is a fused brute-force reduction — every
face is tested against every pixel (render/rasterizer.py).  This kernel adds
the classic tile binning: the image is split into (TH, TW) tiles (one grid
instance each), faces are pre-sorted by their projected tile and grouped
into chunks, and a per-(tile, chunk) activity mask (computed densely in XLA,
it is tiny) lets the kernel skip whole chunks whose bounding boxes miss the
tile.  All intermediates live in VMEM/registers; each chunk is evaluated
fully vectorized as a (FC, TH*TW) block on the VPU and min-merged into the
tile's packed (z-bits | face-id) accumulator.

The kernel only produces the packed winner per pixel; the exact-z /
barycentric recovery stays in XLA (cheap row gathers — see
render/rasterizer.py pass 2).
"""

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = 2**31 - 1

# Screen-space winding sign of a FRONT-facing triangle under this module's
# projection convention (x right, y DOWN, +z into the scene) with the mesh
# banks' outward-consistent winding: det = (by-cy)(ax-cx) + (cx-bx)(ay-cy)
# is NEGATIVE for every face that can win the depth test of a closed mesh
# (measured over synthetic uvsphere/sphere/cube banks and random poses —
# zero winning faces with det > 0).  Used by the opt-in backface culling.
FRONT_FACE_DET_SIGN = -1.0

# how pack_faces_and_bin reorders faces by tile: 'gather' sorts only
# (key, id) and applies ONE whole-row take_along_axis to a face-major
# column stack (measured 3x cheaper at 2048 faces — the bitonic sort's
# log² passes move 2 columns instead of 15+18); 'payload' rides every
# column through the sort (the round-1 design; kept as the A/B baseline
# and for debugging).  Both are stable and produce bit-identical packs.
_SORT_MODE = os.environ.get("SCFLOW_PACK_SORT", "gather")


def pick_face_chunk(num_faces: int, max_fc: int = 512) -> int:
    """Face-chunk size for the binned kernels.  Must be a multiple of 128
    (the kernels assert 128-lane alignment of chunk starts via
    `pl.multiple_of`).  Measured on v5e (batch 16, 2048-face meshes, 256²):
    per-chunk overhead (cond + matmul dispatch + carry merges) dominates the
    coverage math, so larger chunks win until VMEM pressure — fc=512 runs the
    shaded kernel 41% faster than fc=128; fc>=1024 regresses."""
    padded = ((num_faces + 127) // 128) * 128
    return min(max_fc, padded)


def _kernel(active_ref, tri_ref, out_ref, *, fc: int, th: int, tw: int,
            id_mask: int, nc: int):
    """Depth pass over precomputed edge/z-plane coefficients.

    tri_ref rows (16, F) from `pack_faces_and_bin`: 0-2 E0 (w0 affine
    coeffs, det-normalized), 3-5 E1, 6-8 Z plane, 9 sorted face id,
    10 valid (orientation / degeneracy / near-plane folded in at pack
    time).  Per face-pixel the kernel is pure FMAs + compares — the divide
    and per-face constants were hoisted to the XLA pack step."""
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    ntx = pl.num_programs(2)
    act_base = ((n * pl.num_programs(1) + ty) * ntx + tx) * nc
    y0 = (ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    pxf = px.reshape(1, th * tw)
    pyf = py.reshape(1, th * tw)

    def chunk_body(c, pack):
        def do(pack):
            start = pl.multiple_of(c * fc, 128)
            blk = tri_ref[0, :, pl.ds(start, fc)]  # (16, FC)
            w0 = blk[0][:, None] * pxf + blk[1][:, None] * pyf + blk[2][:, None]
            w1 = blk[3][:, None] * pxf + blk[4][:, None] * pyf + blk[5][:, None]
            w2 = 1.0 - w0 - w1
            zpix = blk[6][:, None] * pxf + blk[7][:, None] * pyf + blk[8][:, None]
            keybase = blk[9][:, None]
            valid = blk[10][:, None] > 0.5
            cover = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid
            zbits = pltpu.bitcast(jnp.maximum(zpix, 1e-6), jnp.int32)
            packed = (zbits & ~jnp.int32(id_mask)) | keybase.astype(jnp.int32)
            packed = jnp.where(cover, packed, jnp.int32(INT32_MAX))
            chunk_min = jnp.min(packed, axis=0)  # (THW,)
            return jnp.minimum(pack, chunk_min.reshape(th, tw))

        return jax.lax.cond(active_ref[act_base + c] > 0, do, lambda p: p, pack)

    init = jnp.full((th, tw), INT32_MAX, jnp.int32)
    out_ref[0] = jax.lax.fori_loop(0, nc, chunk_body, init)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "fc", "id_bits",
                              "interpret")
)
def rasterize_packed_pallas(
    tri: jnp.ndarray,  # (N, 16, F) packed face rows (see _pack_tri)
    active: jnp.ndarray,  # (N, TY, TX, NC) int32 chunk-tile activity
    h: int,
    w: int,
    th: int = 32,
    tw: int = 128,
    fc: int = 128,
    id_bits: int = 11,
    interpret: bool = False,  # pallas interpret mode (CPU tests)
) -> jnp.ndarray:
    """Returns packed winner keys (N, H, W) int32 (INT32_MAX = background)."""
    n = tri.shape[0]
    ty, tx = h // th, w // tw
    nc = active.shape[-1]
    grid = (n, ty, tx)
    id_mask = (1 << id_bits) - 1
    kern = functools.partial(
        _kernel, fc=fc, th=th, tw=tw, id_mask=id_mask, nc=nc
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # flattened activity mask in SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, tri.shape[-1]), lambda i, j, k, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw), lambda i, j, k, *_: (i, j, k)),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(active.reshape(-1), tri)


def _kernel_shaded(active_ref, tri_ref, out_ref, *, fc: int, th: int, tw: int,
                   nc: int, id_mask: int):
    """Fused depth-test + winner-attribute kernel.

    tri_ref rows (32, F): 0-2 E0 / 3-5 E1 (det-normalized barycentric
    affine coefficients), 6-8 Z plane, 9 sorted id, 10 valid,
    11-19 corner normals, 20-28 corner colors.
    out_ref (1, 16, TH, TW): 0 z, 1 fg flag, 2 sorted fid, 3-5 normal,
    6-8 color, 9-11 barycentrics, rest zero.

    Per active chunk the packed-key winner is found as in `_kernel`; the
    winner's 32-channel face row is then selected with ONE (32, FC) x
    (FC, THW) one-hot matmul on the MXU — no gathers anywhere — and carried
    across chunks with a where-merge.  Barycentric/attribute interpolation
    happens once per tile at the end, purely elementwise.
    """
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    act_base = ((n * pl.num_programs(1) + ty) * pl.num_programs(2) + tx) * nc
    y0 = (ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    pxf = px.reshape(1, th * tw)
    pyf = py.reshape(1, th * tw)
    thw = th * tw

    def chunk_body(c, carry):
        pack, data = carry

        def do(carry):
            pack, data = carry
            start = pl.multiple_of(c * fc, 128)
            blk = tri_ref[0, :, pl.ds(start, fc)]  # (32, FC)
            w0 = blk[0][:, None] * pxf + blk[1][:, None] * pyf + blk[2][:, None]
            w1 = blk[3][:, None] * pxf + blk[4][:, None] * pyf + blk[5][:, None]
            w2 = 1.0 - w0 - w1
            zpix = blk[6][:, None] * pxf + blk[7][:, None] * pyf + blk[8][:, None]
            keybase = blk[9][:, None]
            valid = blk[10][:, None] > 0.5
            cover = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid
            zbits = pltpu.bitcast(jnp.maximum(zpix, 1e-6), jnp.int32)
            # keys are unique per face (id in low bits), so the one-hot
            # equality-select below has exactly one hit for covered pixels
            packed = (zbits & ~jnp.int32(id_mask)) | keybase.astype(jnp.int32)
            packed = jnp.where(cover, packed, jnp.int32(INT32_MAX))
            chunk_min = jnp.min(packed, axis=0)  # (THW,)

            onehot = (packed == chunk_min[None, :]).astype(jnp.float32)
            # split precision: geometry rows (coords/z/id) need HIGHEST — MXU
            # bf16 rounding would quantize the selected corner coordinates
            # (~0.5px depth artifacts); attribute rows tolerate bf16
            geo = jax.lax.dot_general(
                blk[:16], onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (16, THW)
            attrs = jax.lax.dot_general(
                blk[16:], onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16, THW)
            chunk_data = jnp.concatenate([geo, attrs], axis=0)

            better = (chunk_min < pack)[None, :]  # (1, THW)
            pack = jnp.where(better[0], chunk_min, pack)
            data = jnp.where(better, chunk_data, data)
            return pack, data

        return jax.lax.cond(active_ref[act_base + c] > 0, do, lambda x: x,
                            (pack, data))

    init = (
        jnp.full((thw,), INT32_MAX, jnp.int32),
        jnp.zeros((32, thw), jnp.float32),
    )
    pack, data = jax.lax.fori_loop(0, nc, chunk_body, init)

    fg = (pack != INT32_MAX).astype(jnp.float32)
    # winner barycentrics/z recomputed from the carried coefficient rows
    pxl = pxf[0]
    pyl = pyf[0]
    w0 = data[0] * pxl + data[1] * pyl + data[2]
    w1 = data[3] * pxl + data[4] * pyl + data[5]
    w2 = 1.0 - w0 - w1
    z = data[6] * pxl + data[7] * pyl + data[8]

    out = [
        z * fg,
        fg,
        data[9],  # sorted face id (float)
    ]
    for a in range(3):  # normals then handled with colors below
        out.append(w0 * data[11 + a] + w1 * data[14 + a] + w2 * data[17 + a])
    for a in range(3):
        out.append(w0 * data[20 + a] + w1 * data[23 + a] + w2 * data[26 + a])
    out += [w0 * fg, w1 * fg, w2 * fg]
    out += [jnp.zeros_like(z)] * (16 - len(out))
    out_ref[0] = jnp.stack([o.reshape(th, tw) for o in out], axis=0)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "fc", "id_bits",
                              "interpret", "version")
)
def rasterize_shaded_pallas(
    tri: jnp.ndarray,  # (N, 32, F) packed rows incl. corner normals/colors
    active: jnp.ndarray,  # (N, TY, TX, NC) int32
    h: int,
    w: int,
    th: int = 8,
    tw: int = 128,
    fc: int = 128,
    id_bits: int = 11,
    interpret: bool = False,  # pallas interpret mode (CPU tests)
    version: int = 2,  # 2 = value-carry selection (faster, more exact)
) -> jnp.ndarray:
    """Returns (N, 16, H, W) f32 fragment maps (see _kernel_shaded)."""
    n = tri.shape[0]
    ty, tx = h // th, w // tw
    nc = active.shape[-1]
    kern = functools.partial(
        _kernel_shaded_v2 if version == 2 else _kernel_shaded,
        fc=fc, th=th, tw=tw, nc=nc, id_mask=(1 << id_bits) - 1
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 32, tri.shape[-1]), lambda i, j, k, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, th, tw), lambda i, j, k, *_: (i, 0, j, k)),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 16, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(active.reshape(-1), tri)


def _kernel_shaded_v2(active_ref, tri_ref, out_ref, *, fc: int, th: int,
                      tw: int, nc: int, id_mask: int):
    """_kernel_shaded with value-carry winner selection.

    The v1 kernel selected the winner's 16 geometry rows with a
    Precision.HIGHEST matmul (6 MXU passes) and re-derived barycentrics/z
    from the selected coefficients.  But w0/w1/z are already computed per
    (face, pixel) in exact fp32 on the VPU — so this kernel selects the
    VALUES with 4 masked reduces (exact, no matmul rounding at all) and
    keeps ONE default-precision matmul for the 18 attribute rows.  MXU work
    per active chunk drops ~3.5x; accuracy of bary/z strictly improves.

    Accepted rounding (measured on v5e via tools/check_pallas_parity.py
    kernel_versions(), 8x sphere 256^2): vs v1's Precision.HIGHEST
    selection, depth/mask/id/colors/barycentrics are bit-identical; the
    interpolated corner NORMALS round by max |d| = 1.9e-3 (bf16 mantissa of
    the attr rows in the default-precision matmul).  Downstream the normals
    feed Phong shading only, where a 2e-3 normal error moves pixel
    intensities < 1/255 — accepted in exchange for the 3.5x MXU saving.
    """
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    act_base = ((n * pl.num_programs(1) + ty) * pl.num_programs(2) + tx) * nc
    y0 = (ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    pxf = px.reshape(1, th * tw)
    pyf = py.reshape(1, th * tw)
    thw = th * tw

    def chunk_body(c, carry):
        pack, vals, attrs = carry

        def do(carry):
            pack, vals, attrs = carry
            start = pl.multiple_of(c * fc, 128)
            blk = tri_ref[0, :, pl.ds(start, fc)]  # (32, FC)
            w0 = blk[0][:, None] * pxf + blk[1][:, None] * pyf + blk[2][:, None]
            w1 = blk[3][:, None] * pxf + blk[4][:, None] * pyf + blk[5][:, None]
            w2 = 1.0 - w0 - w1
            zpix = blk[6][:, None] * pxf + blk[7][:, None] * pyf + blk[8][:, None]
            keybase = blk[9][:, None]
            valid = blk[10][:, None] > 0.5
            cover = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid
            zbits = pltpu.bitcast(jnp.maximum(zpix, 1e-6), jnp.int32)
            packed = (zbits & ~jnp.int32(id_mask)) | keybase.astype(jnp.int32)
            packed = jnp.where(cover, packed, jnp.int32(INT32_MAX))
            chunk_min = jnp.min(packed, axis=0)  # (THW,)

            # winner-value selection: keys are unique per face, so the mask
            # has exactly one hit for covered pixels; uncovered pixels match
            # every face but are killed by the `better` merge below
            sf = (packed == chunk_min[None, :]).astype(jnp.float32)
            w0v = jnp.sum(sf * w0, axis=0)
            w1v = jnp.sum(sf * w1, axis=0)
            zv = jnp.sum(sf * zpix, axis=0)
            idv = jnp.sum(sf * keybase, axis=0)
            chunk_vals = jnp.stack(
                [w0v, w1v, zv, idv,
                 jnp.zeros_like(zv), jnp.zeros_like(zv),
                 jnp.zeros_like(zv), jnp.zeros_like(zv)], axis=0
            )  # (8, THW)
            chunk_attrs = jax.lax.dot_general(
                blk, sf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32, THW); only attr rows 11-28 are consumed

            better = chunk_min < pack  # (THW,)
            pack = jnp.where(better, chunk_min, pack)
            vals = jnp.where(better[None, :], chunk_vals, vals)
            attrs = jnp.where(better[None, :], chunk_attrs, attrs)
            return pack, vals, attrs

        return jax.lax.cond(active_ref[act_base + c] > 0, do, lambda x: x, carry)

    init = (
        jnp.full((thw,), INT32_MAX, jnp.int32),
        jnp.zeros((8, thw), jnp.float32),
        jnp.zeros((32, thw), jnp.float32),
    )
    pack, vals, attrs = jax.lax.fori_loop(0, nc, chunk_body, init)

    fg = (pack != INT32_MAX).astype(jnp.float32)
    w0 = vals[0]
    w1 = vals[1]
    w2 = 1.0 - w0 - w1
    z = vals[2]

    out = [
        z * fg,
        fg,
        vals[3],  # sorted face id (float, exact fp32)
    ]
    for a in range(3):
        out.append(w0 * attrs[11 + a] + w1 * attrs[14 + a] + w2 * attrs[17 + a])
    for a in range(3):
        out.append(w0 * attrs[20 + a] + w1 * attrs[23 + a] + w2 * attrs[26 + a])
    out += [w0 * fg, w1 * fg, w2 * fg]
    out += [jnp.zeros_like(z)] * (16 - len(out))
    out_ref[0] = jnp.stack([o.reshape(th, tw) for o in out], axis=0)


def _eval_chunk_value_carry(tri_ref, c, carry, *, fc: int, pxf, pyf,
                            id_mask: int):
    """One face-chunk of the value-carry depth/attr pass (shared by the v3
    and v4 kernels): evaluate all fc faces of chunk c over the tile's pixels,
    pick the packed-key winner, select its row block, min-merge into the
    carry.

    The winner's barycentrics/depth/id are NOT reduced here: the selection
    matmul (blk . sf) already carries the winner's plane-coefficient rows
    0-9, and _emit_maps re-evaluates w0/w1/z at each pixel from those —
    replacing four (FC, THW) mul+reduce chains per chunk with (THW,)-sized
    FMAs once per tile.  The dot runs at Precision.HIGHEST: sf is exactly
    {0, 1} and the 3-term bf16 split of an f32 is exact, so selection
    returns the coefficients bit-exactly (coordinates/depth feed geometry
    downstream; default bf16-rounded MXU passes would corrupt them)."""
    pack, attrs = carry
    start = pl.multiple_of(c * fc, 128)
    blk = tri_ref[0, :, pl.ds(start, fc)]  # (32, FC)
    w0 = blk[0][:, None] * pxf + blk[1][:, None] * pyf + blk[2][:, None]
    w1 = blk[3][:, None] * pxf + blk[4][:, None] * pyf + blk[5][:, None]
    zpix = blk[6][:, None] * pxf + blk[7][:, None] * pyf + blk[8][:, None]
    keybase = blk[9][:, None]
    # no valid-row test: _face_plane_coeffs gives invalid faces w0 == -1
    w2 = 1.0 - w0 - w1
    cover = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0
    zbits = pltpu.bitcast(jnp.maximum(zpix, 1e-6), jnp.int32)
    packed = (zbits & ~jnp.int32(id_mask)) | keybase.astype(jnp.int32)
    packed = jnp.where(cover, packed, jnp.int32(INT32_MAX))
    chunk_min = jnp.min(packed, axis=0)  # (THW,)

    sf = (packed == chunk_min[None, :]).astype(jnp.float32)
    # split-precision selection: rows 0-15 (plane coeffs + id + the first
    # attr rows) must come back bit-exact -> HIGHEST (6 bf16 passes); rows
    # 16-31 are shading attrs where the cheap single-pass default suffices
    sel_lo = jax.lax.dot_general(
        blk[0:16], sf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sel_hi = jax.lax.dot_general(
        blk[16:32], sf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    chunk_attrs = jnp.concatenate([sel_lo, sel_hi], axis=0)
    # (32, THW); rows 0-9 = winner plane coeffs, 11-28 = winner attrs

    better = chunk_min < pack
    pack = jnp.where(better, chunk_min, pack)
    attrs = jnp.where(better[None, :], chunk_attrs, attrs)
    return pack, attrs


def _emit_maps(out_ref, pack, attrs, th: int, tw: int, pxf, pyf):
    """Final per-tile interpolation + output write (shared v3/v4): the
    winner's barycentrics/depth are re-evaluated from its selected plane
    coefficients (attrs rows 0-8) — same FMA expression the chunk pass
    used, so values are bit-identical to reducing them per chunk."""
    fg = (pack != INT32_MAX).astype(jnp.float32)
    px = pxf.reshape(-1)
    py = pyf.reshape(-1)
    w0 = attrs[0] * px + attrs[1] * py + attrs[2]
    w1 = attrs[3] * px + attrs[4] * py + attrs[5]
    w2 = 1.0 - w0 - w1
    z = attrs[6] * px + attrs[7] * py + attrs[8]

    out = [z * fg, fg, attrs[9]]
    for a in range(3):
        out.append(w0 * attrs[11 + a] + w1 * attrs[14 + a] + w2 * attrs[17 + a])
    for a in range(3):
        out.append(w0 * attrs[20 + a] + w1 * attrs[23 + a] + w2 * attrs[26 + a])
    out += [w0 * fg, w1 * fg, w2 * fg]
    out += [jnp.zeros_like(z)] * (16 - len(out))
    out_ref[0] = jnp.stack([o.reshape(th, tw) for o in out], axis=0)


def _tile_pixel_rows(th: int, tw: int):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    y0 = (ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    return px.reshape(1, th * tw), py.reshape(1, th * tw)


def _kernel_shaded_v3(counts_ref, order_ref, tri_ref, out_ref, *, fc: int,
                      th: int, tw: int, nc: int, id_mask: int):
    """_kernel_shaded_v2 with a compacted active-chunk list.

    v2 ran a lax.cond per (tile, chunk) over ALL nc chunks — at fine chunk
    sizes the cond/dispatch overhead forced fc=512, which makes the
    bbox-activity culling coarse (a 512-face chunk's bbox covers most of the
    object).  Here the pack step compacts each tile's active chunk ids into
    a scalar-prefetched list, so the kernel fori_loops over exactly the
    active chunks (dynamic trip count, no conds) and fc can drop to 128 for
    ~2x tighter culling at no dispatch cost.
    """
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile = (n * pl.num_programs(1) + ty) * pl.num_programs(2) + tx
    pxf, pyf = _tile_pixel_rows(th, tw)
    thw = th * tw

    def chunk_body(i, carry):
        c = order_ref[tile * nc + i]
        return _eval_chunk_value_carry(tri_ref, c, carry, fc=fc, pxf=pxf,
                                       pyf=pyf, id_mask=id_mask)

    init = (
        jnp.full((thw,), INT32_MAX, jnp.int32),
        jnp.zeros((32, thw), jnp.float32),
    )
    m = counts_ref[tile]
    pack, attrs = jax.lax.fori_loop(0, m, chunk_body, init)
    _emit_maps(out_ref, pack, attrs, th, tw, pxf, pyf)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "fc", "id_bits",
                              "interpret")
)
def rasterize_shaded_pallas_v3(
    tri: jnp.ndarray,  # (N, 32, F) packed rows
    active: jnp.ndarray,  # (N, TY, TX, NC) int32
    h: int,
    w: int,
    th: int = 8,
    tw: int = 128,
    fc: int = 128,
    id_bits: int = 11,
    interpret: bool = False,
) -> jnp.ndarray:
    """v3: compacted active-chunk lists via scalar prefetch (see
    _kernel_shaded_v3).  Same outputs as rasterize_shaded_pallas."""
    n = tri.shape[0]
    ty, tx = h // th, w // tw
    nc = active.shape[-1]
    # compact: per tile, active chunk ids first (stable order), plus count
    order = jnp.argsort(-active, axis=-1, stable=True).astype(jnp.int32)
    counts = jnp.sum(active, axis=-1).astype(jnp.int32)
    kern = functools.partial(
        _kernel_shaded_v3, fc=fc, th=th, tw=tw, nc=nc,
        id_mask=(1 << id_bits) - 1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 32, tri.shape[-1]), lambda i, j, k, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, th, tw), lambda i, j, k, *_: (i, 0, j, k)),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 16, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts.reshape(-1), order.reshape(-1), tri)


def _face_plane_coeffs(tri_xy, tri_z, face_valid, cull_backfaces=False):
    """Per-face edge/z-plane coefficients (det-normalized, so the divide
    happens once per face) + validity with orientation/degeneracy
    (|det| <= 1e-9) and the near-plane test (min corner z > 1e-6) folded in.
    Returns 10 arrays of shape (N, F).

    cull_backfaces: additionally require the screen-space winding of a
    front face (det < 0 under this projection's y-down image coords and
    the mesh banks' outward winding — measured invariant of every winning
    face, see FRONT_FACE_DET_SIGN).  For closed, consistently-wound meshes
    a backface can never win the depth test, so culling only removes dead
    coverage work (~2x fewer live faces); correctness for open or
    inconsistently-wound meshes is NOT preserved — opt-in.  The identity
    ALSO assumes the camera is outside the mesh and the mesh clears the
    near plane: if front faces are dropped by the near-plane test above
    (min corner z <= 1e-6) or the camera sits inside the surface, the
    backfaces behind them become visible and culling would remove them.
    BOP-style object rendering (object wholly in front of the camera)
    satisfies this; `render/meshbank.resolve_cull_backfaces` documents the
    same caveat at the config surface."""
    ax, ay = tri_xy[:, :, 0, 0], tri_xy[:, :, 0, 1]
    bx, by = tri_xy[:, :, 1, 0], tri_xy[:, :, 1, 1]
    ccx, ccy = tri_xy[:, :, 2, 0], tri_xy[:, :, 2, 1]
    z0, z1, z2 = tri_z[:, :, 0], tri_z[:, :, 1], tri_z[:, :, 2]
    det = (by - ccy) * (ax - ccx) + (ccx - bx) * (ay - ccy)
    det_ok = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    e0x = (by - ccy) * inv_det
    e0y = (ccx - bx) * inv_det
    e0c = -(e0x * ccx + e0y * ccy)
    e1x = (ccy - ay) * inv_det
    e1y = (ax - ccx) * inv_det
    e1c = -(e1x * ccx + e1y * ccy)
    dz0, dz1 = z0 - z2, z1 - z2
    zx = e0x * dz0 + e1x * dz1
    zy = e0y * dz0 + e1y * dz1
    zc = z2 + e0c * dz0 + e1c * dz1
    front = jnp.minimum(jnp.minimum(z0, z1), z2) > 1e-6
    ok = face_valid & det_ok & front
    if cull_backfaces:
        ok = ok & (det * FRONT_FACE_DET_SIGN > 0)
    valid_row = ok.astype(jnp.float32)
    # fold validity into the coefficients: an invalid face gets w0 == -1 at
    # every pixel, so the v3/v4 kernels' coverage test rejects it without
    # reading the valid row (this also scrubs the degenerate-det inf/nan
    # coefficients out of the pack).  The valid row is still returned for
    # the v1/v2 kernels, which AND it explicitly.
    zero = jnp.zeros_like(e0x)
    e0x = jnp.where(ok, e0x, zero)
    e0y = jnp.where(ok, e0y, zero)
    e0c = jnp.where(ok, e0c, jnp.full_like(e0c, -1.0))
    e1x = jnp.where(ok, e1x, zero)
    e1y = jnp.where(ok, e1y, zero)
    e1c = jnp.where(ok, e1c, zero)
    zx = jnp.where(ok, zx, zero)
    zy = jnp.where(ok, zy, zero)
    zc = jnp.where(ok, zc, zero)
    return e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc, valid_row


def _kernel_shaded_v4(sstart_ref, scount_ref, ovc_ref, ovo_ref, tri_ref,
                      out_ref, *, fc: int, th: int, tw: int, nov: int,
                      id_mask: int):
    """Exact-binned variant: entries (face duplicates, one per covered tile)
    are sorted by their assigned tile, so each tile's work is a CONTIGUOUS
    chunk range [sstart, sstart+scount) — no activity mask at all for the
    ~99% of faces whose bbox spans few tiles.  Faces spanning > dup tiles
    live in an overflow segment evaluated via a compacted bbox-activity
    list (ovc/ovo), exactly like the v3 kernel.  See pack_shaded_exact."""
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile = (n * pl.num_programs(1) + ty) * pl.num_programs(2) + tx
    pxf, pyf = _tile_pixel_rows(th, tw)
    thw = th * tw

    def seg_body(i, carry):
        c = sstart_ref[tile] + i
        return _eval_chunk_value_carry(tri_ref, c, carry, fc=fc, pxf=pxf,
                                       pyf=pyf, id_mask=id_mask)

    def ov_body(i, carry):
        c = ovo_ref[tile * nov + i]
        return _eval_chunk_value_carry(tri_ref, c, carry, fc=fc, pxf=pxf,
                                       pyf=pyf, id_mask=id_mask)

    init = (
        jnp.full((thw,), INT32_MAX, jnp.int32),
        jnp.zeros((32, thw), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, scount_ref[tile], seg_body, init)
    pack, attrs = jax.lax.fori_loop(0, ovc_ref[tile], ov_body, carry)
    _emit_maps(out_ref, pack, attrs, th, tw, pxf, pyf)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "fc", "id_bits",
                              "interpret")
)
def rasterize_shaded_pallas_v4(
    tri: jnp.ndarray,  # (N, 32, E) packed ENTRY rows (pack_shaded_exact)
    seg_start: jnp.ndarray,  # (N, TY, TX) int32 first chunk of the tile
    seg_count: jnp.ndarray,  # (N, TY, TX) int32 number of contiguous chunks
    ov_counts: jnp.ndarray,  # (N, TY, TX) int32 active overflow chunks
    ov_order: jnp.ndarray,  # (N, TY, TX, NOV) int32 overflow chunk ids
    h: int,
    w: int,
    th: int = 8,
    tw: int = 128,
    fc: int = 128,
    id_bits: int = 14,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-binned shaded rasterization (see _kernel_shaded_v4).  Same
    16-channel output maps as rasterize_shaded_pallas, except channel 2
    carries the sorted ENTRY id (map through the perm returned by
    pack_shaded_exact to recover original face ids)."""
    n = tri.shape[0]
    ty, tx = h // th, w // tw
    nov = ov_order.shape[-1]
    kern = functools.partial(
        _kernel_shaded_v4, fc=fc, th=th, tw=tw, nov=nov,
        id_mask=(1 << id_bits) - 1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 32, tri.shape[-1]), lambda i, j, k, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, th, tw), lambda i, j, k, *_: (i, 0, j, k)),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 16, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(seg_start.reshape(-1), seg_count.reshape(-1), ov_counts.reshape(-1),
      ov_order.reshape(-1), tri)


def pack_shaded_exact(
    tri_xy: jnp.ndarray,  # (N, F, 3, 2) screen-space corners
    tri_z: jnp.ndarray,  # (N, F, 3)
    face_valid: jnp.ndarray,  # (N, F)
    corner_attrs: jnp.ndarray,  # (N, F, 3, 6) per-corner [normal(3), color(3)]
    h: int,
    w: int,
    th: int,
    tw: int,
    fc: int,
    dup: int = 8,
    sort_mode: str = "fused",  # 'fused' 1-op sort | 'two_op' variadic sort
    cull_backfaces: bool = False,
):
    """Exact per-tile binning via bounded face duplication.

    The chunk-bbox activity mask of pack_faces_and_bin leaves ~1.5-3x
    face-tile over-evaluation at fc=128: a chunk of 128 center-sorted faces
    has a bbox spanning several tiles, and every spanned tile evaluates the
    whole chunk.  Here each face instead emits one ENTRY per tile its bbox
    covers (row-major over its tile span, up to `dup` entries); entries sort
    by assigned tile, so a tile's work is the contiguous chunk range
    covering its entries — every chunk a tile evaluates is (mostly) faces
    that actually touch it.  Faces spanning more than `dup` tiles fall back
    to a single entry keyed after all tiles (an "overflow" segment) that
    keeps the v3-style bbox-activity evaluation; dead/degenerate faces and
    unused dup slots sort to the very end, outside every tile's range, and
    are never evaluated.

    Correctness does not depend on the classification: any entry evaluated
    for any tile contributes its true face coverage, and duplicate
    evaluations of one face at one pixel produce identical z with distinct
    entry ids, so the packed-key min picks a deterministic winner with
    identical attributes.  The only requirement is that every (face,
    covered-tile) pair is evaluated at least once, which holds by
    construction for both segments.

    Returns (rows (N, 32, E), seg_start (N, TY, TX), seg_count (N, TY, TX),
    ov_counts (N, TY, TX), ov_order (N, TY, TX, NOV), perm (N, E) int32
    entry -> original face id).
    """
    import math as _math

    n, f0 = face_valid.shape
    tyc, txc = h // th, w // tw
    T = tyc * txc
    # dead entries sort after the exact segment [0, T) and the overflow
    # segment [T, 2T); keep the sentinel small so a fused (key<<fbits | fid)
    # single-operand sort stays in int32 (variadic TPU sorts cost ~2x)
    DEAD = jnp.int32(2 * T)
    fbits = max(1, _math.ceil(_math.log2(max(f0, 2))))
    fused = sort_mode == "fused" and (2 * T + 1) < (1 << (31 - fbits))

    (e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc, valid_row) = _face_plane_coeffs(
        tri_xy, tri_z, face_valid, cull_backfaces=cull_backfaces
    )
    xmin = tri_xy[..., 0].min(axis=2)
    xmax = tri_xy[..., 0].max(axis=2)
    ymin = tri_xy[..., 1].min(axis=2)
    ymax = tri_xy[..., 1].max(axis=2)

    on_screen = (xmax >= 0) & (xmin <= w - 1) & (ymax >= 0) & (ymin <= h - 1)
    alive = (valid_row > 0.5) & on_screen
    tx0 = jnp.clip(jnp.floor(xmin / tw), 0, txc - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / tw), 0, txc - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / th), 0, tyc - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / th), 0, tyc - 1).astype(jnp.int32)
    ncx = tx1 - tx0 + 1
    ndup = ncx * (ty1 - ty0 + 1)
    overflow = alive & (ndup > dup)
    normal = alive & (ndup <= dup)

    # entry keys (N, F, dup): row-major enumeration of the face's tile span
    d = jnp.arange(dup, dtype=jnp.int32)[None, None, :]
    etile = (ty0[..., None] + d // ncx[..., None]) * txc + (
        tx0[..., None] + d % ncx[..., None]
    )
    key = jnp.where(normal[..., None] & (d < ndup[..., None]), etile, DEAD)
    # overflow faces: one entry keyed by center tile, after all exact tiles
    cy = jnp.clip((ymin + ymax) * 0.5, 0, h - 1) // th
    cx = jnp.clip((xmin + xmax) * 0.5, 0, w - 1) // tw
    ctile = (cy * txc + cx).astype(jnp.int32)
    key = key.at[:, :, 0].set(
        jnp.where(overflow, T + ctile, key[:, :, 0])
    )
    fid = jnp.broadcast_to(
        jnp.arange(f0, dtype=jnp.int32)[None, :, None], (n, f0, dup)
    )

    e = f0 * dup
    pad = (-e) % fc
    key_flat = key.reshape(n, e)
    fid_flat = fid.reshape(n, e)
    if pad:
        key_flat = jnp.concatenate(
            [key_flat, jnp.full((n, pad), DEAD, jnp.int32)], axis=1)
        fid_flat = jnp.concatenate(
            [fid_flat, jnp.zeros((n, pad), jnp.int32)], axis=1)
        e += pad
    if fused:
        combined = jnp.bitwise_or(
            jnp.left_shift(key_flat, fbits), fid_flat)
        sc = jax.lax.sort(combined, dimension=1)
        sk = jnp.right_shift(sc, fbits)
        sfid = jnp.bitwise_and(sc, jnp.int32((1 << fbits) - 1))
    else:
        sk, sfid = jax.lax.sort([key_flat, fid_flat], dimension=1,
                                num_keys=1, is_stable=True)

    # gather per-face data rows by sorted entry face id (whole-row gathers
    # from the (N, F, C) table; the barrier keeps XLA from fusing them into
    # consumers as element gathers).  Attr layout matches pack_shaded_and_bin:
    # 9 corner-major normal components, then 9 colors.
    ca = jnp.concatenate(
        [corner_attrs[..., 0:3].reshape(n, f0, 9),
         corner_attrs[..., 3:6].reshape(n, f0, 9)], axis=-1
    )
    fdata = jnp.stack(
        [e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc, valid_row], axis=-1
    )  # (N, F, 10)
    fdata = jnp.concatenate(
        [fdata, ca, jnp.stack([xmin, xmax, ymin, ymax], axis=-1)], axis=-1
    )  # (N, F, 32)
    sorted_fd = jnp.take_along_axis(fdata, sfid[..., None], axis=1)
    sorted_fd = jax.lax.optimization_barrier(sorted_fd)
    sfdT = sorted_fd.transpose(0, 2, 1)  # (N, 32, E)

    entry_id = jnp.broadcast_to(
        jnp.arange(e, dtype=jnp.float32)[None, None, :], (n, 1, e))
    rows = jnp.concatenate(
        [
            sfdT[:, 0:9],  # edge/z-plane coefficients
            entry_id,  # row 9: sorted entry id
            sfdT[:, 9:10],  # row 10: valid
            sfdT[:, 10:28],  # rows 11-28: corner normals/colors
            jnp.zeros((n, 3, e), jnp.float32),
        ],
        axis=1,
    )  # (N, 32, E)

    # contiguous chunk range per tile from the sorted-key segment bounds
    bounds = jax.vmap(
        lambda a: jnp.searchsorted(a, jnp.arange(T + 1, dtype=jnp.int32))
    )(sk).astype(jnp.int32)  # (N, T+1)
    start = bounds[:, :-1]
    end = bounds[:, 1:]
    seg_start = (start // fc).reshape(n, tyc, txc)
    seg_count = jnp.where(
        end > start, (end - 1) // fc - start // fc + 1, 0
    ).reshape(n, tyc, txc).astype(jnp.int32)

    # overflow chunks: v3-style bbox activity, restricted to chunks holding
    # overflow entries; non-overflow entries get inverted bboxes so they
    # never inflate a chunk's bbox
    is_ov = (sk >= T) & (sk < 2 * T)
    big = jnp.float32(1e9)
    oxmin = jnp.where(is_ov, sfdT[:, 28], big).reshape(n, e // fc, fc).min(2)
    oxmax = jnp.where(is_ov, sfdT[:, 29], -big).reshape(n, e // fc, fc).max(2)
    oymin = jnp.where(is_ov, sfdT[:, 30], big).reshape(n, e // fc, fc).min(2)
    oymax = jnp.where(is_ov, sfdT[:, 31], -big).reshape(n, e // fc, fc).max(2)
    tile_x0 = (jnp.arange(txc) * tw)[None, :, None]
    tile_y0 = (jnp.arange(tyc) * th)[None, :, None]
    hit_x = (oxmax[:, None] >= tile_x0) & (oxmin[:, None] <= tile_x0 + tw - 1)
    hit_y = (oymax[:, None] >= tile_y0) & (oymin[:, None] <= tile_y0 + th - 1)
    active_ov = (
        hit_y[:, :, None, :] & hit_x[:, None, :, :]
    ).astype(jnp.int32)  # (N, TY, TX, NCH)
    # overflow entries number at most f0 (one per face), so they span at
    # most f0/fc + 1 chunks; cap the compacted lists there
    nov = min(e // fc, f0 // fc + 2)
    ov_order = jnp.argsort(-active_ov, axis=-1, stable=True)[
        ..., :nov].astype(jnp.int32)
    ov_counts = jnp.minimum(jnp.sum(active_ov, axis=-1), nov).astype(jnp.int32)
    return rows, seg_start, seg_count, ov_counts, ov_order, sfid


def pack_faces_and_bin(
    tri_xy: jnp.ndarray,  # (N, F, 3, 2) screen-space corners
    tri_z: jnp.ndarray,  # (N, F, 3)
    face_valid: jnp.ndarray,  # (N, F)
    h: int,
    w: int,
    th: int,
    tw: int,
    fc: int,
    extra_cols: Optional[jnp.ndarray] = None,  # (N, E, F) sorted alongside
    cull_backfaces: bool = False,
):
    """XLA-side preprocessing: sort faces by projected tile for chunk
    coherence, pack per-face rows, and build the (tile, chunk) activity mask.

    Per-face constants are precomputed here so the kernels' inner loop is
    pure FMAs: barycentrics are affine in screen space,
    w0(p) = E0x*px + E0y*py + E0c (det-normalized, so the divide happens
    once per face, not per face-pixel), likewise w1; interpolated depth is
    the affine plane z(p) = Zx*px + Zy*py + Zc.  Orientation/degeneracy
    (|det| <= 1e-9) and the near-plane test (min corner z > 1e-6) fold into
    the valid row.

    All per-face columns ride ONE stable `lax.sort` as payloads (a TPU
    argsort + per-column take_along_axis gathers cost ~3x more).

    Returns (tri (N,16,F') rows [E0(3), E1(3), Z(3), sorted id, valid,
    0...], active (N,TY,TX,NC) int32, perm (N,F') sorted->original face
    index [, sorted extra_cols]).
    """
    n, f = face_valid.shape
    pad = (-f) % fc
    if pad:
        tri_xy = jnp.concatenate(
            [tri_xy, jnp.zeros((n, pad, 3, 2), tri_xy.dtype)], axis=1
        )
        tri_z = jnp.concatenate([tri_z, jnp.zeros((n, pad, 3), tri_z.dtype)], axis=1)
        face_valid = jnp.concatenate(
            [face_valid, jnp.zeros((n, pad), bool)], axis=1
        )
        if extra_cols is not None:
            extra_cols = jnp.concatenate(
                [extra_cols, jnp.zeros((n, extra_cols.shape[1], pad),
                                       extra_cols.dtype)], axis=2
            )
        f += pad
    ty, tx = h // th, w // tw

    xmin = tri_xy[..., 0].min(axis=2)
    xmax = tri_xy[..., 0].max(axis=2)
    ymin = tri_xy[..., 1].min(axis=2)
    ymax = tri_xy[..., 1].max(axis=2)

    (e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc, valid_row) = _face_plane_coeffs(
        tri_xy, tri_z, face_valid, cull_backfaces=cull_backfaces
    )
    if cull_backfaces:
        # culled faces must also leave the tile sort and the chunk bboxes
        # (that is where the win comes from: ~2x fewer live faces => ~2x
        # fewer active (tile, chunk) pairs for the kernels to evaluate)
        face_valid = face_valid & (valid_row > 0.5)

    # sort by tile of the bbox center (y-major); invalid faces sort last
    cy = jnp.clip((ymin + ymax) * 0.5, 0, h - 1) // th
    cx = jnp.clip((xmin + xmax) * 0.5, 0, w - 1) // tw
    key = jnp.where(face_valid, cy * tx + cx, 1e9)
    big = jnp.float32(1e9)
    cols = [
        e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc, valid_row,
        jnp.where(face_valid, xmin, big), jnp.where(face_valid, xmax, -big),
        jnp.where(face_valid, ymin, big), jnp.where(face_valid, ymax, -big),
        jnp.arange(f, dtype=jnp.float32)[None].repeat(n, 0),
    ]
    ne = 0
    if extra_cols is not None:
        ne = extra_cols.shape[1]
        cols += [extra_cols[:, i] for i in range(ne)]
    if _SORT_MODE == "gather":
        # sort only (key, id), then reorder every column with ONE whole-row
        # take_along_axis on a (N, F, C) face-major stack: the bitonic sort
        # moves 2 columns instead of 15+E through its log² passes, and the
        # row gather rides the TPU's fast whole-row path (measured 9.4 ->
        # ~3 ms at batch 64 / 2048 faces; docs/PERFORMANCE.md round 3).
        # Stable sort + positional gather = bit-identical to the payload
        # sort (tests/test_pallas_raster.py::test_pack_sort_modes_agree).
        iota = jnp.broadcast_to(
            jnp.arange(f, dtype=jnp.float32)[None], (n, f))
        _, sid = jax.lax.sort((key, iota), dimension=1, num_keys=1,
                              is_stable=True)
        payload = jnp.stack(cols, axis=-1)  # (N, F, C)
        sorted_cols = jnp.take_along_axis(
            payload, sid.astype(jnp.int32)[..., None], axis=1)
        s = [jnp.squeeze(c, -1) for c in jnp.split(
            sorted_cols, sorted_cols.shape[-1], axis=-1)]
    else:
        s = list(jax.lax.sort([key] + cols, dimension=1, num_keys=1,
                              is_stable=True))[1:]
    (e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc, valid_row,
     xmin, xmax, ymin, ymax, orig_id) = s[0:15]
    perm = orig_id.astype(jnp.int32)

    rows = jnp.stack(
        [
            e0x, e0y, e0c, e1x, e1y, e1c, zx, zy, zc,
            jnp.arange(f, dtype=jnp.float32)[None].repeat(n, 0),  # sorted id
            valid_row,
        ]
        + [jnp.zeros((n, f), jnp.float32)] * 5,
        axis=1,
    )  # (N, 16, F)

    # chunk bboxes (invalid faces already pushed to +-inf pre-sort)
    cxmin = xmin.reshape(n, f // fc, fc).min(2)
    cxmax = xmax.reshape(n, f // fc, fc).max(2)
    cymin = ymin.reshape(n, f // fc, fc).min(2)
    cymax = ymax.reshape(n, f // fc, fc).max(2)

    tile_x0 = (jnp.arange(tx) * tw)[None, :, None]  # (1, TX, 1)
    tile_y0 = (jnp.arange(ty) * th)[None, :, None]  # (1, TY, 1)
    hit_x = (cxmax[:, None] >= tile_x0) & (cxmin[:, None] <= tile_x0 + tw - 1)
    hit_y = (cymax[:, None] >= tile_y0) & (cymin[:, None] <= tile_y0 + th - 1)
    active = (
        hit_y[:, :, None, :] & hit_x[:, None, :, :]
    ).astype(jnp.int32)  # (N, TY, TX, NC)
    if extra_cols is not None:
        sorted_extra = jnp.stack(s[15 : 15 + ne], axis=1)  # (N, E, F)
        return rows, active, perm, sorted_extra
    return rows, active, perm


def pack_shaded_and_bin(
    tri_xy: jnp.ndarray,  # (N, F, 3, 2)
    tri_z: jnp.ndarray,  # (N, F, 3)
    face_valid: jnp.ndarray,  # (N, F)
    corner_attrs: jnp.ndarray,  # (N, F, 3, 6) per-corner [normal(3), color(3)]
    h: int,
    w: int,
    th: int,
    tw: int,
    fc: int,
    cull_backfaces: bool = False,
):
    """pack_faces_and_bin + the corner attributes needed by _kernel_shaded
    (attribute columns ride the same lax.sort as payloads).
    Returns (rows (N, 32, F'), active, perm)."""
    n, f0 = face_valid.shape
    ca = corner_attrs.reshape(n, f0, 3, 6)
    # rows 11-19 normals (corner-major), 20-28 colors
    nrm = ca[..., 0:3].reshape(n, f0, 9)
    col = ca[..., 3:6].reshape(n, f0, 9)
    attr_cols = jnp.concatenate([nrm, col], axis=-1).transpose(0, 2, 1)  # (N,18,F0)
    rows16, active, perm, attr_rows = pack_faces_and_bin(
        tri_xy, tri_z, face_valid, h, w, th, tw, fc, extra_cols=attr_cols,
        cull_backfaces=cull_backfaces,
    )
    f = perm.shape[1]
    rows = jnp.concatenate(
        [rows16[:, :11], attr_rows, jnp.zeros((n, 3, f), jnp.float32)], axis=1
    )  # (N, 32, F)
    return rows, active, perm
