"""Batched z-buffer triangle rasterizer in pure JAX (XLA path).

TPU-native replacement for the pytorch3d CUDA rasterizer (reference
models/utils/rendering.py:141-165; SURVEY.md §2.3 row 1).  Design:

- static shapes: per-class meshes come from a padded MeshBank; degenerate
  padding faces never win the depth test.
- the face loop is a `lax.scan` over fixed-size face chunks; each step
  evaluates barycentric coverage for (chunk, H*W) pixels on the VPU and
  reduces into a running (H*W) z-buffer.  `lax.map` over the batch bounds
  peak memory to one image's chunk intermediates.
- only forward rendering is needed: gradients never flow through the
  rasterizer in SCFlow (rendered images/depths are *data*; pose gradients
  flow through reprojection, scflow_decoder.py:239-243).

Outputs camera-space z ('zbuf'), winning face id (-1 = background), and
screen-space barycentrics (matching pytorch3d's default
perspective_correct=False interpolation).
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Fragments(NamedTuple):
    zbuf: jnp.ndarray  # (N, H, W) camera-space depth, 0 = background
    face_id: jnp.ndarray  # (N, H, W) int32, -1 = background
    bary: jnp.ndarray  # (N, H, W, 3)


def project_to_screen(verts_cam: jnp.ndarray, K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """verts_cam (..., V, 3), K (..., 3, 3) -> (xy (..., V, 2), z (..., V))."""
    z = verts_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = fx * verts_cam[..., 0] / zsafe + cx
    y = fy * verts_cam[..., 1] / zsafe + cy
    return jnp.stack([x, y], axis=-1), z


def _rasterize_single(
    xy: jnp.ndarray,  # (V, 2) screen coords
    z: jnp.ndarray,  # (V,) camera-space z
    faces: jnp.ndarray,  # (F, 3) int32
    face_valid: jnp.ndarray,  # (F,) bool
    h: int,
    w: int,
    chunk: int,
):
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)])
        face_valid = jnp.concatenate([face_valid, jnp.zeros((pad,), bool)])
    nchunks = faces.shape[0] // chunk

    tri_xy = xy[faces]  # (F', 3, 2)
    tri_z = z[faces]  # (F', 3)
    face_idx = jnp.arange(faces.shape[0], dtype=jnp.int32)

    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=xy.dtype), jnp.arange(w, dtype=xy.dtype), indexing="ij"
    )
    px = gx.reshape(-1)  # (HW,)
    py = gy.reshape(-1)

    chunks = (
        tri_xy.reshape(nchunks, chunk, 3, 2),
        tri_z.reshape(nchunks, chunk, 3),
        face_valid.reshape(nchunks, chunk),
        face_idx.reshape(nchunks, chunk),
    )

    def step(carry, data):
        zbuf, fid, b0, b1, b2 = carry
        cxy, cz, cvalid, cid = data
        x0, y0 = cxy[:, 0, 0, None], cxy[:, 0, 1, None]  # (FC, 1)
        x1, y1 = cxy[:, 1, 0, None], cxy[:, 1, 1, None]
        x2, y2 = cxy[:, 2, 0, None], cxy[:, 2, 1, None]
        det = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)  # (FC, 1)
        det_ok = jnp.abs(det) > 1e-9
        det_safe = jnp.where(det_ok, det, 1.0)
        w0 = ((y1 - y2) * (px[None] - x2) + (x2 - x1) * (py[None] - y2)) / det_safe
        w1 = ((y2 - y0) * (px[None] - x2) + (x0 - x2) * (py[None] - y2)) / det_safe
        w2 = 1.0 - w0 - w1  # (FC, HW)
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        zpix = (
            w0 * cz[:, 0, None] + w1 * cz[:, 1, None] + w2 * cz[:, 2, None]
        )
        front = jnp.min(cz, axis=1, keepdims=True) > 1e-6  # all verts in front
        cover = inside & det_ok & front & cvalid[:, None]
        zmask = jnp.where(cover, zpix, jnp.inf)  # (FC, HW)

        k = jnp.argmin(zmask, axis=0)  # (HW,)
        zc = jnp.take_along_axis(zmask, k[None], axis=0)[0]
        w0c = jnp.take_along_axis(w0, k[None], axis=0)[0]
        w1c = jnp.take_along_axis(w1, k[None], axis=0)[0]
        fidc = cid[k]

        better = zc < zbuf
        zbuf = jnp.where(better, zc, zbuf)
        fid = jnp.where(better, fidc, fid)
        b0 = jnp.where(better, w0c, b0)
        b1 = jnp.where(better, w1c, b1)
        b2 = 1.0 - b0 - b1
        return (zbuf, fid, b0, b1, b2), None

    hw = h * w
    init = (
        jnp.full((hw,), jnp.inf, xy.dtype),
        jnp.full((hw,), -1, jnp.int32),
        jnp.zeros((hw,), xy.dtype),
        jnp.zeros((hw,), xy.dtype),
        jnp.zeros((hw,), xy.dtype),
    )
    (zbuf, fid, b0, b1, b2), _ = jax.lax.scan(step, init, chunks)
    background = ~jnp.isfinite(zbuf)
    zbuf = jnp.where(background, 0.0, zbuf)
    fid = jnp.where(background, -1, fid)
    bary = jnp.stack([b0, b1, b2], axis=-1)
    return (
        zbuf.reshape(h, w),
        fid.reshape(h, w),
        bary.reshape(h, w, 3),
    )


@partial(jax.jit, static_argnames=("h", "w", "chunk"))
def rasterize(
    verts_cam: jnp.ndarray,  # (N, V, 3) camera-frame vertices
    faces: jnp.ndarray,  # (N, F, 3)
    face_valid: jnp.ndarray,  # (N, F)
    K: jnp.ndarray,  # (N, 3, 3)
    h: int,
    w: int,
    chunk: int = 64,
) -> Fragments:
    xy, z = project_to_screen(verts_cam, K)

    def one(args):
        xy_i, z_i, f_i, fv_i = args
        return _rasterize_single(xy_i, z_i, f_i, fv_i, h, w, chunk)

    zbuf, fid, bary = jax.lax.map(one, (xy, z, faces, face_valid))
    return Fragments(zbuf=zbuf, face_id=fid, bary=bary)
