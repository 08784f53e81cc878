"""Phong shading of rasterized fragments — gather-free on TPU.

Follows pytorch3d's Hard{Phong,Gouraud,Flat}Shader light model (the shaders
the reference selects, rendering.py:70-74): per-pixel
  color = texel * (ambient + diffuse * max(0, n.l)) + specular * max(0, r.v)^s
with PointLights defaults ambient=0.5, diffuse=0.3, specular=0.2,
shininess=64.  All vectors live in the camera frame (rigid transforms
preserve the dot products, so this matches shading in mesh/world space).

Per-pixel attribute interpolation is the hot step: a naive gather of 3
corner attributes per pixel costs ~400 ms/batch on v5e (scalar gathers).
Instead the winning-face one-hot selection is computed as a scan of
(HW, chunk) x (chunk, 3C) matmuls over face chunks — MXU work, ~100x
faster, and every attribute shares one pass."""

from typing import Tuple

import jax
import jax.numpy as jnp

from scflow_tpu.render.rasterizer import Fragments


def _normalize(v, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _select_corner_attrs(
    fid: jnp.ndarray,  # (HW,) winning face ids, -1 = background
    face_attr: jnp.ndarray,  # (F, 3*C) per-face corner attributes
    chunk: int,
) -> jnp.ndarray:
    """One-hot matmul selection: out[p] = face_attr[fid[p]] (0 for background).

    Scans face chunks; each step is a (HW, chunk) one-hot times (chunk, 3C)
    matmul — no gathers."""
    f, d = face_attr.shape
    pad = (-f) % chunk
    if pad:
        face_attr = jnp.concatenate([face_attr, jnp.zeros((pad, d), face_attr.dtype)])
    nc = face_attr.shape[0] // chunk
    fa = face_attr.reshape(nc, chunk, d)
    offsets = jnp.arange(nc, dtype=jnp.int32) * chunk
    lane = jnp.arange(chunk, dtype=jnp.int32)

    def step(acc, xs):
        off, fac = xs
        onehot = (fid[:, None] == (off + lane)[None, :]).astype(face_attr.dtype)
        acc = acc + jnp.dot(onehot, fac, preferred_element_type=jnp.float32)
        return acc, None

    hw = fid.shape[0]
    acc0 = jnp.zeros((hw, d), face_attr.dtype)
    acc, _ = jax.lax.scan(step, acc0, (offsets, fa))
    return acc


def interpolate_attributes(
    fragments: Fragments,
    faces: jnp.ndarray,  # (N, F, 3)
    vert_attr: jnp.ndarray,  # (N, V, C)
    chunk: int = 64,
) -> jnp.ndarray:
    """Barycentric interpolation of per-vertex attributes -> (N, H, W, C).
    Background pixels (face_id -1) get zeros."""
    n, h, w = fragments.face_id.shape
    c = vert_attr.shape[-1]
    # per-face corner attribute table (N, F, 3, C): one small gather over V
    fa = jnp.take_along_axis(
        vert_attr, faces.reshape(n, -1)[..., None].repeat(c, -1), axis=1
    ).reshape(n, -1, 3 * c)

    def one(args):
        fid, bary, fa_i = args
        corner = _select_corner_attrs(fid.reshape(-1), fa_i, chunk)
        corner = corner.reshape(-1, 3, c)
        b = bary.reshape(-1, 3)
        return (corner * b[..., None]).sum(axis=1)

    out = jax.lax.map(one, (fragments.face_id, fragments.bary, fa))
    return out.reshape(n, h, w, c)


def shade_phong(
    fragments: Fragments,
    faces: jnp.ndarray,  # (N, F, 3)
    verts_cam: jnp.ndarray,  # (N, V, 3)
    normals_cam: jnp.ndarray,  # (N, V, 3)
    colors: jnp.ndarray,  # (N, V, 3) texel colors in [0, 1]
    light_pos_cam: jnp.ndarray,  # (N, 3)
    ambient: float = 0.5,
    diffuse: float = 0.3,
    specular: float = 0.2,
    shininess: float = 64.0,
    background_color: Tuple[float, float, float] = (0.5, 0.5, 0.5),
    flat_shading: bool = False,
) -> jnp.ndarray:
    """Returns RGB (N, H, W, 3) in [0, 1]."""
    n, h, w = fragments.face_id.shape
    packed = jnp.concatenate([verts_cam, normals_cam, colors], axis=-1)  # (N,V,9)
    attr = interpolate_attributes(fragments, faces, packed)
    pos, nrm, texel = attr[..., 0:3], attr[..., 3:6], attr[..., 6:9]

    nrm = _normalize(nrm)
    l = _normalize(light_pos_cam[:, None, None, :] - pos)
    v = _normalize(-pos)  # camera at origin
    # flip normals toward the viewer (double-sided faces, matching
    # pytorch3d's unculled rasterization of closed meshes seen from outside)
    sign = jnp.where(jnp.sum(nrm * v, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    nrm = nrm * sign
    ndl = jnp.maximum(jnp.sum(nrm * l, axis=-1, keepdims=True), 0.0)
    r = 2.0 * ndl * nrm - l
    rdv = jnp.maximum(jnp.sum(r * v, axis=-1, keepdims=True), 0.0)
    spec = specular * jnp.where(ndl > 0, rdv**shininess, 0.0)

    rgb = texel * (ambient + diffuse * ndl) + spec
    bg = jnp.asarray(background_color, rgb.dtype)
    mask = (fragments.face_id >= 0)[..., None]
    rgb = jnp.where(mask, rgb, bg)
    return jnp.clip(rgb, 0.0, 1.0)
