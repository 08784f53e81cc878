"""Phong / Gouraud-style shading of rasterized fragments.

Follows pytorch3d's Hard{Phong,Gouraud,Flat}Shader light model (the shaders
the reference selects, rendering.py:70-74): per-pixel
  color = texel * (ambient + diffuse * max(0, n.l)) + specular * max(0, r.v)^s
with PointLights defaults ambient=0.5, diffuse=0.3, specular=0.2,
shininess=64.  All vectors live in the camera frame (rigid transforms
preserve the dot products, so this matches shading in mesh/world space).
"""

from typing import Tuple

import jax.numpy as jnp

from scflow_tpu.render.rasterizer import Fragments


def _normalize(v, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def interpolate_attributes(
    fragments: Fragments,
    faces: jnp.ndarray,  # (N, F, 3)
    vert_attr: jnp.ndarray,  # (N, V, C)
) -> jnp.ndarray:
    """Barycentric interpolation of per-vertex attributes -> (N, H, W, C)."""
    n, h, w = fragments.face_id.shape
    fid = jnp.maximum(fragments.face_id, 0)  # background reads face 0 (masked later)
    tri = jnp.take_along_axis(
        faces, fid.reshape(n, h * w, 1), axis=1
    )  # (N, HW, 3)
    c = vert_attr.shape[-1]
    a0 = jnp.take_along_axis(vert_attr, tri[..., 0:1].repeat(c, -1), axis=1)
    a1 = jnp.take_along_axis(vert_attr, tri[..., 1:2].repeat(c, -1), axis=1)
    a2 = jnp.take_along_axis(vert_attr, tri[..., 2:3].repeat(c, -1), axis=1)
    b = fragments.bary.reshape(n, h * w, 3)
    out = a0 * b[..., 0:1] + a1 * b[..., 1:2] + a2 * b[..., 2:3]
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
    pos = interpolate_attributes(fragments, faces, verts_cam)  # pixel position
    nrm = interpolate_attributes(fragments, faces, normals_cam)
    texel = interpolate_attributes(fragments, faces, colors)

    nrm = _normalize(nrm)
    l = _normalize(light_pos_cam[:, None, None, :] - pos)
    v = _normalize(-pos)  # camera at origin
    ndl = jnp.sum(nrm * l, axis=-1, keepdims=True)
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
