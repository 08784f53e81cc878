"""High-level batched renderer: (R, t, K, labels) -> images/depths/masks.

API mirrors the reference Renderer (models/utils/rendering.py:169-232): one
call renders every object patch in the batch at its pose, returning RGB in
[0, 1], camera-space depth (0 = background) and the foreground mask.  Runs
entirely on device inside jit — it is called inside the training step
(base_refiner.py:153), so keeping it on-chip removes the reference's
per-step host<->CUDA round trip.

Lighting replicates the reference's `seperate_lights` heuristic
(rendering.py:195-213): a point light per object at
R @ (0, 0, max(znear_obj - 400, 0)) in mesh space, with pytorch3d default
light colors.
"""

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.render.meshbank import MeshBank, resolve_cull_backfaces
from scflow_tpu.render.rasterizer import rasterize
from scflow_tpu.render.shading import shade_phong


def _render_pallas(
    verts_cam, normals_cam, colors, faces, face_valid, K, labels, h, w,
    light_cam, version: int = 3, ambient: float = 0.5, diffuse: float = 0.3,
    specular: float = 0.2,
    background_color: Tuple[float, float, float] = (0.5, 0.5, 0.5),
    cull_backfaces: bool = False,
):
    """Fused raster+shade path: one Pallas kernel produces depth/mask and
    interpolated normal/color maps (no per-pixel gathers); Phong lighting is
    pure elementwise with surface positions reconstructed from depth rays.

    version 3: chunk-bbox activity binning; version 4: exact per-tile entry
    binning (pack_shaded_exact)."""
    import math as _math

    from scflow_tpu.ops.pallas.rasterize import (
        pack_shaded_and_bin,
        pack_shaded_exact,
        rasterize_shaded_pallas_v3,
        rasterize_shaded_pallas_v4,
    )
    from scflow_tpu.render.rasterizer import (_gather_tri,
                                              gather_corner_attrs,
                                              project_to_screen)
    from scflow_tpu.render.shading import phong_lighting

    n = verts_cam.shape[0]
    xy, z = project_to_screen(verts_cam, K)
    tri_xy, tri_z = _gather_tri(xy, z, faces)
    attr6 = jnp.concatenate([normals_cam, colors], axis=-1)  # (N, V, 6)
    corner_attrs = gather_corner_attrs(attr6, faces)  # (N, F, 3, 6)
    th, tw = 8, 128
    # fc=128 with the v3 compacted-active-list kernel: fine chunk bboxes cut
    # the per-tile coverage work ~2x vs fc=512 (the v2 cond-per-chunk floor);
    # chunk starts must be 128-lane aligned so this is also the minimum
    fc = 128
    if version == 4:
        rows, seg_start, seg_count, ov_counts, ov_order, _ = pack_shaded_exact(
            tri_xy, tri_z, face_valid, corner_attrs, h, w, th, tw, fc,
            cull_backfaces=cull_backfaces,
        )
        id_bits = max(1, _math.ceil(_math.log2(max(rows.shape[-1], 2))))
        maps = rasterize_shaded_pallas_v4(
            rows, seg_start, seg_count, ov_counts, ov_order, h, w,
            th=th, tw=tw, fc=fc, id_bits=id_bits,
        )  # (N, 16, H, W)
    else:
        rows, active, perm = pack_shaded_and_bin(
            tri_xy, tri_z, face_valid, corner_attrs, h, w, th, tw, fc,
            cull_backfaces=cull_backfaces,
        )
        id_bits = max(1, _math.ceil(_math.log2(max(rows.shape[-1], 2))))
        maps = rasterize_shaded_pallas_v3(
            rows, active, h, w, th=th, tw=tw, fc=fc, id_bits=id_bits
        )  # (N, 16, H, W)
    depths = maps[:, 0]
    fg = maps[:, 1] > 0.5
    nrm = maps[:, 3:6].transpose(0, 2, 3, 1)
    texel = maps[:, 6:9].transpose(0, 2, 3, 1)
    # surface position from the depth ray through each pixel
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=depths.dtype), jnp.arange(w, dtype=depths.dtype),
        indexing="ij",
    )
    homo = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    rays = jnp.einsum("nij,hwj->nhwi", jnp.linalg.inv(K), homo)
    pos = rays * depths[..., None]
    images = phong_lighting(pos, nrm, texel, light_cam, fg, ambient=ambient,
                            diffuse=diffuse, specular=specular,
                            background_color=background_color)
    masks = fg.astype(images.dtype)
    return {"images": images, "depths": depths, "masks": masks}


@partial(jax.jit, static_argnames=(
    "h", "w", "chunk", "flat_shading", "backend", "shading",
    "seperate_lights", "default_lights", "raster_version",
    "background_color", "cull_backfaces",
))
def render_batch(
    bank_verts: jnp.ndarray,  # (C, V, 3)
    bank_faces: jnp.ndarray,  # (C, F, 3)
    bank_face_valid: jnp.ndarray,  # (C, F)
    bank_colors: jnp.ndarray,  # (C, V, 3)
    bank_normals: jnp.ndarray,  # (C, V, 3)
    bank_vert_valid: jnp.ndarray,  # (C, V)
    rotations: jnp.ndarray,  # (N, 3, 3)
    translations: jnp.ndarray,  # (N, 3)
    K: jnp.ndarray,  # (N, 3, 3)
    labels: jnp.ndarray,  # (N,)
    h: int,
    w: int,
    chunk: int = 64,
    flat_shading: bool = False,
    backend: str = "xla",  # 'xla' | 'pallas' (fused kernel) | 'auto'
    shading: str = "phong",  # 'phong' | 'flat' | 'gouraud' (xla backend)
    seperate_lights: bool = True,
    default_lights: bool = True,
    raster_version: int = 3,  # pallas backend: 3 = chunk-bbox, 4 = exact bin
    background_color: Tuple[float, float, float] = (0.5, 0.5, 0.5),
    cull_backfaces: bool = False,  # closed consistently-wound meshes only
) -> Dict[str, jnp.ndarray]:
    from scflow_tpu.utils.platform import resolve_backend

    backend = resolve_backend(backend)
    labels = labels.astype(jnp.int32)
    verts = jnp.take(bank_verts, labels, axis=0)  # (N, V, 3)
    faces = jnp.take(bank_faces, labels, axis=0)
    face_valid = jnp.take(bank_face_valid, labels, axis=0)
    colors = jnp.take(bank_colors, labels, axis=0)
    normals = jnp.take(bank_normals, labels, axis=0)
    vert_valid = jnp.take(bank_vert_valid, labels, axis=0)

    verts_cam = jnp.einsum("nij,nvj->nvi", rotations, verts) + translations[:, None]
    normals_cam = jnp.einsum("nij,nvj->nvi", rotations, normals)

    # point-light placement (reference rendering.py:194-213).  pytorch3d
    # PointLights locations are WORLD-space and the reference builds them
    # as loc_world = R @ (0, 0, lz), so in camera space the light sits at
    # R @ (R @ (0, 0, lz)) + t — the double rotation is the reference's
    # own placement quirk, replicated knowingly.  The four branches:
    #   seperate_lights (either default_lights): lz = max(znear_obj-400, 0)
    #   not seperate, not default ('for ITODD'): lz = znear/4 with the
    #       batch znear floored to 100s (rendering.py:183)
    #   not seperate, default: pytorch3d PointLights() default world
    #       location (0, 1, 0) — no R@(0,0,lz) construction at all
    z = jnp.where(vert_valid, verts_cam[..., 2], jnp.inf)
    znear = jnp.min(z, axis=1)
    if seperate_lights or not default_lights:
        if seperate_lights:
            lz = jnp.maximum(znear - 400.0, 0.0)
        else:
            znear_r = jnp.floor(jnp.min(znear) / 100.0) * 100.0
            lz = jnp.broadcast_to(znear_r / 4.0, znear.shape)
        light_world = jnp.einsum(
            "nij,nj->ni",
            rotations,
            jnp.stack([jnp.zeros_like(lz), jnp.zeros_like(lz), lz], axis=-1),
        )
    else:
        light_world = jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0]), translations.shape
        )
    light_cam = jnp.einsum("nij,nj->ni", rotations, light_world) + translations
    # light colors: pytorch3d PointLights defaults vs the reference's
    # explicit non-default set (rendering.py:204)
    amb, dif, spec = (0.5, 0.3, 0.2) if default_lights else (0.8, 0.5, 1.0)

    # the fused kernel tiles the image as (8, 128) blocks; Mosaic rejects
    # narrower lane tiles (e.g. 64-wide reshapes), so small crops take the
    # XLA path — at those sizes the brute-force reduction is cheap anyway.
    # it bakes smooth Phong shading, so flat/gouraud modes also fall back
    if (backend == "pallas" and h % 8 == 0 and w % 128 == 0
            and shading == "phong" and not flat_shading):
        return _render_pallas(
            verts_cam, normals_cam, colors, faces, face_valid, K, labels,
            h, w, light_cam, version=raster_version,
            ambient=amb, diffuse=dif, specular=spec,
            background_color=background_color,
            cull_backfaces=cull_backfaces,
        )

    fragments = rasterize(verts_cam, faces, face_valid, K, h, w, chunk,
                          cull_backfaces=cull_backfaces)
    images = shade_phong(
        fragments, faces, verts_cam, normals_cam, colors, light_cam,
        ambient=amb, diffuse=dif, specular=spec,
        flat_shading=flat_shading, mode=shading,
        background_color=background_color,
    )
    depths = fragments.zbuf
    masks = (depths > 0).astype(images.dtype)
    return {"images": images, "depths": depths, "masks": masks}


class Renderer:
    """Stateful wrapper owning the device-resident mesh bank."""

    def __init__(
        self,
        mesh_dir: Optional[str] = None,
        bank: Optional[MeshBank] = None,
        image_size: Tuple[int, int] = (256, 256),
        shader_type: str = "Phong",
        background_color: Tuple[float, float, float] = (0.5, 0.5, 0.5),
        seperate_lights: bool = True,
        default_lights: bool = True,
        backend: str = "xla",
        chunk: int = 64,
        cull_backfaces: bool = False,
        **unused,
    ):
        if bank is None:
            if mesh_dir is None:
                raise ValueError("need mesh_dir or bank")
            bank = MeshBank.from_dir(mesh_dir)
        self.bank = bank
        self.image_size = tuple(image_size)
        self.shader_type = shader_type
        self.background_color = tuple(background_color)
        self.seperate_lights = seperate_lights
        self.default_lights = default_lights
        self.backend = backend
        self.chunk = chunk
        # True -> winding-safety check, ValueError on failure; 'force' ->
        # warn-and-proceed (see meshbank.resolve_cull_backfaces)
        self.cull_backfaces = resolve_cull_backfaces(bank, cull_backfaces)
        self._dev = {
            "verts": jnp.asarray(bank.verts),
            "faces": jnp.asarray(bank.faces),
            "face_valid": jnp.asarray(bank.face_valid),
            "colors": jnp.asarray(bank.colors),
            "normals": jnp.asarray(bank.normals),
            "vert_valid": jnp.asarray(bank.vert_valid),
        }

    def __call__(self, rotations, translations, K, labels) -> Dict[str, jnp.ndarray]:
        hh, ww = self.image_size
        return render_batch(
            self._dev["verts"],
            self._dev["faces"],
            self._dev["face_valid"],
            self._dev["colors"],
            self._dev["normals"],
            self._dev["vert_valid"],
            jnp.asarray(rotations),
            jnp.asarray(translations),
            jnp.asarray(K),
            jnp.asarray(labels),
            hh,
            ww,
            chunk=self.chunk,
            flat_shading=False,
            backend=self.backend,
            shading=self.shader_type.lower(),
            seperate_lights=self.seperate_lights,
            default_lights=self.default_lights,
            background_color=self.background_color,
            cull_backfaces=self.cull_backfaces,
        )
