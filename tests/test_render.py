"""Renderer tests: analytic depth checks on synthetic meshes, PLY roundtrip,
consistency between rendered depth and the geometry lift."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from scflow_tpu.geometry import lift_depth_to_object_points
from scflow_tpu.render import MeshBank, Renderer, load_ply, rasterize
from scflow_tpu.render.meshbank import make_synthetic_bank
from scflow_tpu.render.ply import PlyMesh


def simple_K(n, f=120.0, c=32.0):
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1]], np.float32)
    return np.tile(K[None], (n, 1, 1))


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        bank = make_synthetic_bank(1)
        v = bank.verts[0][bank.vert_valid[0]]
        f = bank.faces[0][bank.face_valid[0]]
        c = (bank.colors[0][bank.vert_valid[0]] * 255).astype(np.uint8)
        p = tmp_path / "obj_000001.ply"
        with open(p, "wb") as fh:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(v)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                f"element face {len(f)}\n"
                "property list uchar int vertex_indices\nend_header\n"
            )
            fh.write(header.encode())
            for i in range(len(v)):
                fh.write(v[i].astype("<f4").tobytes())
                fh.write(c[i].tobytes())
            for i in range(len(f)):
                fh.write(np.uint8(3).tobytes())
                fh.write(f[i].astype("<i4").tobytes())
        mesh = load_ply(str(p))
        np.testing.assert_allclose(mesh.vertices, v, atol=1e-6)
        np.testing.assert_array_equal(mesh.faces, f)
        np.testing.assert_allclose(mesh.colors * 255, c, atol=1.0)

    def test_roundtrip_ascii(self, tmp_path):
        p = tmp_path / "tri.ply"
        p.write_text(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
            "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
        )
        mesh = load_ply(str(p))
        assert mesh.vertices.shape == (3, 3)
        np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])


class TestRasterizer:
    def test_single_triangle_depth(self):
        # triangle at constant z=500, centered on the optical axis
        verts = jnp.asarray(
            [[[-100.0, -100.0, 500.0], [100.0, -100.0, 500.0], [0.0, 150.0, 500.0]]]
        )
        faces = jnp.asarray([[[0, 1, 2]]], jnp.int32)
        fv = jnp.ones((1, 1), bool)
        K = jnp.asarray(simple_K(1))
        frag = rasterize(verts, faces, fv, K, 64, 64, chunk=8)
        zb = np.asarray(frag.zbuf[0])
        assert (zb[zb > 0] - 500.0).max() < 1e-2
        # center pixel covered
        assert zb[32, 32] > 0
        # corners background
        assert zb[0, 0] == 0 and np.asarray(frag.face_id[0])[0, 0] == -1

    def test_depth_ordering_two_triangles(self):
        # near triangle must win the z-test
        verts = jnp.asarray(
            [[
                [-100.0, -100.0, 500.0], [100.0, -100.0, 500.0], [0.0, 150.0, 500.0],
                [-100.0, -100.0, 300.0], [100.0, -100.0, 300.0], [0.0, 150.0, 300.0],
            ]]
        )
        faces = jnp.asarray([[[0, 1, 2], [3, 4, 5]]], jnp.int32)
        fv = jnp.ones((1, 2), bool)
        frag = rasterize(verts, faces, fv, jnp.asarray(simple_K(1)), 64, 64, chunk=8)
        assert abs(np.asarray(frag.zbuf)[0, 32, 32] - 300.0) < 1e-2
        assert np.asarray(frag.face_id)[0, 32, 32] == 1

    def test_padding_faces_ignored(self):
        verts = jnp.asarray(
            [[[-100.0, -100.0, 500.0], [100.0, -100.0, 500.0], [0.0, 150.0, 500.0]]]
        )
        faces = jnp.asarray([[[0, 1, 2], [0, 0, 0], [0, 0, 0]]], jnp.int32)
        fv = jnp.asarray([[True, False, False]])
        frag = rasterize(verts, faces, fv, jnp.asarray(simple_K(1)), 32, 32, chunk=2)
        assert np.asarray(frag.face_id).max() == 0


class TestRenderer:
    @pytest.fixture(scope="class")
    def renderer(self):
        return Renderer(bank=make_synthetic_bank(3), image_size=(64, 64), chunk=16)

    def test_render_outputs(self, renderer):
        n = 3
        R = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        t = np.tile(np.array([[0, 0, 400.0]], np.float32), (n, 1))
        K = simple_K(n)
        labels = np.array([0, 1, 2])
        out = renderer(R, t, K, labels)
        imgs = np.asarray(out["images"])
        depths = np.asarray(out["depths"])
        masks = np.asarray(out["masks"])
        assert imgs.shape == (n, 64, 64, 3)
        assert (imgs >= 0).all() and (imgs <= 1).all()
        # object visible in the center, roughly at distance t_z
        assert masks[:, 32, 32].all()
        for i in range(n):
            d = depths[i][masks[i] > 0]
            assert 300 < d.min() < 400.01
        # larger class index -> larger mesh -> larger footprint
        assert masks[2].sum() > masks[0].sum()
        # background color 0.5
        np.testing.assert_allclose(imgs[0, 0, 0], [0.5, 0.5, 0.5], atol=1e-6)

    def test_background_color_honored(self):
        """Renderer(background_color=...) reaches the shader (was a dead
        parameter masked by the config's 0.5 gray matching the default)."""
        r = Renderer(bank=make_synthetic_bank(1), image_size=(64, 64),
                     chunk=16, background_color=(0.0, 0.25, 1.0))
        R = np.eye(3, dtype=np.float32)[None]
        t = np.array([[0, 0, 400.0]], np.float32)
        out = r(R, t, simple_K(1), np.array([0]))
        np.testing.assert_allclose(
            np.asarray(out["images"])[0, 0, 0], [0.0, 0.25, 1.0], atol=1e-6
        )

    def test_light_branches_differ(self):
        """The four (seperate_lights, default_lights) reference branches
        place/color lights differently (rendering.py:194-213) — each pair
        must produce distinct foreground shading."""
        from scipy.spatial.transform import Rotation

        bank = make_synthetic_bank(1)
        R = np.asarray(
            Rotation.from_euler("xyz", [30, 40, 10], degrees=True)
            .as_matrix()[None], np.float32,
        )
        t = np.array([[0, 0, 400.0]], np.float32)
        imgs = {}
        for sep in (True, False):
            for dflt in (True, False):
                r = Renderer(bank=bank, image_size=(64, 64), chunk=16,
                             seperate_lights=sep, default_lights=dflt)
                imgs[(sep, dflt)] = np.asarray(
                    r(R, t, simple_K(1), np.array([0]))["images"]
                )
        keys = list(imgs)
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                assert np.abs(imgs[a] - imgs[b]).max() > 1e-4, (a, b)

    def test_render_depth_matches_full_render(self):
        """render_depth (raster-only fast path for depth supervision)
        returns the same zbuf as the full shaded render."""
        from scflow_tpu.refiners.system import (RenderAssets,
                                                render_and_normalize,
                                                render_depth)

        bank = make_synthetic_bank(2)
        ra = RenderAssets.from_bank(bank)
        R = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
        t = np.tile(np.array([[0, 0, 400.0]], np.float32), (2, 1))
        K = simple_K(2)
        labels = np.array([0, 1])
        _, depths_full, _ = render_and_normalize(
            ra, R, t, K, labels, (64, 64), (0.0,) * 3, (255.0,) * 3, chunk=16
        )
        depths_only = render_depth(ra, R, t, K, labels, (64, 64), chunk=16)
        np.testing.assert_allclose(
            np.asarray(depths_only), np.asarray(depths_full), atol=1e-5
        )

    def test_cube_front_face_depth_analytic(self, renderer):
        """Front face of a cube (size 60) at z=400 sits at exactly 370."""
        R = np.eye(3, dtype=np.float32)[None]
        t = np.array([[0, 0, 400.0]], np.float32)
        out = renderer(R, t, simple_K(1), np.array([0]))
        d_center = float(np.asarray(out["depths"])[0, 32, 32])
        assert abs(d_center - 370.0) < 0.5

    def test_depth_consistent_with_lift(self, renderer):
        """Rendered depth lifted to the object frame must land inside the
        mesh bounding box — the invariant the SCFlow decoder relies on."""
        R = np.tile(np.eye(3, dtype=np.float32)[None], (1, 1, 1))
        t = np.array([[10.0, -5.0, 420.0]], np.float32)
        K = simple_K(1)
        out = renderer(R, t, K, np.array([0]))
        pts, valid = lift_depth_to_object_points(
            out["depths"], jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)
        )
        p = np.asarray(pts)[np.asarray(valid)]
        assert np.abs(p).max() < 31.0  # cube half-size is 30

    def test_rotation_changes_image(self, renderer):
        from scipy.spatial.transform import Rotation

        t = np.array([[0, 0, 400.0]], np.float32)
        K = simple_K(1)
        img0 = np.asarray(renderer(np.eye(3, dtype=np.float32)[None], t, K, np.array([0]))["images"])
        R1 = Rotation.from_euler("xyz", [30, 40, 10], degrees=True).as_matrix()
        img1 = np.asarray(renderer(R1[None].astype(np.float32), t, K, np.array([0]))["images"])
        assert np.abs(img0 - img1).max() > 0.05


class TestWindingCheck:
    def test_synthetic_banks_pass(self):
        for kind in ("uvsphere", "cube"):
            bank = make_synthetic_bank(2, kind=kind)
            assert bank.closed_consistently_wound().all(), kind

    def test_flipped_and_open_fail(self):
        bank = make_synthetic_bank(1, kind="uvsphere")
        bank.faces = bank.faces[:, :, ::-1].copy()  # inward winding
        assert not bank.closed_consistently_wound().any()
        bank2 = make_synthetic_bank(1, kind="cube")
        bank2.face_valid[0, 0] = False  # open surface
        assert not bank2.closed_consistently_wound().any()

    def test_seam_split_vertices_welded(self):
        """Geometrically closed meshes with seam-split vertices (duplicate
        positions for per-vertex normals/UVs — common in real scan PLYs)
        must still pass: edges are matched by welded position."""
        bank = make_synthetic_bank(1, kind="uvsphere")
        f = bank.faces[0].copy()
        v = bank.verts[0]
        nv = int(bank.vert_valid[0].sum())
        # split vertex 5: faces using it via corner 0 keep index 5, the
        # rest point at a duplicate position appended at nv
        dup_of = 5
        grew = np.concatenate([v[:nv], v[dup_of][None]], axis=0)
        uses = f == dup_of
        uses[:, 0] = False
        f = np.where(uses, nv, f)
        import dataclasses

        bank2 = dataclasses.replace(
            bank,
            verts=grew[None].astype(np.float32),
            faces=f[None],
            colors=np.full_like(grew[None], 0.7),
            normals=np.zeros_like(grew[None]),
            vert_valid=np.ones((1, len(grew)), bool),
        )
        assert bank2.closed_consistently_wound().all()

    def test_unsafe_cull_raises_and_force_warns(self):
        import warnings

        import pytest

        bank = make_synthetic_bank(1, kind="uvsphere")
        bank.faces = bank.faces[:, :, ::-1].copy()
        with pytest.raises(ValueError, match="cull_backfaces"):
            Renderer(bank=bank, image_size=(64, 64), cull_backfaces=True)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            r = Renderer(bank=bank, image_size=(64, 64),
                         cull_backfaces="force")
        assert any("cull_backfaces" in str(w.message) for w in rec)
        assert r.cull_backfaces is True
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            r = Renderer(bank=make_synthetic_bank(1, kind="uvsphere"),
                         image_size=(64, 64), cull_backfaces=True)
        assert not any("cull_backfaces" in str(w.message) for w in rec)
        assert r.cull_backfaces is True
