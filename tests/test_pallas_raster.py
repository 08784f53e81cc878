"""Pallas rasterization kernels vs the XLA reference path, run on CPU via
pallas interpret mode (the TPU-compiled path is additionally checked on real
hardware by tools/check_pallas_parity.py)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scflow_tpu.ops.pallas.rasterize import (
    pack_faces_and_bin,
    pack_shaded_and_bin,
    pack_shaded_exact,
    pick_face_chunk,
    rasterize_packed_pallas,
    rasterize_shaded_pallas,
    rasterize_shaded_pallas_v3,
    rasterize_shaded_pallas_v4,
)
from scflow_tpu.render.meshbank import make_synthetic_bank
from scflow_tpu.render.rasterizer import (_gather_tri, gather_corner_attrs,
                                          project_to_screen, rasterize)


@pytest.fixture(scope="module")
def scene():
    from scipy.spatial.transform import Rotation

    nclass, batch, img = 3, 2, 128
    bank = make_synthetic_bank(nclass, kind="sphere", size=60.0, subdivisions=2)
    rng = np.random.default_rng(3)
    labels = rng.integers(0, nclass, batch)
    verts = jnp.asarray(bank.verts)[jnp.asarray(labels)]
    faces = jnp.asarray(bank.faces)[jnp.asarray(labels)]
    face_valid = jnp.asarray(bank.face_valid)[jnp.asarray(labels)]
    colors = jnp.asarray(bank.colors)[jnp.asarray(labels)]
    normals = jnp.asarray(bank.normals)[jnp.asarray(labels)]
    K = jnp.asarray(
        np.tile(np.array([[[150.0, 0, 64], [0, 150.0, 64], [0, 0, 1]]], np.float32),
                (batch, 1, 1))
    )
    R = jnp.asarray(
        np.stack([Rotation.random(random_state=i).as_matrix() for i in range(batch)]
                 ).astype(np.float32)
    )
    t = jnp.asarray(
        np.concatenate([rng.uniform(-10, 10, (batch, 2)),
                        rng.uniform(300, 400, (batch, 1))], 1).astype(np.float32)
    )
    verts_cam = jnp.einsum("nij,nvj->nvi", R, verts) + t[:, None]
    normals_cam = jnp.einsum("nij,nvj->nvi", R, normals)
    return dict(verts_cam=verts_cam, normals_cam=normals_cam, colors=colors,
                faces=faces, face_valid=face_valid, K=K, img=img)


def test_packed_kernel_matches_xla_rasterizer(scene):
    img = scene["img"]
    frag_xla = rasterize(
        scene["verts_cam"], scene["faces"], scene["face_valid"], scene["K"],
        img, img, backend="xla",
    )
    xy, z = project_to_screen(scene["verts_cam"], scene["K"])
    tri_xy, tri_z = _gather_tri(xy, z, scene["faces"])
    fc = pick_face_chunk(scene["faces"].shape[1])
    rows, active, perm = pack_faces_and_bin(
        tri_xy, tri_z, scene["face_valid"], img, img, 8, 128, fc
    )
    fp = rows.shape[-1]
    id_bits = max(1, math.ceil(math.log2(max(fp, 2))))
    win = rasterize_packed_pallas(
        rows, active, img, img, th=8, tw=128, fc=fc, id_bits=id_bits,
        interpret=True,
    ).reshape(scene["faces"].shape[0], img * img)
    background = win == jnp.int32(2**31 - 1)
    fid_sorted = jnp.where(background, 0, win & jnp.int32((1 << id_bits) - 1))
    fid = jnp.take_along_axis(perm, fid_sorted, axis=1)
    fid = jnp.where(background, -1, fid).reshape(-1, img, img)

    want_fid = np.asarray(frag_xla.face_id)
    got_fid = np.asarray(fid)
    # winner faces match away from exact z-ties (silhouette edge pixels)
    mismatch = (want_fid != got_fid).mean()
    assert mismatch < 2e-3
    # foreground coverage matches exactly
    np.testing.assert_array_equal(got_fid >= 0, want_fid >= 0)


def test_shaded_kernel_matches_xla_render(scene):
    from scflow_tpu.render.renderer import render_batch

    img = scene["img"]
    n = scene["faces"].shape[0]
    attr6 = jnp.concatenate([scene["normals_cam"], scene["colors"]], axis=-1)
    corner_attrs = jnp.stack(
        [jnp.take_along_axis(attr6, scene["faces"][:, :, j][..., None], axis=1)
         for j in range(3)],
        axis=2,
    )
    xy, z = project_to_screen(scene["verts_cam"], scene["K"])
    tri_xy, tri_z = _gather_tri(xy, z, scene["faces"])
    fc = pick_face_chunk(scene["faces"].shape[1])
    rows, active, perm = pack_shaded_and_bin(
        tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img, 8, 128, fc
    )
    id_bits = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))
    maps = rasterize_shaded_pallas(
        rows, active, img, img, th=8, tw=128, fc=fc, id_bits=id_bits,
        interpret=True,
    )
    frag = rasterize(
        scene["verts_cam"], scene["faces"], scene["face_valid"], scene["K"],
        img, img, backend="xla",
    )
    want_depth = np.asarray(frag.zbuf)
    got_depth = np.asarray(maps[:, 0])
    want_mask = want_depth > 0
    got_mask = np.asarray(maps[:, 1]) > 0.5
    np.testing.assert_array_equal(got_mask, want_mask)
    # depths agree on the (overwhelming) majority of non-tie pixels
    d = np.abs(got_depth - want_depth)
    assert (d > 0.05).mean() < 2e-3
    # interpolated attributes are sane: unit-ish normals on foreground
    nrm = np.asarray(maps[:, 3:6]).transpose(0, 2, 3, 1)
    norms = np.linalg.norm(nrm[got_mask], axis=-1)
    assert norms.min() > 0.5 and norms.max() < 1.5
    # barycentrics sum to 1 on foreground
    bsum = np.asarray(maps[:, 9] + maps[:, 10] + maps[:, 11])
    np.testing.assert_allclose(bsum[got_mask], 1.0, atol=1e-3)


def test_shaded_v3_matches_v1(scene):
    """The compacted-active-list value-carry kernel (v3, fc=128) produces
    the same fragment maps as the original shaded kernel (measured
    bit-identical on TPU; interpret mode here)."""
    img = scene["img"]
    attr6 = jnp.concatenate([scene["normals_cam"], scene["colors"]], axis=-1)
    corner_attrs = jnp.stack(
        [jnp.take_along_axis(attr6, scene["faces"][:, :, j][..., None], axis=1)
         for j in range(3)],
        axis=2,
    )
    xy, z = project_to_screen(scene["verts_cam"], scene["K"])
    tri_xy, tri_z = _gather_tri(xy, z, scene["faces"])
    fc = 128
    rows, active, perm = pack_shaded_and_bin(
        tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img, 8, 128, fc
    )
    id_bits = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))
    v1 = rasterize_shaded_pallas(
        rows, active, img, img, th=8, tw=128, fc=fc, id_bits=id_bits,
        interpret=True, version=1,
    )
    v3 = rasterize_shaded_pallas_v3(
        rows, active, img, img, th=8, tw=128, fc=fc, id_bits=id_bits,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v1), atol=1e-4)


def _corner_attrs(scene):
    attr6 = jnp.concatenate([scene["normals_cam"], scene["colors"]], axis=-1)
    return gather_corner_attrs(attr6, scene["faces"])


def _run_v3_v4(scene, img, dup, sort_mode="fused"):
    corner_attrs = _corner_attrs(scene)
    xy, z = project_to_screen(scene["verts_cam"], scene["K"])
    tri_xy, tri_z = _gather_tri(xy, z, scene["faces"])
    fc = 128
    rows3, active, perm3 = pack_shaded_and_bin(
        tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img, 8, 128, fc
    )
    id_bits3 = max(1, math.ceil(math.log2(max(rows3.shape[-1], 2))))
    v3 = rasterize_shaded_pallas_v3(
        rows3, active, img, img, th=8, tw=128, fc=fc, id_bits=id_bits3,
        interpret=True,
    )
    rows4, seg_start, seg_count, ov_counts, ov_order, perm4 = pack_shaded_exact(
        tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img, 8, 128,
        fc, dup=dup, sort_mode=sort_mode,
    )
    id_bits4 = max(1, math.ceil(math.log2(max(rows4.shape[-1], 2))))
    v4 = rasterize_shaded_pallas_v4(
        rows4, seg_start, seg_count, ov_counts, ov_order, img, img,
        th=8, tw=128, fc=fc, id_bits=id_bits4, interpret=True,
    )
    return v3, perm3, id_bits3, v4, perm4, id_bits4


@pytest.mark.parametrize("dup,sort_mode", [(8, "fused"), (1, "fused"),
                                           (8, "two_op")])
def test_shaded_v4_exact_binning_matches_v3(scene, dup, sort_mode):
    """The exact-binned kernel (v4) must produce the same fragment maps as
    v3 for every channel except the raw entry-id (2), and the same ORIGINAL
    winner faces through its perm.  dup=1 forces nearly every face through
    the overflow segment, covering the bbox-activity fallback path;
    sort_mode covers both the fused single-operand entry sort and the
    variadic fallback."""
    img = scene["img"]
    v3, perm3, idb3, v4, perm4, idb4 = _run_v3_v4(scene, img, dup, sort_mode)
    a, b = np.asarray(v3), np.asarray(v4)
    # depth/mask exact; attrs can flip only on exact packed-key z-ties
    np.testing.assert_array_equal(b[:, 1], a[:, 1])
    d = np.abs(b[:, 0] - a[:, 0])
    assert (d > 1e-3).mean() < 2e-3
    for ch in list(range(3, 12)):
        assert (np.abs(b[:, ch] - a[:, ch]) > 1e-3).mean() < 2e-3, ch
    # winner original-face ids agree (away from z-tie pixels)
    fg = a[:, 1] > 0.5
    fid3 = np.take_along_axis(
        np.asarray(perm3), a[:, 2].astype(np.int64).reshape(a.shape[0], -1), 1
    ).reshape(a[:, 2].shape)
    fid4 = np.take_along_axis(
        np.asarray(perm4), b[:, 2].astype(np.int64).reshape(b.shape[0], -1), 1
    ).reshape(b[:, 2].shape)
    assert (fid3[fg] != fid4[fg]).mean() < 2e-3


def test_pack_sort_modes_agree(scene, monkeypatch):
    """'gather' (key+id sort, one whole-row reorder) must be bit-identical
    to 'payload' (every column rides the sort): both are stable, so the
    permutation — and therefore every packed row, activity bin, and perm —
    is the same."""
    import scflow_tpu.ops.pallas.rasterize as rz

    xy, z = project_to_screen(scene["verts_cam"], scene["K"])
    tri_xy, tri_z = _gather_tri(xy, z, scene["faces"])
    attr6 = jnp.concatenate([scene["normals_cam"], scene["colors"]], axis=-1)
    corner_attrs = gather_corner_attrs(attr6, scene["faces"])
    img = scene["img"]

    outs = {}
    for mode in ("payload", "gather"):
        monkeypatch.setattr(rz, "_SORT_MODE", mode)
        outs[mode] = pack_shaded_and_bin(
            tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img,
            8, 128, 128)
    for a, b in zip(outs["payload"], outs["gather"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_backface_culling_identical_render(scene):
    """Opt-in backface culling (closed, consistently-wound meshes): culled
    and unculled renders must produce the same maps — a backface can never
    win the depth test of a closed mesh, so dropping the ~50% back-facing
    faces only removes dead coverage work.  Checked on the XLA rasterizer
    (exact) and the v3 shaded kernel in interpret mode."""
    img = scene["img"]
    frags = {}
    for cull in (False, True):
        frags[cull] = rasterize(
            scene["verts_cam"], scene["faces"], scene["face_valid"],
            scene["K"], img, img, backend="xla", cull_backfaces=cull,
        )
    assert np.asarray(frags[False].face_id).max() >= 0  # non-empty scene
    np.testing.assert_array_equal(
        np.asarray(frags[True].face_id), np.asarray(frags[False].face_id))
    np.testing.assert_array_equal(
        np.asarray(frags[True].zbuf), np.asarray(frags[False].zbuf))
    np.testing.assert_array_equal(
        np.asarray(frags[True].bary), np.asarray(frags[False].bary))

    xy, z = project_to_screen(scene["verts_cam"], scene["K"])
    tri_xy, tri_z = _gather_tri(xy, z, scene["faces"])
    attr6 = jnp.concatenate([scene["normals_cam"], scene["colors"]], axis=-1)
    corner_attrs = gather_corner_attrs(attr6, scene["faces"])
    maps = {}
    for cull in (False, True):
        rows, active, perm = pack_shaded_and_bin(
            tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img,
            8, 128, 128, cull_backfaces=cull)
        id_bits = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))
        m = rasterize_shaded_pallas_v3(
            rows, active, img, img, th=8, tw=128, fc=128, id_bits=id_bits,
            interpret=True)
        # culling changes the sorted face order, so map the winner channel
        # back to original face ids before comparing
        fid = np.take_along_axis(
            np.asarray(perm),
            np.asarray(m[:, 2]).astype(np.int64).reshape(m.shape[0], -1), 1
        ).reshape(np.asarray(m[:, 2]).shape)
        fg = np.asarray(m[:, 1]) > 0.5
        maps[cull] = (np.asarray(m), np.where(fg, fid, -1))
    a, fid_a = maps[False]
    b, fid_b = maps[True]
    np.testing.assert_array_equal(b[:, 1], a[:, 1])  # mask
    np.testing.assert_array_equal(b[:, 0], a[:, 0])  # depth
    np.testing.assert_array_equal(fid_b, fid_a)  # winner faces
    for ch in range(3, 12):  # normals / colors / barycentrics
        np.testing.assert_array_equal(b[:, ch], a[:, ch])

    # the point of culling: roughly half the faces leave the pack alive
    # (rows channel 10 is the sorted valid column)
    n_live = {}
    for cull in (False, True):
        rows, _, _ = pack_shaded_and_bin(
            tri_xy, tri_z, scene["face_valid"], corner_attrs, img, img,
            8, 128, 128, cull_backfaces=cull)
        n_live[cull] = float(np.asarray(rows[:, 10]).sum())
    assert n_live[True] < 0.65 * n_live[False]
