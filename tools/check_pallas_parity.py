"""TPU-only check: the fused Pallas raster+shade path must match the XLA
reference path (render/rasterizer.py + render/shading.py) on both large and
tiny meshes.  Run on a real TPU (the Pallas kernels don't run on CPU):

    python tools/check_pallas_parity.py
"""

import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.render.renderer import render_batch

    assert jax.default_backend() == "tpu", "run this on a TPU"

    rng = np.random.default_rng(0)
    failures = 0
    for kind, subdiv, nclass in (("sphere", 4, 8), ("cube", 0, 4)):
        bank = make_synthetic_bank(nclass, kind=kind, size=80.0,
                                   subdivisions=subdiv)
        batch, img = 8, 256
        labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
        K = jnp.asarray(
            np.tile(
                np.array([[[572.4, 0, 128], [0, 573.5, 128], [0, 0, 1]]],
                         np.float32),
                (batch, 1, 1),
            )
        )
        from scipy.spatial.transform import Rotation

        R = jnp.asarray(
            np.stack([Rotation.random(random_state=i).as_matrix()
                      for i in range(batch)]).astype(np.float32)
        )
        t = jnp.asarray(
            np.concatenate(
                [rng.uniform(-30, 30, (batch, 2)),
                 rng.uniform(500, 900, (batch, 1))],
                axis=1,
            ).astype(np.float32)
        )
        args = (
            jnp.asarray(bank.verts), jnp.asarray(bank.faces),
            jnp.asarray(bank.face_valid), jnp.asarray(bank.colors),
            jnp.asarray(bank.normals), jnp.asarray(bank.vert_valid),
            R, t, K, labels, img, img,
        )
        ref = render_batch(*args, backend="xla")
        out = render_batch(*args, backend="pallas")
        for key, atol in (("depths", 0.05), ("masks", 0.0), ("images", 0.02)):
            a = np.asarray(ref[key])
            b = np.asarray(out[key])
            # the two backends may pick different faces on exact z-ties at
            # silhouette pixels; compare away from the mask boundary
            mismatch = np.abs(a - b) > atol
            frac = mismatch.mean()
            ok = frac < 2e-3
            print(f"{kind}: {key:7s} mismatch frac {frac:.2e} "
                  f"max |d| {np.abs(a - b).max():.4f} -> "
                  f"{'OK' if ok else 'FAIL'}")
            failures += 0 if ok else 1
    if failures:
        sys.exit(f"{failures} parity check(s) failed")
    print("pallas/xla parity OK")


def kernel_versions():
    """Compare the three shaded-kernel generations ON HARDWARE.

    v2/v3 select the 18 attribute rows (corner normals/colors) with a
    default-precision matmul — bf16-rounded on TPU, unlike v1's
    Precision.HIGHEST selection — so CPU interpret-mode equality tests
    cannot surface the rounding.  This prints the measured per-row-group
    max |delta| so the accepted error is a number, not a guess.
    """
    import math

    import jax
    import jax.numpy as jnp

    from scflow_tpu.ops.pallas.rasterize import (
        pack_shaded_and_bin,
        pick_face_chunk,
        rasterize_shaded_pallas,
        rasterize_shaded_pallas_v3,
    )
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.render.rasterizer import (_gather_tri, gather_corner_attrs,
                                              project_to_screen)

    assert jax.default_backend() == "tpu", "run this on a TPU"
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(1)
    nclass, batch, img = 4, 8, 256
    bank = make_synthetic_bank(nclass, kind="sphere", size=80.0, subdivisions=4)
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    verts = jnp.asarray(bank.verts)[labels]
    faces = jnp.asarray(bank.faces)[labels]
    face_valid = jnp.asarray(bank.face_valid)[labels]
    R = jnp.asarray(np.stack([Rotation.random(random_state=i).as_matrix()
                              for i in range(batch)]).astype(np.float32))
    t = jnp.asarray(np.concatenate(
        [rng.uniform(-30, 30, (batch, 2)), rng.uniform(500, 900, (batch, 1))],
        axis=1).astype(np.float32))
    K = jnp.asarray(np.tile(
        np.array([[[572.4, 0, 128], [0, 573.5, 128], [0, 0, 1]]], np.float32),
        (batch, 1, 1)))
    verts_cam = jnp.einsum("nij,nvj->nvi", R, verts) + t[:, None]
    normals_cam = jnp.einsum(
        "nij,nvj->nvi", R, jnp.asarray(bank.normals)[labels])
    attr6 = jnp.concatenate(
        [normals_cam, jnp.asarray(bank.colors)[labels]], axis=-1)
    corner_attrs = gather_corner_attrs(attr6, faces)
    xy, z = project_to_screen(verts_cam, K)
    tri_xy, tri_z = _gather_tri(xy, z, faces)
    fc = pick_face_chunk(faces.shape[1])
    rows, active, _ = pack_shaded_and_bin(
        tri_xy, tri_z, face_valid, corner_attrs, img, img, 8, 128, fc)
    id_bits = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))
    kw = dict(h=img, w=img, th=8, tw=128, fc=fc, id_bits=id_bits)
    v1 = np.asarray(rasterize_shaded_pallas(rows, active, version=1, **kw))
    v2 = np.asarray(rasterize_shaded_pallas(rows, active, version=2, **kw))
    v3 = np.asarray(rasterize_shaded_pallas_v3(rows, active, **kw))
    groups = {"depth/mask/id (0-2)": slice(0, 3), "normals (3-5)": slice(3, 6),
              "colors (6-8)": slice(6, 9), "barycentrics (9-11)": slice(9, 12)}
    failures = 0
    for name, out in (("v2", v2), ("v3", v3)):
        for gname, sl in groups.items():
            d = np.abs(out[:, sl] - v1[:, sl])
            # winner-tie pixels can differ discretely; report the 99.99th
            # percentile (rounding) alongside the raw max (ties)
            p = np.percentile(d, 99.99)
            ok = p < 5e-3
            print(f"{name} vs v1  {gname:22s} max|d|={d.max():.3e} "
                  f"p99.99={p:.3e} -> {'OK' if ok else 'FAIL'}")
            failures += 0 if ok else 1
    if failures:
        sys.exit(f"{failures} kernel-version check(s) failed")
    print("shaded kernel v1/v2/v3 parity OK (rounding within documented bound)")


def v4_timing(batch=16, img=256, rounds=50):
    """Measure the exact-binned v4 raster path against v3 ON HARDWARE at the
    bench workload (batch 16, 256², 2048-face spheres) and report per-call
    ms (pack+kernel jitted together) plus output agreement."""
    import math
    import time

    import jax
    import jax.numpy as jnp

    from scflow_tpu.ops.pallas.rasterize import (
        pack_shaded_and_bin,
        pack_shaded_exact,
        rasterize_shaded_pallas_v3,
        rasterize_shaded_pallas_v4,
    )
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.render.rasterizer import (_gather_tri, gather_corner_attrs,
                                              project_to_screen)

    assert jax.default_backend() == "tpu", "run this on a TPU"
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(2)
    nclass = 21
    bank = make_synthetic_bank(nclass, kind="sphere", size=80.0, subdivisions=4)
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    faces = jnp.asarray(bank.faces)[labels]
    face_valid = jnp.asarray(bank.face_valid)[labels]
    R = jnp.asarray(np.stack([Rotation.random(random_state=i).as_matrix()
                              for i in range(batch)]).astype(np.float32))
    t = jnp.asarray(np.concatenate(
        [rng.uniform(-30, 30, (batch, 2)), rng.uniform(500, 900, (batch, 1))],
        axis=1).astype(np.float32))
    K = jnp.asarray(np.tile(
        np.array([[[572.4, 0, img / 2], [0, 573.5, img / 2], [0, 0, 1]]],
                 np.float32), (batch, 1, 1)))
    verts_cam = jnp.einsum(
        "nij,nvj->nvi", R, jnp.asarray(bank.verts)[labels]) + t[:, None]
    normals_cam = jnp.einsum(
        "nij,nvj->nvi", R, jnp.asarray(bank.normals)[labels])
    attr6 = jnp.concatenate(
        [normals_cam, jnp.asarray(bank.colors)[labels]], axis=-1)
    corner_attrs = gather_corner_attrs(attr6, faces)
    xy, z = project_to_screen(verts_cam, K)
    tri_xy, tri_z = _gather_tri(xy, z, faces)
    th, tw, fc = 8, 128, 128

    @jax.jit
    def run_v3(tri_xy, tri_z, face_valid, corner_attrs):
        rows, active, _ = pack_shaded_and_bin(
            tri_xy, tri_z, face_valid, corner_attrs, img, img, th, tw, fc)
        idb = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))
        return rasterize_shaded_pallas_v3(
            rows, active, img, img, th=th, tw=tw, fc=fc, id_bits=idb)

    @jax.jit
    def run_v4(tri_xy, tri_z, face_valid, corner_attrs):
        rows, ss, sc, oc, oo, _ = pack_shaded_exact(
            tri_xy, tri_z, face_valid, corner_attrs, img, img, th, tw, fc)
        idb = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))
        return rasterize_shaded_pallas_v4(
            rows, ss, sc, oc, oo, img, img, th=th, tw=tw, fc=fc, id_bits=idb)

    outs = {}
    for name, fn in (("v3", run_v3), ("v4", run_v4)):
        o = fn(tri_xy, tri_z, face_valid, corner_attrs)
        float(o.sum())  # host-fetch sync (block_until_ready unreliable)
        t0 = time.perf_counter()
        for _ in range(rounds):
            o = fn(tri_xy, tri_z, face_valid, corner_attrs)
        float(o.sum())
        dt = (time.perf_counter() - t0) / rounds * 1e3
        outs[name] = np.asarray(o)
        print(f"{name}: {dt:.2f} ms/call (pack+kernel, batch {batch})")
    a, b = outs["v3"], outs["v4"]
    print("mask diff px:", int((a[:, 1] != b[:, 1]).sum()),
          " depth >1e-3 frac:", float((np.abs(a[:, 0] - b[:, 0]) > 1e-3).mean()),
          " normals >1e-2 frac:",
          float((np.abs(a[:, 3:6] - b[:, 3:6]) > 1e-2).mean()))

    # split timings: pack alone (jitted) and kernel alone on pre-packed input
    pack3 = jax.jit(lambda *a: pack_shaded_and_bin(*a, img, img, th, tw, fc))
    pack4 = jax.jit(lambda *a: pack_shaded_exact(*a, img, img, th, tw, fc))
    pack4_2op = jax.jit(lambda *a: pack_shaded_exact(
        *a, img, img, th, tw, fc, sort_mode="two_op"))
    pack4_d4 = jax.jit(lambda *a: pack_shaded_exact(
        *a, img, img, th, tw, fc, dup=4))
    args = (tri_xy, tri_z, face_valid, corner_attrs)
    for name, fn in (("pack_v3", pack3), ("pack_v4", pack4),
                     ("pack_v4_2op", pack4_2op), ("pack_v4_dup4", pack4_d4)):
        o = fn(*args)
        float(o[0].sum())
        t0 = time.perf_counter()
        for _ in range(rounds):
            o = fn(*args)
        float(o[0].sum())
        print(f"{name}: {(time.perf_counter() - t0) / rounds * 1e3:.2f} ms")
    p3 = pack3(*args)
    p4 = pack4(*args)
    idb3 = max(1, math.ceil(math.log2(max(p3[0].shape[-1], 2))))
    idb4 = max(1, math.ceil(math.log2(max(p4[0].shape[-1], 2))))
    k3 = jax.jit(lambda r, ac: rasterize_shaded_pallas_v3(
        r, ac, img, img, th=th, tw=tw, fc=fc, id_bits=idb3))
    k4 = jax.jit(lambda r, ss, sc, oc, oo: rasterize_shaded_pallas_v4(
        r, ss, sc, oc, oo, img, img, th=th, tw=tw, fc=fc, id_bits=idb4))
    p4d4 = pack4_d4(*args)
    for name, fn, a_ in (("kern_v3", k3, (p3[0], p3[1])),
                         ("kern_v4", k4, p4[:5]),
                         ("kern_v4_dup4", k4, p4d4[:5])):
        o = fn(*a_)
        float(o.sum())
        t0 = time.perf_counter()
        for _ in range(rounds):
            o = fn(*a_)
        float(o.sum())
        print(f"{name}: {(time.perf_counter() - t0) / rounds * 1e3:.2f} ms")

    # sort-only: is the global entry sort the pack's dominant cost?
    e = tri_xy.shape[1] * 8
    keys = jnp.asarray(
        rng.integers(0, 130, (batch, e)).astype(np.int32))
    fids = jnp.asarray(
        rng.integers(0, tri_xy.shape[1], (batch, e)).astype(np.int32))
    s1 = jax.jit(lambda k, f: jax.lax.sort(
        jnp.left_shift(k, 11) | f, dimension=1))
    s2 = jax.jit(lambda k, f: jax.lax.sort(
        [k, f], dimension=1, num_keys=1, is_stable=True)[1])
    for name, fn in (("sort_fused", s1), ("sort_two_op", s2)):
        o = fn(keys, fids)
        float(jnp.sum(o))
        t0 = time.perf_counter()
        for _ in range(rounds):
            o = fn(keys, fids)
        float(jnp.sum(o))
        print(f"{name}: {(time.perf_counter() - t0) / rounds * 1e3:.2f} ms")


if __name__ == "__main__":
    import sys as _sys

    if "--v4-timing" in _sys.argv:
        v4_timing()
    else:
        main()
        kernel_versions()
