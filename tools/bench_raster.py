#!/usr/bin/env python
"""Micro-benchmark of the renderer's Pallas path on the bench.py workload
(batch 64, 256², 2048-face sphere bank) — isolates the raster kernel and
its XLA-side pack so kernel variants can be compared quickly.

Times (device-synced via a scalar fetch, remote-backend safe):
  pack+kernel+shade (render_batch, the product path)
  pack only          (pack_shaded_and_bin + the v3 argsort/counts compact)

Usage: python tools/bench_raster.py [--batch 64] [--rounds 30] [--version 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import (apply_env_platform,
                                       check_remote_backend_reachable,
                                       enable_compilation_cache)

check_remote_backend_reachable()
apply_env_platform()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, rounds=30):
    out = fn(*a)
    float(np.asarray(jax.device_get(out)))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*a)
    float(np.asarray(jax.device_get(out)))
    return (time.perf_counter() - t0) / rounds * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--img", type=int, default=256)
    args = ap.parse_args()

    from scflow_tpu.refiners.system import RenderAssets
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.render.renderer import render_batch

    batch, img, nclass = args.batch, args.img, 21
    bank = make_synthetic_bank(nclass, kind="uvsphere", size=80.0)
    ra = RenderAssets.from_bank(bank)
    rng = np.random.default_rng(0)
    K = jnp.asarray(np.tile(np.array(
        [[[572.4, 0, img / 2], [0, 573.5, img / 2], [0, 0, 1]]], np.float32),
        (batch, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    @jax.jit
    def full(R, t, K, labels):
        out = render_batch(ra.verts, ra.faces, ra.face_valid, ra.colors,
                           ra.normals, ra.vert_valid, R, t, K, labels,
                           img, img, chunk=batch, backend=backend)
        return (out["images"].sum() + out["depths"].sum()
                + out["masks"].sum())

    ms_full = timeit(full, R, t, K, labels, rounds=args.rounds)

    # stage split (pallas path only): pack | kernel | total
    stages = {}
    if backend == "pallas":
        import math

        from scflow_tpu.ops.pallas.rasterize import (
            pack_shaded_and_bin, rasterize_shaded_pallas_v3)
        from scflow_tpu.render.rasterizer import (_gather_tri,
                                                  gather_corner_attrs,
                                                  project_to_screen)

        labels_i = labels.astype(jnp.int32)
        verts = jnp.take(ra.verts, labels_i, axis=0)
        faces = jnp.take(ra.faces, labels_i, axis=0)
        face_valid = jnp.take(ra.face_valid, labels_i, axis=0)
        colors = jnp.take(ra.colors, labels_i, axis=0)
        normals = jnp.take(ra.normals, labels_i, axis=0)
        verts_cam = jnp.einsum("nij,nvj->nvi", R, verts) + t[:, None]
        normals_cam = jnp.einsum("nij,nvj->nvi", R, normals)

        @jax.jit
        def pack(verts_cam, normals_cam):
            xy, z = project_to_screen(verts_cam, K)
            tri_xy, tri_z = _gather_tri(xy, z, faces)
            attr6 = jnp.concatenate([normals_cam, colors], axis=-1)
            corner_attrs = gather_corner_attrs(attr6, faces)
            rows, active, _ = pack_shaded_and_bin(
                tri_xy, tri_z, face_valid, corner_attrs, img, img, 8, 128,
                128)
            return rows, active

        rows, active = pack(verts_cam, normals_cam)
        rows = jax.device_put(rows)
        active = jax.device_put(active)
        id_bits = max(1, math.ceil(math.log2(max(rows.shape[-1], 2))))

        @jax.jit
        def pack_s(verts_cam, normals_cam):
            r, a = pack(verts_cam, normals_cam)
            return r.sum() + a.sum()

        @jax.jit
        def kernel_s(rows, active):
            return rasterize_shaded_pallas_v3(
                rows, active, img, img, th=8, tw=128, fc=128,
                id_bits=id_bits).sum()

        stages["pack_ms"] = round(
            timeit(pack_s, verts_cam, normals_cam, rounds=args.rounds), 2)
        stages["kernel_ms"] = round(
            timeit(kernel_s, rows, active, rounds=args.rounds), 2)

    print(json.dumps({
        "batch": batch, "backend": backend,
        "render_ms": round(ms_full, 2),
        "per_obj_us": round(ms_full / batch * 1e3, 1),
        **stages,
    }))


if __name__ == "__main__":
    main()
