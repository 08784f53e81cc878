"""Padded per-class mesh banks — the static-shape replacement for the
reference's ragged per-class mesh lists (models/utils/rendering.py:122-131,
models/loss/point_matching_loss.py:51-59).

All classes are padded to a common (V, F); padding faces are degenerate
(0,0,0) triangles with `face_valid` False, padding vertices sit at the
origin with `vert_valid` False.  Everything is a plain numpy/JAX array, so a
batch gathers its meshes with one `take` — no host loop, no ragged joins.
"""

import os
from dataclasses import dataclass
from glob import glob
from typing import List, Optional, Sequence

import numpy as np

from scflow_tpu.render.ply import PlyMesh, load_ply


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class MeshBank:
    verts: np.ndarray  # (C, V, 3) float32
    faces: np.ndarray  # (C, F, 3) int32
    colors: np.ndarray  # (C, V, 3) float32 in [0, 1]
    normals: np.ndarray  # (C, V, 3) float32
    vert_valid: np.ndarray  # (C, V) bool
    face_valid: np.ndarray  # (C, F) bool
    diameters: np.ndarray  # (C,) float32
    class_names: Optional[Sequence[str]] = None

    @property
    def num_class(self) -> int:
        return self.verts.shape[0]

    @classmethod
    def from_meshes(cls, meshes: List[PlyMesh], pad_multiple: int = 8,
                    class_names=None, diameters=None) -> "MeshBank":
        vmax = _round_up(max(len(m.vertices) for m in meshes), pad_multiple)
        fmax = _round_up(max(len(m.faces) for m in meshes), pad_multiple)
        c = len(meshes)
        verts = np.zeros((c, vmax, 3), np.float32)
        faces = np.zeros((c, fmax, 3), np.int32)
        colors = np.full((c, vmax, 3), 0.7, np.float32)
        normals = np.zeros((c, vmax, 3), np.float32)
        vert_valid = np.zeros((c, vmax), bool)
        face_valid = np.zeros((c, fmax), bool)
        diams = np.zeros((c,), np.float32)
        for i, m in enumerate(meshes):
            nv, nf = len(m.vertices), len(m.faces)
            verts[i, :nv] = m.vertices
            faces[i, :nf] = m.faces
            if m.colors is not None:
                colors[i, :nv] = m.colors
            n = m.normals if m.normals is not None else m.compute_vertex_normals()
            normals[i, :nv] = n
            vert_valid[i, :nv] = True
            face_valid[i, :nf] = True
            diams[i] = diameters[i] if diameters is not None else m.diameter
        return cls(verts, faces, colors, normals, vert_valid, face_valid, diams,
                   class_names)

    @classmethod
    def from_dir(cls, mesh_dir: str, ext: str = ".ply", pad_multiple: int = 8,
                 diameters=None) -> "MeshBank":
        """Load obj_XXXXXX.ply files sorted by path (labels are the sorted
        order minus 1, matching rendering.py:122-131)."""
        if os.path.isdir(mesh_dir):
            paths = sorted(glob(os.path.join(mesh_dir, "*" + ext)))
        else:
            paths = [mesh_dir]
        if not paths:
            raise FileNotFoundError(f"no {ext} meshes under {mesh_dir}")
        meshes = [load_ply(p) for p in paths]
        names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        return cls.from_meshes(meshes, pad_multiple, class_names=names,
                               diameters=diameters)

    def closed_consistently_wound(self) -> np.ndarray:
        """Per-class check that backface culling is safe: the mesh is a
        closed 2-manifold with consistent OUTWARD winding.

        Exact conditions checked per class:
          1. every directed edge (u, v) of the face list appears exactly
             once, and its reverse (v, u) also appears — the definition of
             a closed, consistently-oriented triangle 2-manifold;
          2. the winding is outward: the divergence-theorem signed volume
             sum over faces dot(v0, cross(v1, v2))/6 is positive (an
             inward-wound closed mesh would satisfy (1) but culling would
             keep the far-side faces and render the back surface).

        Seam-split vertices (duplicate positions for per-vertex normals/
        UVs, common in real scan PLYs) are welded by exact position before
        the edge matching, so a geometrically closed mesh with topological
        seams still passes; vertices that differ by any nonzero amount are
        NOT merged (a tolerance could false-merge near-coincident but
        distinct geometry, which would wrongly bless culling).

        Returns a (C,) bool array.  `Renderer`/`build_render_assets` REFUSE
        (ValueError) when `cull_backfaces=True` for a bank that fails this;
        `cull_backfaces='force'` downgrades the refusal to a warning.
        """
        out = []
        for i in range(self.num_class):
            f = self.faces[i][self.face_valid[i]].astype(np.int64)
            if len(f) == 0:
                out.append(False)
                continue
            # weld: remap each face corner to the canonical index of its
            # exact position, so seams don't break directed-edge pairing
            uverts, canon = np.unique(
                self.verts[i], axis=0, return_inverse=True)
            f = canon[f]
            # welding can surface degenerate slivers (two corners at one
            # position); they have no area and cannot pair consistently
            degen = ((f[:, 0] == f[:, 1]) | (f[:, 1] == f[:, 2])
                     | (f[:, 2] == f[:, 0]))
            if degen.any():
                out.append(False)
                continue
            edges = np.concatenate(
                [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
            vmax = int(edges.max()) + 1
            keys = edges[:, 0] * vmax + edges[:, 1]
            rkeys = edges[:, 1] * vmax + edges[:, 0]
            unique = len(np.unique(keys)) == len(keys)
            closed = unique and bool(np.isin(rkeys, keys).all())
            tri = uverts[f]  # (F, 3, 3)
            vol = np.einsum(
                "fi,fi->f", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])
            ).sum() / 6.0
            out.append(closed and vol > 0)
        return np.asarray(out, bool)

    def subsample(self, max_verts: int, seed: int = 0) -> "MeshBank":
        """Vertex-bank subsample for losses (keeps full faces invalid);
        used where the reference loads models_eval vertices only."""
        rng = np.random.default_rng(seed)
        c, v, _ = self.verts.shape
        if v <= max_verts:
            return self
        verts = np.zeros((c, max_verts, 3), np.float32)
        valid = np.zeros((c, max_verts), bool)
        for i in range(c):
            n = int(self.vert_valid[i].sum())
            take = min(n, max_verts)
            idx = rng.choice(n, size=take, replace=False)
            verts[i, :take] = self.verts[i, idx]
            valid[i, :take] = True
        return MeshBank(
            verts, np.zeros((c, 1, 3), np.int32), np.zeros_like(verts),
            np.zeros_like(verts), valid, np.zeros((c, 1), bool),
            self.diameters, self.class_names,
        )


def resolve_cull_backfaces(bank: "MeshBank", setting) -> bool:
    """Gate a `cull_backfaces` config value behind the winding-safety check.

    setting semantics:
      - falsy            -> culling off, no check;
      - True             -> run `closed_consistently_wound`; any failing
                            class raises ValueError (culling would silently
                            drop visible geometry for it — a long training
                            run must not proceed on a missed warning);
      - 'force'          -> culling on regardless; the check still runs and
                            failures downgrade to a warning (for meshes the
                            user KNOWS are camera-safe despite failing the
                            conservative manifold test).

    Additional assumption either way (documented, not checkable from the
    mesh alone): the camera stays OUTSIDE the mesh and the mesh does not
    straddle the near plane — a closed mesh whose front faces are dropped
    by the near-plane test (min corner z <= 1e-6) would expose backfaces
    that culling removes.  BOP-style object rendering (object fully in
    front of the camera) always satisfies this.
    """
    if not setting:
        return False
    ok = bank.closed_consistently_wound()
    if ok.all():
        return True
    bad = [i for i, v in enumerate(ok) if not v]
    msg = (
        f"cull_backfaces enabled but mesh classes {bad} are not closed "
        "consistently-outward-wound manifolds — culling would drop visible "
        "geometry for them. Disable cull_backfaces, fix the meshes, or set "
        "cull_backfaces='force' if you know these meshes are safe.")
    if setting == "force":
        import warnings

        warnings.warn(msg)
        return True
    raise ValueError(msg)


def _subdivide(verts: np.ndarray, faces: np.ndarray):
    """One loop of midpoint subdivision (4x faces)."""
    edge_mid = {}
    verts = list(verts)

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_mid:
            edge_mid[key] = len(verts)
            verts.append((np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0)
        return edge_mid[key]

    out = []
    for a, b, c in faces:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        out += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    return np.asarray(verts, np.float32), np.asarray(out, np.int32)


def _uv_sphere(radius: float, rings: int, segments: int):
    """Lat/long sphere with exactly 2*segments*(rings-1) triangles
    (rings=17, segments=32 -> 1024 — the face budget of the reference's
    models_1024 assets, ycbv_real.py:151)."""
    vs = [np.array([0.0, 0.0, radius], np.float32)]
    for i in range(1, rings):
        phi = np.pi * i / rings
        for j in range(segments):
            theta = 2.0 * np.pi * j / segments
            vs.append(np.array([
                radius * np.sin(phi) * np.cos(theta),
                radius * np.sin(phi) * np.sin(theta),
                radius * np.cos(phi)], np.float32))
    vs.append(np.array([0.0, 0.0, -radius], np.float32))
    v = np.stack(vs)
    last = len(vs) - 1
    f = []
    ring0 = lambda i, j: 1 + (i - 1) * segments + (j % segments)
    for j in range(segments):  # top cap
        f.append([0, ring0(1, j), ring0(1, j + 1)])
    for i in range(1, rings - 1):  # bands
        for j in range(segments):
            a, b = ring0(i, j), ring0(i, j + 1)
            c, d = ring0(i + 1, j), ring0(i + 1, j + 1)
            f.append([a, c, d])
            f.append([a, d, b])
    for j in range(segments):  # bottom cap
        f.append([last, ring0(rings - 1, j + 1), ring0(rings - 1, j)])
    return v, np.asarray(f, np.int32)


def make_synthetic_bank(num_class: int = 3, kind: str = "cube",
                        size: float = 60.0, subdivisions: int = 0) -> MeshBank:
    """Synthetic colored meshes for tests/benchmarks (no dataset needed).
    `subdivisions` quadruples the face count per level (a 'sphere' with
    subdivisions=4 has 2048 faces).  kind='uvsphere' builds exactly
    1024 faces per mesh — the face budget of the reference's models_1024
    render assets (configs/refine_datasets/ycbv_real.py:151), i.e. the
    representative benchmark workload."""
    meshes = []
    for c in range(num_class):
        s = size * (1.0 + 0.3 * c)
        if kind == "uvsphere":
            v, f = _uv_sphere(s / 2.0, rings=17, segments=32)
        elif kind == "cube":
            v = np.array(
                [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
                np.float32,
            ) / 2.0
            f = np.array(
                [
                    [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                    [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                    [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
                ],
                np.int32,
            )
        else:  # icosphere-ish: subdivided octahedron
            v = np.array(
                [[s, 0, 0], [-s, 0, 0], [0, s, 0], [0, -s, 0], [0, 0, s], [0, 0, -s]],
                np.float32,
            ) / 2.0
            f = np.array(
                [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                 [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                np.int32,
            )
        for _ in range(subdivisions if kind != "uvsphere" else 0):
            v, f = _subdivide(v, f)
            if kind != "cube":  # keep spheres spherical
                v = v / np.linalg.norm(v, axis=-1, keepdims=True) * (s / 2)
        colors = (v - v.min(0)) / (v.max(0) - v.min(0) + 1e-9)
        m = PlyMesh(v, f, colors=colors.astype(np.float32))
        m.normals = m.compute_vertex_normals()
        meshes.append(m)
    return MeshBank.from_meshes(meshes)
