"""Triangle meshes and OBJ loading (host side).

Mirrors src/primitive/mesh.rs: ``MeshData`` is SoA (positions, normals,
tex_coords, triangle index triples) loaded from the *first* model of an OBJ
file (mesh.rs:57-61), with a precomputed AABB (mesh.rs:63-88).  ``Mesh``
pairs shared data with a shading mode (Flat|Smooth).  Like tobj, face corners
with distinct v/vt/vn triples are unified into single indices.

``KDMesh`` in the reference (src/kdtree/kdmesh.rs) is the accelerated variant
with identical output (proven by the reference's mesh_equivalence test); here
acceleration is an execution-backend choice, so KDMesh is an alias carrying
the same semantics.
"""

from __future__ import annotations

import enum
from typing import Optional

import numpy as np


class Shading(enum.Enum):
    Flat = 0
    Smooth = 1


class MeshData:
    def __init__(self, positions, triangles, normals=None, tex_coords=None):
        self.positions = np.asarray(positions, dtype=np.float64).reshape(-1, 3)
        self.triangles = np.asarray(triangles, dtype=np.int64).reshape(-1, 3)
        self.normals = (
            np.asarray(normals, dtype=np.float64).reshape(-1, 3)
            if normals is not None and len(normals)
            else np.zeros((0, 3))
        )
        self.tex_coords = (
            np.asarray(tex_coords, dtype=np.float64).reshape(-1, 2)
            if tex_coords is not None and len(tex_coords)
            else np.zeros((0, 2))
        )
        assert len(self.positions) > 0, "Meshes must have at least one vertex"
        if len(self.tex_coords) and len(self.tex_coords) != len(self.positions):
            raise ValueError(
                "If meshes have texture coordinates, they must have enough for all vertices"
            )
        self.bounds_min = self.positions.min(axis=0)
        self.bounds_max = self.positions.max(axis=0)

    @classmethod
    def load_obj(cls, path) -> "MeshData":
        from .. import native

        loaded = native.obj_load(path)
        if loaded is not None:
            pos, uv, norm, tris, has_uv, has_norm = loaded
            if len(pos):
                return cls(
                    positions=pos,
                    triangles=tris,
                    normals=norm if has_norm else None,
                    tex_coords=uv if has_uv else None,
                )
        return cls._load_obj_py(path)

    @classmethod
    def _load_obj_py(cls, path) -> "MeshData":
        """Pure-Python OBJ parser (fallback for the native loader)."""
        positions, tex_coords, normals = [], [], []
        # Unified vertex stream: one index per unique v/vt/vn triple.
        out_pos, out_uv, out_norm = [], [], []
        index_of = {}
        faces = []
        with open(path, "r") as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                tag = parts[0]
                if tag == "v":
                    positions.append([float(x) for x in parts[1:4]])
                elif tag == "vt":
                    tex_coords.append([float(x) for x in parts[1:3]])
                elif tag == "vn":
                    normals.append([float(x) for x in parts[1:4]])
                elif tag == "f":
                    corner_ids = []
                    for corner in parts[1:]:
                        key = corner
                        if key not in index_of:
                            fields = corner.split("/")
                            vi = int(fields[0])
                            vi = vi - 1 if vi > 0 else len(positions) + vi
                            ti = None
                            if len(fields) > 1 and fields[1]:
                                ti = int(fields[1])
                                ti = ti - 1 if ti > 0 else len(tex_coords) + ti
                            ni = None
                            if len(fields) > 2 and fields[2]:
                                ni = int(fields[2])
                                ni = ni - 1 if ni > 0 else len(normals) + ni
                            index_of[key] = len(out_pos)
                            out_pos.append(positions[vi])
                            out_uv.append(tex_coords[ti] if ti is not None else None)
                            out_norm.append(normals[ni] if ni is not None else None)
                        corner_ids.append(index_of[key])
                    # Fan triangulation (all reference assets are triangles).
                    for k in range(1, len(corner_ids) - 1):
                        faces.append(
                            (corner_ids[0], corner_ids[k], corner_ids[k + 1])
                        )
                elif tag in ("o", "g") and faces:
                    break  # first model only, like the reference (mesh.rs:57-61)
        has_uv = all(uv is not None for uv in out_uv) and len(out_uv) > 0
        has_norm = all(n is not None for n in out_norm) and len(out_norm) > 0
        return cls(
            positions=out_pos,
            triangles=faces,
            normals=out_norm if has_norm else None,
            tex_coords=out_uv if has_uv else None,
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class Mesh:
    """A mesh primitive: shared MeshData + shading mode (mesh.rs:118-144)."""

    def __init__(self, data: MeshData, shading: Shading = Shading.Flat):
        if shading == Shading.Smooth and len(data.normals) != len(data.positions):
            raise ValueError(
                "Meshes must have a vertex normal for each vertex for smooth shading"
            )
        self.data = data
        self.shading = shading

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class KDMesh(Mesh):
    """Accelerated mesh — same output semantics as Mesh (kdmesh.rs:99-166
    proves equivalence in the reference); acceleration is handled by the
    execution backend, not the scene description."""


class Triangle:
    """A standalone triangle primitive (src/primitive/triangle.rs:8-27)."""

    def __init__(self, a, b, c, normals=None, tex_coords=None):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.c = np.asarray(c, dtype=np.float64)
        self.normals = (
            tuple(np.asarray(n, dtype=np.float64) for n in normals)
            if normals is not None
            else None
        )
        self.tex_coords = (
            tuple(np.asarray(t, dtype=np.float64) for t in tex_coords)
            if tex_coords is not None
            else None
        )

    @classmethod
    def flat(cls, a, b, c) -> "Triangle":
        return cls(a, b, c)
