"""Per-primitive intersection checks against hand-computed expectations,
exercised through the full table-driven sweep (flatten -> intersect ->
detail), mirroring how the reference tests semantics per primitive."""

import numpy as np
import jax.numpy as jnp
import pytest

from portrayer_tpu import (
    Scene, SceneNode, Geometry, Sphere, Cube, Plane, Cylinder, Cone,
    Material, Light, Triangle, Mesh, MeshData, Shading,
    flatten_scene, RenderConfig,
)
from portrayer_tpu.ops.intersect import intersect_scene, hit_detail

CFG = RenderConfig(node_chunk=8, tri_chunk=8)
MAT = Material(diffuse=(1.0, 0.0, 0.0))


def single_prim_scene(prim, node_builder=lambda n: n):
    node = node_builder(SceneNode(Geometry(prim, MAT)))
    return flatten_scene(
        Scene(root=node, lights=[Light()], ambient=(0, 0, 0)),
        dtype=jnp.float32,
    )


def cast(st, origins, dirs, t_min=1e-5):
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    hit = intersect_scene(o, d, t_min, jnp.inf, st, CFG)
    det = hit_detail(o, d, hit, st, CFG, t_min)
    return hit, det


class TestSphere:
    def test_head_on(self):
        st = single_prim_scene(Sphere())
        hit, det = cast(st, [[0, 0, 5]], [[0, 0, -1]])
        assert bool(hit.hit[0]) and np.isclose(float(hit.t[0]), 4.0, atol=1e-5)
        assert np.allclose(np.asarray(det.normal[0]), [0, 0, 1], atol=1e-5)
        # uv: z=1 front point -> u=(pi+atan2(-1,0))/2pi = (pi - pi/2)/2pi = 0.25
        assert np.allclose(np.asarray(det.uv[0]), [0.25, 0.5], atol=1e-5)

    def test_miss(self):
        st = single_prim_scene(Sphere())
        hit, _ = cast(st, [[0, 0, 5]], [[0, 1, 0]])
        assert not bool(hit.hit[0])

    def test_scaled_instance(self):
        st = single_prim_scene(Sphere(), lambda n: n.scaled(2.0).translated((0, 0, -5)))
        hit, det = cast(st, [[0, 0, 5]], [[0, 0, -1]])
        assert np.isclose(float(hit.t[0]), 8.0, atol=1e-4)
        # normal is inv-transpose transformed (not normalized, ray.rs:19-22)
        n = np.asarray(det.normal[0])
        assert np.allclose(n / np.linalg.norm(n), [0, 0, 1], atol=1e-5)

    def test_inside_hit(self):
        st = single_prim_scene(Sphere())
        hit, _ = cast(st, [[0, 0, 0]], [[0, 0, -1]])
        assert np.isclose(float(hit.t[0]), 1.0, atol=1e-6)


class TestPlane:
    def test_hit_and_uv(self):
        st = single_prim_scene(Plane())
        hit, det = cast(st, [[0.2, 1.0, -0.3]], [[0, -1, 0]])
        assert bool(hit.hit[0]) and np.isclose(float(hit.t[0]), 1.0, atol=1e-6)
        assert np.allclose(np.asarray(det.uv[0]), [0.7, 0.2], atol=1e-5)
        assert np.allclose(np.asarray(det.normal[0]), [0, 1, 0])

    def test_outside_bounds(self):
        st = single_prim_scene(Plane())
        hit, _ = cast(st, [[0.7, 1.0, 0.0]], [[0, -1, 0]])
        assert not bool(hit.hit[0])

    def test_two_sided_normal_always_up(self):
        # plane.rs: normal is +y even when hit from below
        st = single_prim_scene(Plane())
        hit, det = cast(st, [[0.0, -1.0, 0.0]], [[0, 1, 0]])
        assert bool(hit.hit[0])
        assert np.allclose(np.asarray(det.normal[0]), [0, 1, 0])


class TestCube:
    def test_face_hit_and_atlas_uv(self):
        st = single_prim_scene(Cube())
        # hit the near face (+z) center: uv = (1/4,1/3) + (0.5/4, 0.5/3)
        hit, det = cast(st, [[0, 0, 5]], [[0, 0, -1]])
        assert np.isclose(float(hit.t[0]), 4.5, atol=1e-5)
        assert np.allclose(np.asarray(det.normal[0]), [0, 0, 1])
        assert np.allclose(
            np.asarray(det.uv[0]), [0.25 + 0.125, 1.0 / 3.0 + 1.0 / 6.0], atol=1e-5
        )

    def test_top_face(self):
        st = single_prim_scene(Cube())
        hit, det = cast(st, [[0.1, 5, 0.1]], [[0, -1, 0]])
        assert np.isclose(float(hit.t[0]), 4.5, atol=1e-5)
        assert np.allclose(np.asarray(det.normal[0]), [0, 1, 0])

    def test_edge_miss(self):
        st = single_prim_scene(Cube())
        hit, _ = cast(st, [[2.0, 0, 5]], [[0, 0, -1]])
        assert not bool(hit.hit[0])


class TestCylinder:
    def test_body(self):
        st = single_prim_scene(Cylinder())
        hit, det = cast(st, [[5, 0.1, 0]], [[-1, 0, 0]])
        assert np.isclose(float(hit.t[0]), 4.5, atol=1e-5)
        n = np.asarray(det.normal[0])
        assert np.allclose(n / np.linalg.norm(n), [1, 0, 0], atol=1e-4)

    def test_caps(self):
        st = single_prim_scene(Cylinder())
        hit, det = cast(st, [[0.1, 5, 0.1]], [[0, -1, 0]])
        assert np.isclose(float(hit.t[0]), 4.5, atol=1e-5)
        assert np.allclose(np.asarray(det.normal[0]), [0, 1, 0])
        hit, det = cast(st, [[0.1, -5, 0.1]], [[0, 1, 0]])
        assert np.allclose(np.asarray(det.normal[0]), [0, -1, 0])

    def test_beyond_cap_miss(self):
        # body root above cap -> rejected with no 2nd-root fallback
        st = single_prim_scene(Cylinder())
        hit, _ = cast(st, [[5, 0.75, 0]], [[-1, 0, 0]])
        assert not bool(hit.hit[0])


class TestCone:
    def test_body_hit(self):
        st = single_prim_scene(Cone())
        # At y=0 (mid-height), cone radius is 0.25
        hit, det = cast(st, [[5, 0.0, 0]], [[-1, 0, 0]])
        assert bool(hit.hit[0])
        assert np.isclose(float(hit.t[0]), 4.75, atol=1e-4)
        n = np.asarray(det.normal[0])
        n = n / np.linalg.norm(n)
        # slope: normal = (cos, sin) with tan = r/h = 0.5 -> n ~ (2,1,0)/sqrt5
        assert np.allclose(n, [2 / np.sqrt(5), 1 / np.sqrt(5), 0], atol=1e-3)

    def test_cap(self):
        st = single_prim_scene(Cone())
        hit, det = cast(st, [[0.1, -5, 0.1]], [[0, 1, 0]])
        assert np.isclose(float(hit.t[0]), 4.5, atol=1e-5)
        assert np.allclose(np.asarray(det.normal[0]), [0, -1, 0])


class TestTriangleMesh:
    def test_triangle_hit_barycentric_normal(self):
        tri = Triangle(
            (-1, 0, 0), (1, 0, 0), (0, 2, 0),
            normals=((1, 0, 0), (0, 1, 0), (0, 0, 1)),
        )
        st = single_prim_scene(tri)
        hit, det = cast(st, [[0, 0.5, 3]], [[0, 0, -1]])
        assert np.isclose(float(hit.t[0]), 3.0, atol=1e-5)
        # At (0, 0.5): beta (vertex b) and gamma (vertex c) weights
        n = np.asarray(det.normal[0])
        assert np.isclose(n.sum(), 1.0, atol=1e-5)  # affine combo of unit axes
        assert n[2] > 0.2  # gamma weight present

    def test_triangle_outside(self):
        tri = Triangle.flat((-1, 0, 0), (1, 0, 0), (0, 2, 0))
        st = single_prim_scene(tri)
        hit, _ = cast(st, [[1.5, 0.5, 3]], [[0, 0, -1]])
        assert not bool(hit.hit[0])

    def test_mesh_equivalence_triangle_vs_mesh(self):
        # same geometry as Mesh must give identical results (the reference's
        # mesh_equivalence oracle pattern, kdmesh.rs:99-166)
        data = MeshData(
            positions=[(-1, 0, 0), (1, 0, 0), (0, 2, 0)],
            triangles=[(0, 1, 2)],
        )
        st = single_prim_scene(Mesh(data, Shading.Flat))
        hit, det = cast(st, [[0, 0.5, 3]], [[0, 0, -1]])
        assert np.isclose(float(hit.t[0]), 3.0, atol=1e-5)
        n = np.asarray(det.normal[0])
        assert np.allclose(n / np.linalg.norm(n), [0, 0, 1], atol=1e-5)

    def test_mesh_uv_vflip(self):
        data = MeshData(
            positions=[(-1, 0, 0), (1, 0, 0), (0, 2, 0)],
            triangles=[(0, 1, 2)],
            tex_coords=[(0, 0), (1, 0), (0, 1)],
        )
        st = single_prim_scene(Mesh(data, Shading.Flat))
        hit, det = cast(st, [[0, 1.98, 3]], [[0, 0, -1]])  # near vertex c
        assert bool(hit.hit[0])
        uv = np.asarray(det.uv[0])
        # raw uv ~ (0,1); v-flip (triangle.rs:98) -> (0, 0)
        assert uv[1] < 0.05


class TestNearest:
    def test_nearest_across_kinds(self):
        scene = Scene(
            root=SceneNode([
                SceneNode(Geometry(Sphere(), MAT)).translated((0, 0, -5)),
                SceneNode(Geometry(Cube(), MAT)).translated((0, 0, -2)),
            ]),
            lights=[Light()], ambient=(0, 0, 0),
        )
        st = flatten_scene(scene, dtype=jnp.float32)
        hit, _ = cast(st, [[0, 0, 5]], [[0, 0, -1]])
        from portrayer_tpu.scene.flatten import CUBE, node_record, REC_KIND
        kind = int(node_record(st)[int(hit.node[0]), REC_KIND])
        assert kind == CUBE
        assert np.isclose(float(hit.t[0]), 6.5, atol=1e-5)

    def test_t_range_limited(self):
        st = single_prim_scene(Sphere())
        hit = intersect_scene(
            jnp.asarray([[0, 0, 5.0]], jnp.float32),
            jnp.asarray([[0, 0, -1.0]], jnp.float32),
            1e-5, 3.0, st, CFG,
        )
        assert not bool(hit.hit[0])
