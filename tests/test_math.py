"""Math-kernel tests — ports of the reference's inline unit tests
(src/math.rs:135-180 quadratic solver; src/bounding_box.rs:165-196 AABB
rotation) plus transform-builder semantics."""

import numpy as np
import jax.numpy as jnp

from portrayer_tpu import math3d as m3


def roots_of(a, b, c):
    r0, r1 = m3.quadratic_roots(jnp.float64(a), jnp.float64(b), jnp.float64(c))
    return float(r0), float(r1)


class TestQuadratic:
    def test_two_roots(self):
        # 2x^2 + 8x + 3 = 0 (math.rs:162-164)
        r0, r1 = roots_of(2.0, 8.0, 3.0)
        assert np.isclose(r0, -2.0 - np.sqrt(5.0 / 2.0))
        assert np.isclose(r1, np.sqrt(5.0 / 2.0) - 2.0)

    def test_double_root(self):
        # 4x^2 - 4x + 1 = 0 (math.rs:166-167)
        r0, r1 = roots_of(4.0, -4.0, 1.0)
        assert np.isclose(r0, 0.5) and np.isclose(r1, 0.5)

    def test_no_roots(self):
        # 3x^2 + 4x + 2 = 0 (math.rs:169-170)
        r0, r1 = roots_of(3.0, 4.0, 2.0)
        assert np.isinf(r0) and np.isinf(r1)

    def test_negative_leading_orders_ascending(self):
        # -2x^2 + 8x + 3 = 0 (math.rs:174-179)
        r0, r1 = roots_of(-2.0, 8.0, 3.0)
        assert np.isclose(r0, 2.0 - np.sqrt(11.0 / 2.0))
        assert np.isclose(r1, 2.0 + np.sqrt(11.0 / 2.0))

    def test_linear_fallback(self):
        r0, r1 = roots_of(0.0, 2.0, -4.0)
        assert np.isclose(r0, 2.0) and np.isinf(r1)

    def test_smallest_in_range_half_open(self):
        # Range::contains is start <= t < end
        t, ok = m3.smallest_root_in_range(
            jnp.float64(1.0), jnp.float64(-3.0), jnp.float64(2.0),
            jnp.float64(1.0), jnp.float64(2.0),
        )
        # roots 1, 2; t=1 in [1,2), t=2 excluded
        assert bool(ok) and np.isclose(float(t), 1.0)
        t, ok = m3.smallest_root_in_range(
            jnp.float64(1.0), jnp.float64(-3.0), jnp.float64(2.0),
            jnp.float64(1.5), jnp.float64(2.0),
        )
        assert not bool(ok)


class TestTransforms:
    def test_builder_composition_world_space(self):
        # .scaled(s).translated(t) => T @ S (vek translated_3d left-multiplies)
        from portrayer_tpu import SceneNode

        n = SceneNode().scaled(2.0).translated((1.0, 0.0, 0.0))
        p = n.trans @ np.array([1.0, 1.0, 1.0, 1.0])
        assert np.allclose(p[:3], [3.0, 2.0, 2.0])

    def test_rotated_xzy_order(self):
        from portrayer_tpu import SceneNode

        x, y, z = 0.3, 0.7, 1.1
        n = SceneNode().rotated_xzy((x, y, z))
        expect = m3.rotation_y(y) @ m3.rotation_z(z) @ m3.rotation_x(x)
        assert np.allclose(n.trans, expect)

    def test_look_at_inverse_maps_view_origin_to_eye(self):
        eye = np.array([3.0, 2.0, 1.0])
        v2w = m3.invert(m3.look_at_rh(eye, [0, 0, 0], [0, 1, 0]))
        assert np.allclose((v2w @ np.array([0, 0, 0, 1.0]))[:3], eye)
        # view -z maps toward the center
        fwd = (v2w @ np.array([0, 0, -1.0, 0.0]))[:3]
        expect = -eye / np.linalg.norm(eye)
        assert np.allclose(fwd, expect, atol=1e-12)

    def test_normal_matrix(self):
        t = m3.scaling((2.0, 1.0, 1.0))
        nm = m3.normal_matrix(t)
        # normal of plane x=const under x-stretch: (1,0,0) -> scaled by 1/2
        assert np.allclose(nm @ np.array([1.0, 0, 0]), [0.5, 0, 0])
        # rotation: normals rotate with the geometry
        r = m3.rotation_z(0.5)
        assert np.allclose(m3.normal_matrix(r), r[:3, :3])
