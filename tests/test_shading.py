"""Lighting-model tests: each term of Material::hit_color
(src/material.rs:91-320) validated against hand-computed values through
tiny end-to-end renders (1-pixel or few-ray traces)."""

import numpy as np
import jax
import jax.numpy as jnp

from portrayer_tpu import (
    Scene, SceneNode, Geometry, Sphere, Plane, Material, Light, Falloff,
    Parallelogram, flatten_scene, RenderConfig, GAMMA, Texture,
)
from portrayer_tpu.ops.trace import trace

CFG = RenderConfig(node_chunk=8, tri_chunk=8)
KEY = jax.random.PRNGKey(0)


def trace_one(scene, o, d, cfg=CFG):
    st = flatten_scene(scene, dtype=jnp.float32)
    o = jnp.asarray(o, jnp.float32).reshape(1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(1, 3)
    pix = jnp.zeros(1, jnp.int32)
    bg = jnp.zeros((1, 3), jnp.float32)
    acc = trace(KEY, o, d, pix, bg, 1, st, cfg)
    return np.asarray(acc[0])


def test_ambient_times_diffuse():
    scene = Scene(
        root=SceneNode(Geometry(Sphere(), Material(diffuse=(0.5, 0.25, 1.0)))),
        lights=[],
        ambient=(0.4, 0.4, 0.4),
    )
    c = trace_one(scene, [0, 0, 5], [0, 0, -1])
    assert np.allclose(c, [0.2, 0.1, 0.4], atol=1e-6)


def test_lambert_and_attenuation():
    # light straight ahead: n.l = 1; falloff c2*r^2 with r=4 -> atten=16
    scene = Scene(
        root=SceneNode(Geometry(Sphere(), Material(diffuse=(1.0, 1.0, 1.0)))),
        lights=[Light(position=(0, 0, 5), color=(0.8, 0.8, 0.8),
                      falloff=Falloff(0.0, 0.0, 1.0))],
        ambient=(0, 0, 0),
    )
    c = trace_one(scene, [0, 0, 5], [0, 0, -1])
    assert np.allclose(c, 0.8 / 16.0, atol=1e-5)


def test_blinn_phong_4x_shininess():
    # Head-on view & light: half == normal -> specular = spec * light * 1
    # Off-axis: angle enters via (n.h)^(4*shininess)
    mat = Material(diffuse=(0, 0, 0), specular=(1.0, 1.0, 1.0), shininess=10.0)
    scene = Scene(
        root=SceneNode(Geometry(Plane(), mat)),
        lights=[Light(position=(0.2, 5.0, 0.0), color=(1.0, 1.0, 1.0))],
        ambient=(0, 0, 0),
    )
    c = trace_one(scene, [-0.2, 5.0, 0.0], [0.2 / 5.0045, -5.0 / 5.0045, 0.0])
    # analytic: hit at origin; view=(-0.2,5,0)/|..|, light=(0.2,5,0)/|..|
    # diffuse term is zero (black diffuse); specular = (n.h)^(4*10)
    view = np.array([-0.2, 5.0, 0.0]); view /= np.linalg.norm(view)
    ldir = np.array([0.2, 5.0, 0.0]); ldir /= np.linalg.norm(ldir)
    half = view + ldir; half /= np.linalg.norm(half)
    assert np.allclose(c, half[1] ** 40.0, atol=1e-3)

    # off-mirror geometry: exponent 4x matters
    c2 = trace_one(scene, [-1.0, 5.0, 0.0], [1.0 / np.sqrt(26.0), -5.0 / np.sqrt(26.0), 0.0])
    view2 = np.array([-1.0, 5.0, 0.0]); view2 /= np.linalg.norm(view2)
    half2 = view2 + ldir; half2 /= np.linalg.norm(half2)
    assert np.allclose(c2, half2[1] ** 40.0, atol=1e-3)
    assert c2[0] < c[0]  # off-mirror is dimmer


def test_shadowing():
    # A small sphere between the plane's hit point and the light blocks it.
    scene = Scene(
        root=SceneNode([
            SceneNode(Geometry(Plane(), Material(diffuse=(1, 1, 1)))).scaled(10.0),
            SceneNode(Geometry(Sphere(), Material(diffuse=(1, 0, 0))))
                .scaled(0.5).translated((0, 2.0, 0)),
        ]),
        lights=[Light(position=(0, 5, 0), color=(1, 1, 1))],
        ambient=(0.1, 0.1, 0.1),
    )
    # primary ray at x=0.6 misses the sphere (radius 0.5 at y=2) but its
    # plane hit point is inside the shadow cone; x=3 is fully lit
    c_shadow = trace_one(scene, [0.6, 4, 0], [0, -1, 0])
    c_lit = trace_one(scene, [3.0, 4, 0], [0, -1, 0])
    assert np.allclose(c_shadow, 0.1, atol=1e-5)      # ambient only
    assert c_lit[0] > 0.9                              # ambient + full lambert


def test_shadow_beyond_light_still_occludes():
    # Reference quirk: shadow range is (eps, inf) — objects BEYOND the light
    # still cause shadow (material.rs:174-179).
    scene = Scene(
        root=SceneNode([
            SceneNode(Geometry(Plane(), Material(diffuse=(1, 1, 1)))).scaled(10.0),
            SceneNode(Geometry(Sphere(), Material(diffuse=(1, 0, 0))))
                .scaled(0.5).translated((0, 8.0, 0)),  # beyond the light at y=5
        ]),
        lights=[Light(position=(0, 5, 0), color=(1, 1, 1))],
        ambient=(0.0, 0.0, 0.0),
    )
    c = trace_one(scene, [0, 4, 0], [0, -1, 0])
    assert np.allclose(c, 0.0, atol=1e-6)


def test_mirror_reflection():
    # Plane mirror reflects a ray into the background-lit sphere.
    mirror = Material(diffuse=(0, 0, 0), reflectivity=0.5)
    red = Material(diffuse=(1, 0, 0))
    scene = Scene(
        root=SceneNode([
            SceneNode(Geometry(Plane(), mirror)).scaled(4.0),
            # centered on the reflected (diagonal) ray
            SceneNode(Geometry(Sphere(), red)).translated((2.0, 2.0, 0)),
        ]),
        lights=[],
        ambient=(1.0, 1.0, 1.0),
    )
    # 45-degree ray hits mirror at origin, reflects along +x+y into sphere
    c = trace_one(scene, [-3.0, 3.0, 0], [1 / np.sqrt(2), -1 / np.sqrt(2), 0])
    assert np.allclose(c, [0.5, 0, 0], atol=1e-4)  # 0.5 * ambient*red


def test_depth_limit_returns_background():
    # Two parallel mirrors; with max_depth=d the final child contributes bg.
    mirror = Material(diffuse=(0, 0, 0), reflectivity=1.0)
    scene = Scene(
        root=SceneNode([
            SceneNode(Geometry(Plane(), mirror)).scaled(100.0),
            SceneNode(Geometry(Plane(), mirror)).rotated_x(np.pi).scaled(100.0)
                .translated((0, 2.0, 0)),
        ]),
        lights=[],
        ambient=(0, 0, 0),
    )
    st = flatten_scene(scene, dtype=jnp.float32)
    o = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    pix = jnp.zeros(1, jnp.int32)
    bg = jnp.full((1, 3), 0.75, jnp.float32)
    cfg = RenderConfig(node_chunk=8, max_depth=4)
    acc = trace(KEY, o, d, pix, bg, 1, st, cfg)
    # ping-pongs 5 rounds (depth 0..4), final children -> bg * 1.0
    assert np.allclose(np.asarray(acc[0]), 0.75, atol=1e-5)


def test_refraction_schlick_energy_split():
    # Glass sphere head-on: R0 = ((1.51-1)/(1.51+1))^2; straight-through ray
    glass = Material(
        diffuse=(0, 0, 0), reflectivity=1.0, refraction_index=1.51,
    )
    scene = Scene(
        root=SceneNode(Geometry(Sphere(), glass)),
        lights=[],
        ambient=(0, 0, 0),
    )
    st = flatten_scene(scene, dtype=jnp.float32)
    o = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    pix = jnp.zeros(1, jnp.int32)
    bg = jnp.ones((1, 3), jnp.float32)
    cfg = RenderConfig(node_chunk=8, queue_factor=4.0)
    acc = trace(KEY, o, d, pix, bg, 1, st, cfg)
    # Head-on: every reflect/refract bounce eventually reaches bg=1 with
    # weights that sum to 1 per split (R + (1-R) = 1) => total ~= 1.
    assert np.isclose(float(acc[0, 0]), 1.0, atol=5e-3)


def test_procedural_texture_overrides_diffuse():
    def checker(uv):
        c = (jnp.floor(uv[..., 0] * 2) + jnp.floor(uv[..., 1] * 2)) % 2
        return jnp.stack([c, c, c], axis=-1)

    mat = Material(diffuse=(1, 0, 0), texture=Texture(checker))
    scene = Scene(
        root=SceneNode(Geometry(Plane(), mat)),
        lights=[],
        ambient=(1.0, 1.0, 1.0),
    )
    c_white = trace_one(scene, [-0.3, 1, -0.3], [0, -1, 0])  # uv (0.2,0.2)
    c_black = trace_one(scene, [0.3, 1, -0.3], [0, -1, 0])   # uv (0.8,0.2)
    assert np.allclose(c_white, 0.0, atol=1e-6)
    assert np.allclose(c_black, 1.0, atol=1e-6)


def test_area_light_soft_shadow():
    # Penumbra point: sometimes shadowed, sometimes lit => fractional mean.
    scene = Scene(
        root=SceneNode([
            SceneNode(Geometry(Plane(), Material(diffuse=(1, 1, 1)))).scaled(20.0),
            SceneNode(Geometry(Sphere(), Material(diffuse=(1, 0, 0))))
                .translated((0, 3.0, 0)),
        ]),
        lights=[Light(position=(0, 6, 0), color=(1, 1, 1),
                      area=Parallelogram(a=(2.0, 0, 0), b=(0, 0, 2.0)))],
        ambient=(0, 0, 0),
    )
    st = flatten_scene(scene, dtype=jnp.float32)
    R = 256
    o = jnp.tile(jnp.asarray([[1.6, 1.0, 0.0]], jnp.float32), (R, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (R, 1))
    pix = jnp.zeros(R, jnp.int32)
    bg = jnp.zeros((1, 3), jnp.float32)
    acc = trace(KEY, o, d, pix, bg, 1, st, CFG)
    mean = float(acc[0, 0]) / R
    assert 0.05 < mean < 0.95  # penumbra: neither fully lit nor fully dark


def test_normalize_zero_vector_is_finite():
    """Regression: normalize(0, eps=1e-30) must not NaN.  eps^2 = 1e-60
    underflows to 0 in f32, silently disabling the norm clamp and giving
    0/0 = NaN — the round-2 flagship NaN (castle TBN on degenerate-UV
    triangles)."""
    from portrayer_tpu import math3d as m3

    for eps in (1e-30, 1e-20, 1e-10):
        v = jnp.zeros((4, 3), jnp.float32)
        out = np.asarray(m3.normalize(v, eps=eps))
        assert np.isfinite(out).all(), f"eps={eps} produced {out[0]}"


def test_degenerate_uv_triangle_tbn_finite():
    """A triangle whose a/b vertices share one UV (as castle.obj tri 12871
    does) has a zero bitangent; its TBN — and any normal-mapped shade —
    must stay finite (src/primitive/triangle.rs:103-138 divides by the
    uv-delta determinant; we guard instead of NaN-ing)."""
    from portrayer_tpu.ops.intersect import _mesh_detail

    trec = np.zeros((1, 26), np.float32)
    trec[0, 0:3] = (0.0, 0.0, 0.0)    # a
    trec[0, 3:6] = (1.0, 0.0, 0.0)    # b
    trec[0, 6:9] = (0.0, 1.0, 0.0)    # c
    trec[0, 18:20] = (0.25, 0.5)      # uva
    trec[0, 20:22] = (0.25, 0.5)      # uvb == uva (degenerate)
    trec[0, 22:24] = (0.75, 0.9)      # uvc
    trec[0, 25] = 1.0                 # has_uv
    lo = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    ld = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    n, uv, has_uv, nmt, has_nmt = _mesh_detail(
        lo, ld, jnp.asarray(trec), jnp.zeros(1), jnp.full(1, jnp.inf),
        jnp.float32,
    )
    assert np.isfinite(np.asarray(nmt)).all()
    assert np.isfinite(np.asarray(n)).all()
