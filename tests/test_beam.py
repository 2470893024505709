"""Beam-sweep accelerator equivalence tests — the reference's
mesh_equivalence oracle pattern (kdmesh.rs:99-166): the accelerated path
must produce identical hits to the brute-force sweep."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scenes
from portrayer_tpu import flatten_scene, RenderConfig
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.intersect import intersect_scene
from portrayer_tpu.ops.beam import intersect_scene_beam

FLAT = RenderConfig(accel="flat", node_chunk=256, tri_chunk=512)
BEAM = RenderConfig(accel="beam", warp_size=64, n_segments=8, beam_chunk=64)


def _compare(name, n_rays=512, seed=0, shadow_like=False):
    spec = scenes.load(name)
    st = flatten_scene(spec.scene, dtype=jnp.float32)
    w, h = spec.size
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)
    xs = jax.random.uniform(jax.random.fold_in(key, 0), (n_rays,)) * w
    ys = jax.random.uniform(jax.random.fold_in(key, 1), (n_rays,)) * h
    o, d = cam.rays_at(xs, ys)
    if shadow_like:
        # scatter origins into the scene, random directions (incoherent)
        hit = intersect_scene(o, d, 1e-5, jnp.inf, st, FLAT)
        t = jnp.where(hit.hit, hit.t, 1.0)
        o = o + t[:, None] * d * 0.7
        d = jax.random.normal(jax.random.fold_in(key, 2), (n_rays, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    brute = intersect_scene(o, d, 1e-5, jnp.inf, st, FLAT)
    beam = intersect_scene_beam(o, d, 1e-5, jnp.inf, st, BEAM)

    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(beam.hit))
    m = np.asarray(brute.hit)
    bt, et = np.asarray(brute.t)[m], np.asarray(beam.t)[m]
    # float reassociation differs between the two sweeps: t must agree to
    # ~1e-4 relative; winning node must agree except on near-ties.
    np.testing.assert_allclose(bt, et, rtol=1e-4, atol=1e-5)
    node_mismatch = np.asarray(brute.node)[m] != np.asarray(beam.node)[m]
    tie = np.abs(bt - et) <= 1e-4 * np.maximum(np.abs(bt), 1.0)
    assert np.all(~node_mismatch | tie)


def test_beam_equivalence_big_scene_primary():
    _compare("big-scene")


def test_beam_equivalence_big_scene_scattered():
    _compare("big-scene", shadow_like=True)


def test_beam_equivalence_mesh_scene():
    _compare("macho-cows")


def test_beam_equivalence_mixed_scene():
    _compare("primitives")


def test_beam_render_matches_flat_render():
    from portrayer_tpu import render_linear

    spec = scenes.load("instance")
    flat_cfg = dataclasses.replace(FLAT, samples=2, tile=(32, 32))
    beam_cfg = dataclasses.replace(
        BEAM, samples=2, tile=(32, 32), beam_min_prims=1
    )
    a = render_linear(spec.scene, spec.camera, (64, 64), spec.background, flat_cfg)
    b = render_linear(spec.scene, spec.camera, (64, 64), spec.background, beam_cfg)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
