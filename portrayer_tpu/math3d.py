"""Vector/matrix math for the TPU renderer.

The reference keeps scalar f64 vek types (src/math.rs:22-33).  Here everything
is SoA: points/directions are arrays of shape [..., 3], affine transforms are
[..., 3, 4] (rotation|translation), and all ops broadcast.  Host-side scene
construction uses numpy float64 (matching the reference's precision for
transform composition/inversion); device code uses the configured dtype.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Batched jnp vector helpers (device side)
# ---------------------------------------------------------------------------

def dot(a, b):
    """Dot product over the last axis, keeping batch dims ([...,3] -> [...])."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(v):
    return jnp.sqrt(dot(v, v))


def normalize(v, eps=0.0):
    n = norm(v)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n[..., None]


# NOTE: these small transforms deliberately use explicit elementwise
# arithmetic instead of einsum/dot.  On TPU, dot-general defaults to
# bfloat16 MXU passes (~0.4% error) which manifests as severe shadow acne;
# elementwise mul+add runs on the VPU at full float32 and is just as fast
# at 3x3/3x4 sizes.

def transform_point(m34, p):
    """Apply affine [...,3,4] to points [...,3]."""
    return (
        jnp.sum(m34[..., :, :3] * p[..., None, :], axis=-1) + m34[..., :, 3]
    )


def transform_dir(m34, d):
    """Apply the linear part of affine [...,3,4] to directions [...,3]."""
    return jnp.sum(m34[..., :, :3] * d[..., None, :], axis=-1)


def matvec3(m33, v):
    return jnp.sum(m33 * v[..., None, :], axis=-1)


# ---------------------------------------------------------------------------
# Host-side (numpy f64) transform builders — the scene-graph math
# ---------------------------------------------------------------------------

def identity4() -> np.ndarray:
    return np.eye(4, dtype=np.float64)


def translation(v) -> np.ndarray:
    m = identity4()
    m[:3, 3] = np.asarray(v, dtype=np.float64)
    return m


def scaling(v) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64)
    if v.ndim == 0:
        v = np.full(3, float(v))
    m = identity4()
    m[0, 0], m[1, 1], m[2, 2] = v
    return m


def rotation_x(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    m = identity4()
    m[1, 1], m[1, 2] = c, -s
    m[2, 1], m[2, 2] = s, c
    return m


def rotation_y(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    m = identity4()
    m[0, 0], m[0, 2] = c, s
    m[2, 0], m[2, 2] = -s, c
    return m


def rotation_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    m = identity4()
    m[0, 0], m[0, 1] = c, -s
    m[1, 0], m[1, 1] = s, c
    return m


def look_at_rh(eye, center, up) -> np.ndarray:
    """World-to-view matrix (same convention as vek's Mat4::look_at_rh).

    Used by the camera (src/camera.rs:38), which inverts it to get
    view-to-world.
    """
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = identity4()
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def invert(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(m)


def to_affine34(m: np.ndarray) -> np.ndarray:
    """Take the top 3x4 of a 4x4 (we only ever use affine transforms)."""
    return np.asarray(m, dtype=np.float64)[:3, :4]


def normal_matrix(m: np.ndarray) -> np.ndarray:
    """inverse-transpose 3x3, the reference's normal_trans (src/scene.rs:204).

    vek applies the full Mat4 to a w=0 vector, which uses only the upper-left
    3x3 of invtrans.transposed().
    """
    return np.linalg.inv(m[:3, :3]).T


def radians(deg: float) -> float:
    return float(np.deg2rad(deg))


# ---------------------------------------------------------------------------
# Quadratic solver — parity with roots::find_roots_quadratic semantics
# (src/math.rs:107-114): roots sorted ascending; linear fallback when a == 0.
# ---------------------------------------------------------------------------

def quadratic_roots(a, b, c):
    """Return (r0, r1, num_roots) with r0 <= r1; num_roots in {0, 1, 2}.

    Invalid roots are +inf.  Matches the roots crate: exact a == 0 falls back
    to the linear equation; disc == 0 gives a double root.
    """
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Numerically stable: q = -(b + sign(b)*sq)/2; roots q/a and c/q.
    sgn = jnp.where(b >= 0.0, 1.0, -1.0)
    q = -0.5 * (b + sgn * sq)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_q = jnp.where(q == 0.0, 1.0, q)
    ra = jnp.where(a == 0.0, jnp.inf, q / safe_a)
    rb = jnp.where(q == 0.0, -b / (2.0 * safe_a), c / safe_q)
    r0 = jnp.minimum(ra, rb)
    r1 = jnp.maximum(ra, rb)
    # Linear fallback: a == 0 -> bt + c = 0.
    safe_b = jnp.where(b == 0.0, 1.0, b)
    lin = jnp.where(b == 0.0, jnp.inf, -c / safe_b)
    quad_ok = (a != 0.0) & (disc >= 0.0)
    r0 = jnp.where(a == 0.0, lin, jnp.where(quad_ok, r0, jnp.inf))
    r1 = jnp.where(a == 0.0, jnp.inf, jnp.where(quad_ok, r1, jnp.inf))
    return r0, r1


def smallest_root_in_range(a, b, c, t_min, t_max):
    """Smallest quadratic root t with t_min <= t < t_max (Solutions::
    find_in_range, src/math.rs:94-96).  Returns (t, valid)."""
    r0, r1 = quadratic_roots(a, b, c)
    ok0 = (r0 >= t_min) & (r0 < t_max)
    ok1 = (r1 >= t_min) & (r1 < t_max)
    t = jnp.where(ok0, r0, jnp.where(ok1, r1, jnp.inf))
    return t, ok0 | ok1
