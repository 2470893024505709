"""Shared helpers for scene configs."""

from __future__ import annotations

import os

import jax.numpy as jnp

ASSETS = os.environ.get("PORTRAYER_ASSETS", "/root/reference/assets")


def asset(name: str) -> str:
    return os.path.join(ASSETS, name)


def sky_background(uv):
    """The gradient used by most examples:
    (0.2,0.4,0.6)*(1-v) + blue*v."""
    v = uv[..., 1:2]
    top = jnp.asarray([0.2, 0.4, 0.6], uv.dtype)
    blue = jnp.asarray([0.0, 0.0, 1.0], uv.dtype)
    return top * (1.0 - v) + blue * v


def deg(x: float) -> float:
    import numpy as np

    return float(np.deg2rad(x))
