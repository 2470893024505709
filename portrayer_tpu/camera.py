"""Camera — batched primary-ray generation (src/camera.rs).

CameraSettings mirror the reference: eye, center, up, fovy.  ray generation
goes screen -> NDC -> view (image plane at z=-1, fov_factor = tan(fovy/2),
x scaled by aspect) -> world via inverted look_at_rh (camera.rs:34-84) —
vectorized over a whole batch of (x, y) sample positions.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from . import math3d as m3


@dataclasses.dataclass
class CameraSettings:
    eye: tuple
    center: tuple
    up: tuple = (0.0, 1.0, 0.0)
    fovy: float = m3.radians(90.0)  # radians


class Camera:
    def __init__(self, settings: CameraSettings, size, dtype=jnp.float32):
        width, height = size
        self.width = float(width)
        self.height = float(height)
        self.aspect = self.width / self.height
        self.fov_factor = float(np.tan(settings.fovy / 2.0))
        v2w = m3.invert(m3.look_at_rh(settings.eye, settings.center, settings.up))
        self.eye = jnp.asarray(settings.eye, dtype)
        self.view_to_world = jnp.asarray(m3.to_affine34(v2w), dtype)
        self.dtype = dtype

    def rays_at(self, x, y):
        """Primary rays for sample positions x, y [R] (in pixels, jittered).

        Returns (origins [R,3], directions [R,3] normalized)."""
        ndc_x = x / self.width
        ndc_y = y / self.height
        view_x = (2.0 * ndc_x - 1.0) * self.aspect * self.fov_factor
        view_y = (1.0 - 2.0 * ndc_y) * self.fov_factor
        pixel_view = jnp.stack(
            [view_x, view_y, -jnp.ones_like(view_x)], axis=-1
        )
        pixel_world = m3.transform_point(self.view_to_world, pixel_view)
        d = m3.normalize(pixel_world - self.eye)
        o = jnp.broadcast_to(self.eye, d.shape)
        return o, d
