"""Numerical-safety checks — the TPU-side answer to the reference's
race/panic story (SURVEY §5): the reference leans on Rust ownership and
rayon's panic_fuse (src/render.rs:36,130); an XLA pipeline is SPMD-pure, so
the failure modes that remain are numerical (NaN/Inf radiance, divergent
normals).  `checked_trace` runs the wavefront loop under jax.checkify and
reports float errors with their source location; `assert_image_finite` is
a cheap post-hoc guard for production renders."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from .config import RenderConfig
from .ops.trace import trace


def checked_trace(key, o, d, pix, bg, n_pixels, st, cfg: RenderConfig):
    """Run trace() under checkify float checks (NaN/Inf anywhere in the
    bounce loop).  Returns (err, acc); call err.throw() to raise.

    Uses the flat sweep: checkify cannot instrument the Pallas kernel or
    the beam path's dynamic-trip while_loop.
    """
    import dataclasses

    if cfg.accel != "flat":
        cfg = dataclasses.replace(cfg, accel="flat")

    def run(key, o, d, pix, bg, st):
        return trace(key, o, d, pix, bg, n_pixels, st, cfg)

    checked = checkify.checkify(run, errors=checkify.float_checks)
    return checked(key, o, d, pix, bg, st)


def assert_image_finite(img, context: str = "render"):
    """Raise with a diagnostic if an image contains NaN/Inf texels."""
    import numpy as np

    arr = np.asarray(img)
    bad = ~np.isfinite(arr)
    if bad.any():
        first = np.unravel_index(int(np.argmax(bad)), arr.shape)
        raise FloatingPointError(
            f"{context}: {int(bad.sum())} non-finite values; first at "
            f"index {tuple(int(i) for i in first)}"
        )
    return img
