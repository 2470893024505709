"""Reproducer for the round-2 verdict's depth-0 NaN on the real-TPU
Pallas castle path: full-image strided ray grid, max_depth=0,
accel="pallas".  Prints NaN counts for the traced radiance."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenes
from portrayer_tpu import RenderConfig
from portrayer_tpu.scene.flatten import flatten_scene
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.trace import trace


def main(accel="pallas", max_depth=0, stride=None, n_side=256):
    spec = scenes.load("graphics-castle")
    w, h = spec.size
    cfg = RenderConfig(samples=1, accel=accel, max_depth=max_depth)
    st = flatten_scene(spec.scene, dtype=cfg.dtype)
    cam = Camera(spec.camera, spec.size, dtype=cfg.dtype)

    # n_side x n_side grid strided across the WHOLE image (incoherent-ish).
    xs = np.linspace(0, w - 1, n_side)
    ys = np.linspace(0, h - 1, n_side)
    ys, xs = np.meshgrid(ys, xs, indexing="ij")
    px = jnp.asarray(xs.reshape(-1), cfg.dtype) + 0.5
    py = jnp.asarray(ys.reshape(-1), cfg.dtype) + 0.5
    o, d = cam.rays_at(px, py)
    P = n_side * n_side
    pix = jnp.arange(P, dtype=jnp.int32)
    bg = jnp.zeros((P, 3), cfg.dtype)
    key = jax.random.PRNGKey(0)

    fn = jax.jit(lambda k, o, d: trace(k, o, d, pix, bg, P, st, cfg,
                                       spp_contiguous=1))
    acc = np.asarray(fn(key, o, d))
    n_nan = int(np.isnan(acc).any(axis=-1).sum())
    n_inf = int((~np.isfinite(acc)).any(axis=-1).sum()) - n_nan
    print(f"backend={jax.default_backend()} accel={accel} depth={max_depth} "
          f"rays={P} nan_px={n_nan} inf_px={n_inf} "
          f"min={np.nanmin(acc):.4g} max={np.nanmax(acc):.4g}")
    if n_nan:
        bad = np.where(np.isnan(acc).any(axis=-1))[0]
        print("first bad pixels:", bad[:20].tolist())
        print("their (x,y):", [(float(xs.reshape(-1)[i]),
                                float(ys.reshape(-1)[i])) for i in bad[:5]])
    return n_nan


if __name__ == "__main__":
    accel = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    main(accel=accel, max_depth=depth)
