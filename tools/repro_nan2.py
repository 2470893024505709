"""Variant NaN hunts: flat-index strided grids, jittered rays, deeper
bounces, and a full-image castle render — all on the live backend."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenes
from portrayer_tpu import RenderConfig
from portrayer_tpu.scene.flatten import flatten_scene
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.trace import trace

spec = scenes.load("graphics-castle")
W, H = spec.size
cfg0 = RenderConfig(samples=1, accel="pallas")
st = flatten_scene(spec.scene, dtype=cfg0.dtype)
cam = Camera(spec.camera, spec.size, dtype=cfg0.dtype)


def run(px, py, max_depth, label, jitter_key=None):
    cfg = RenderConfig(samples=1, accel="pallas", max_depth=max_depth)
    P = px.shape[0]
    if jitter_key is not None:
        j = jax.random.uniform(jitter_key, (P, 2), cfg.dtype)
        px = px + j[:, 0] - 0.5
        py = py + j[:, 1] - 0.5
    o, d = cam.rays_at(px, py)
    pix = jnp.arange(P, dtype=jnp.int32)
    bg = jnp.zeros((P, 3), cfg.dtype)
    fn = jax.jit(lambda k, o, d: trace(k, o, d, pix, bg, P, st, cfg,
                                       spp_contiguous=1))
    t0 = time.time()
    acc = np.asarray(fn(jax.random.PRNGKey(0), o, d))
    dt = time.time() - t0
    n_nan = int(np.isnan(acc).any(axis=-1).sum())
    print(f"{label}: rays={P} nan_px={n_nan} "
          f"max={np.nanmax(acc):.4g} ({dt:.1f}s incl compile)", flush=True)
    if n_nan:
        bad = np.where(np.isnan(acc).any(axis=-1))[0][:10]
        for i in bad:
            print(f"  bad ray {i}: px={float(px[i]):.2f} py={float(py[i]):.2f}")
    return n_nan


# (a) flat-index stride covering the whole image
idx = np.arange(0, W * H, 31)[:65536]
px = jnp.asarray((idx % W).astype(np.float32)) + 0.5
py = jnp.asarray((idx // W).astype(np.float32)) + 0.5
run(px, py, 0, "flat-stride-31 d0")

# (b) same with jitter
run(px, py, 0, "flat-stride-31 d0 jitter", jitter_key=jax.random.PRNGKey(7))

# (c) 512x512 uniform grid, depth 0  (262k rays)
xs = np.linspace(0, W - 1, 512)
ys = np.linspace(0, H - 1, 512)
yy, xx = np.meshgrid(ys, xs, indexing="ij")
px2 = jnp.asarray(xx.reshape(-1).astype(np.float32)) + 0.5
py2 = jnp.asarray(yy.reshape(-1).astype(np.float32)) + 0.5
run(px2, py2, 0, "512x512 d0")

# (d) strided grid, full depth (bounce rounds exercise incoherent rays)
run(px, py, 10, "flat-stride-31 d10")
