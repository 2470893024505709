"""A/B the bounce-tail structure for backward cost: lax.scan tail vs
Python-unrolled tail (cfg.unroll_tail) at matched depth/caps.

The scan body's backward pays per-iteration residual stacking/slicing
mechanics (~4.6 ms/round on castle, docs/PERF.md); unrolling removes the
scan at ~max_depth x the compile time.  Run on a QUIET machine.

Usage: python tools/profile_tail.py [depth] [scan|unroll|both]
"""
import os
import sys
import time

os.environ.setdefault("SAMPLES", "1")
import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scenes
from portrayer_tpu import RenderConfig, flatten_scene
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.trace import trace
from portrayer_tpu.parallel import make_mesh, train_step


def stream(f, args_fn, n=8):
    # TWO warm-up calls, matching bench._timeit_stream: the relay uploads
    # host-sourced buffers lazily, so a single warm-up folds upload cost
    # into the timed region (round-4 advisor).
    for j in range(2):
        jax.block_until_ready(f(*args_fn(j)))
    argsets = [args_fn(i + 2) for i in range(n)]
    t0 = time.time()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    spec = scenes.load("graphics-castle")
    w, h = spec.size
    st = flatten_scene(spec.scene, dtype=jnp.float32)
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    side = 256
    x0, y0 = (w - side) // 2, (h - side) // 2
    ys, xs = np.mgrid[y0:y0 + side, x0:x0 + side]
    t16 = lambda a: (a.reshape(side // 16, 16, side // 16, 16)
                     .transpose(0, 2, 1, 3).reshape(-1))
    px = jnp.asarray(t16(xs), jnp.float32) + 0.5
    py = jnp.asarray(t16(ys), jnp.float32) + 0.5
    o, d = cam.rays_at(px, py)
    R = o.shape[0]
    pix = jnp.arange(R, dtype=jnp.int32)
    bg = jnp.zeros((R, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(1)
    target = jnp.zeros((R, 3), jnp.float32)

    variants = []
    if which in ("scan", "both"):
        variants.append(("scan  ", False))
    if which in ("unroll", "both"):
        variants.append(("unroll", True))

    for name, unroll in variants:
        cfg = RenderConfig(samples=1, accel="pallas", max_depth=depth,
                           queue_caps=spec.queue_caps, unroll_tail=unroll)
        fwd = jax.jit(lambda k, o, d, cfg=cfg: trace(
            k, o, d, pix, bg, R, st, cfg, spp_contiguous=1))
        tc0 = time.time()
        dt_f = stream(fwd, lambda i: (jax.random.fold_in(key, i), o, d))
        fn = jax.jit(lambda k, o, d, cfg=cfg: train_step(
            mesh, k, o, d, pix, bg, R, 1, target, st, cfg,
            fields=("mat_diffuse",)))
        dt = stream(fn, lambda i: (jax.random.fold_in(key, i), o, d))
        print(f"{name} d={depth}: fwd {dt_f*1e3:7.2f} ms  "
              f"fwd+bwd {dt*1e3:7.2f} ms (ratio {dt/dt_f:4.2f})  "
              f"[wall incl compile {time.time()-tc0:5.1f}s]", flush=True)


if __name__ == "__main__":
    main()
