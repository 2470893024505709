"""Kernel experiment lab: loads a scene once (with on-disk table caching),
then times intersect/occlusion/trace variants in-process so one run can
sweep many configurations without re-paying flatten + compile overhead
serially per config.

Usage: python tools/kernel_lab.py --scene big-scene --rays 262144 \
           --blocks 256,512,1024 [--what nearest,anyhit,trace]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SAMPLES", "1")

import numpy as np
import jax
import jax.numpy as jnp

CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".lab_cache")


def load_tables(scene_name, dtype=jnp.float32):
    """flatten_scene with a pickle cache (castle takes ~22s to build)."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, scene_name + ".pkl")
    import scenes
    from portrayer_tpu.scene.flatten import flatten_scene

    spec = scenes.load(scene_name)
    if os.path.exists(path):
        with open(path, "rb") as f:
            st_np = pickle.load(f)
        st = jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            st_np,
        )
        return spec, st
    st = flatten_scene(spec.scene, dtype=dtype)
    st_np = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x, st
    )
    try:
        with open(path, "wb") as f:
            pickle.dump(st_np, f)
    except Exception:
        pass
    return spec, st


def make_rays(spec, R, dtype=jnp.float32):
    from portrayer_tpu.camera import Camera

    w, h = spec.size
    cam = Camera(spec.camera, (w, h), dtype=dtype)
    side = int(np.sqrt(R))
    ys, xs = np.mgrid[0:side, 0:side]
    px = jnp.asarray((xs.reshape(-1) * (w / side)) % w, dtype) + 0.5
    py = jnp.asarray((ys.reshape(-1) * (h / side)) % h, dtype) + 0.5
    px = jnp.pad(px, (0, R - side * side))
    py = jnp.pad(py, (0, R - side * side))
    o, d = cam.rays_at(px, py)
    return o, d


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
    ap.add_argument("--scene", default="big-scene")
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--blocks", default="256")
    ap.add_argument("--slabs", default="256")
    ap.add_argument("--what", default="nearest,trace")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from portrayer_tpu import RenderConfig
    from portrayer_tpu.ops.pallas_intersect import intersect_scene_pallas
    from portrayer_tpu.ops.trace import trace

    spec, st = load_tables(args.scene)
    R = args.rays
    o, d = make_rays(spec, R)
    what = args.what.split(",")
    print(f"scene={args.scene} chunks={st.packed.n_chunks} "
          f"lights={st.n_lights} R={R}")

    for b in (int(x) for x in args.blocks.split(",")):
        for sc in (int(x) for x in args.slabs.split(",")):
            cfg = RenderConfig(samples=1, pallas_block=b,
                               pallas_slab_chunks=sc)
            t_min = jnp.full((R,), cfg.epsilon, jnp.float32)
            tag = f"B={b:5d} SC={sc:4d}"
            if "nearest" in what:
                fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
                    o, d, t, jnp.inf, st, cfg))
                dt = timeit(fn, o, d, t_min, reps=args.reps)
                print(f"{tag} nearest {dt*1e3:8.2f} ms "
                      f"{R/dt/1e6:8.2f} Mrays/s", flush=True)
            if "anyhit" in what:
                fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
                    o, d, t, jnp.inf, st, cfg, any_hit=True))
                dt = timeit(fn, o, d, t_min, reps=args.reps)
                print(f"{tag} anyhit  {dt*1e3:8.2f} ms "
                      f"{R/dt/1e6:8.2f} Mrays/s", flush=True)
            if "trace" in what:
                P = R
                pix = jnp.arange(P, dtype=jnp.int32)
                bg = jnp.zeros((P, 3), jnp.float32)
                key = jax.random.PRNGKey(0)
                fn = jax.jit(lambda k, o, d: trace(
                    k, o, d, pix, bg, P, st, cfg, spp_contiguous=1))
                dt = timeit(fn, key, o, d, reps=args.reps)
                print(f"{tag} trace   {dt*1e3:8.2f} ms "
                      f"{R/dt/1e6:8.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
