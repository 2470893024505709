"""One-off kernel overhead probe: times the production sweep against
variants that isolate cost components:
  * nearest         — production nearest sweep
  * anyhit          — production any-hit sweep
  * launch          — t_max tiny: the while_loop exits after 0 iterations,
                      leaving prologue + pallas launch + epilogue cost
  * flat            — the XLA brute-force sweep for context

Usage: python tools/kernel_probe.py --scene big-scene --rays 262144
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SAMPLES", "1")

import jax
import jax.numpy as jnp

from kernel_lab import load_tables, make_rays, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big-scene")
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from portrayer_tpu import RenderConfig
    from portrayer_tpu.ops.pallas_intersect import intersect_scene_pallas
    from portrayer_tpu.ops.intersect import intersect_scene

    spec, st = load_tables(args.scene)
    R = args.rays
    o, d = make_rays(spec, R)
    cfg = RenderConfig(samples=1, pallas_block=args.block)
    t_min = jnp.full((R,), cfg.epsilon, jnp.float32)
    print(f"scene={args.scene} chunks={st.packed.n_chunks} R={R} "
          f"B={args.block}")

    fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
        o, d, t, jnp.inf, st, cfg))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"nearest {dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s")

    fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
        o, d, t, jnp.inf, st, cfg, any_hit=True))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"anyhit  {dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s")

    # Zero-iteration launch: t_max == t_min => ub tiny => loop never runs.
    fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
        o, d, t, 2e-5, st, cfg))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"launch  {dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s")

    cfg_flat = RenderConfig(samples=1, accel="flat")
    fn = jax.jit(lambda o, d, t: intersect_scene(
        o, d, t, jnp.inf, st, cfg_flat))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"flat    {dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    main()
