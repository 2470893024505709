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

    # trace-path variants (what the renderer actually pays)
    fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
        o, d, t, jnp.inf, st, cfg, exact_t=False))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"near-q  {dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s  (exact_t=False)")

    fn = jax.jit(lambda o, d, t: intersect_scene_pallas(
        o, d, t, 2e-5, st, cfg, exact_t=False))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"launch-q{dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s  (0-iter, no winner_t)")

    cfg_flat = RenderConfig(samples=1, accel="flat")
    fn = jax.jit(lambda o, d, t: intersect_scene(
        o, d, t, jnp.inf, st, cfg_flat))
    dt = timeit(fn, o, d, t_min, reps=args.reps)
    print(f"flat    {dt*1e3:8.2f} ms {R/dt/1e6:8.2f} Mrays/s")




def prologue_probe(scene="big-scene", R=262144, B=256, reps=5):
    """Time prologue pieces in isolation (run via --prologue)."""
    from portrayer_tpu import RenderConfig
    from portrayer_tpu.ops.beam import _warp_entry_t, _pad_to
    import jax.numpy as jnp

    spec, st = load_tables(scene)
    o, d = make_rays(spec, R)
    cfg = RenderConfig(samples=1, pallas_block=B)
    pk = st.packed
    NB = R // B

    def blocks(o, d):
        ob = o.reshape(NB, B, 3)
        db = d.reshape(NB, B, 3)
        omin = ob.min(axis=1); omax = ob.max(axis=1)
        dmin = db.min(axis=1); dmax = db.max(axis=1)
        return _warp_entry_t(omin, omax, dmin, dmax,
                             pk.chunk_min, pk.chunk_max)

    fn = jax.jit(lambda o, d: blocks(o, d).sum())
    dt = timeit(fn, o, d, reps=reps)
    print(f"entry_t       {dt*1e3:8.2f} ms")

    fn = jax.jit(lambda o, d: jnp.argsort(blocks(o, d), axis=1).sum())
    dt = timeit(fn, o, d, reps=reps)
    print(f"entry_t+sort  {dt*1e3:8.2f} ms")

    def packed(o, d):
        ob = o.reshape(NB, B, 3); db = d.reshape(NB, B, 3)
        z = jnp.zeros((NB, B))
        return jnp.stack([ob[...,0],ob[...,1],ob[...,2],
                          db[...,0],db[...,1],db[...,2],
                          z,z,z,z,z], axis=-1)
    fn = jax.jit(lambda o, d: packed(o, d))
    dt = timeit(fn, o, d, reps=reps)
    print(f"rays_packed   {dt*1e3:8.2f} ms")

    from portrayer_tpu.ops.intersect import winner_t
    node = jnp.zeros((R,), jnp.int32)
    tri = jnp.full((R,), -1, jnp.int32)
    t_min = jnp.full((R,), cfg.epsilon, jnp.float32)
    fn = jax.jit(lambda o, d, n, tr: winner_t(o, d, n, tr, st, cfg,
                                              t_min, jnp.inf).sum())
    dt = timeit(fn, o, d, node, tri, reps=reps)
    print(f"winner_t      {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    if "--prologue" in sys.argv:
        sys.argv.remove("--prologue")
        import argparse
        ap = argparse.ArgumentParser()
        ap.add_argument("--scene", default="big-scene")
        ap.add_argument("--rays", type=int, default=262144)
        ap.add_argument("--block", type=int, default=256)
        a, _ = ap.parse_known_args()
        prologue_probe(a.scene, a.rays, a.block)
    else:
        main()
