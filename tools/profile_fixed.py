"""Decompose the pallas sweep's FIXED cost (prologue/pack/launch/decode).

kernel_probe showed launch-q (0-iteration sweep) at ~17 of the 20 ms
nearest sweep — the fixed path, not candidate evals, bounds throughput.
This times each wrapper stage with the stream protocol (distinct inputs,
one sync).  Run on a QUIET machine.

Usage: python tools/profile_fixed.py [scene] [rays]
"""
import os
import sys
import time

os.environ.setdefault("SAMPLES", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kernel_lab import load_tables, make_rays


def stream(f, args_fn, n=8):
    for j in range(2):
        jax.block_until_ready(f(*args_fn(j)))
    argsets = [args_fn(i + 2) for i in range(n)]
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "graphics-castle"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    from portrayer_tpu import RenderConfig
    from portrayer_tpu.ops.pallas_intersect import intersect_scene_pallas
    from portrayer_tpu.ops.beam import _pad_to

    spec, st = load_tables(scene)
    o0, d0 = make_rays(spec, R)
    cfg = RenderConfig(samples=1)
    t_min = jnp.full((R,), cfg.epsilon, jnp.float32)
    key = jax.random.PRNGKey(0)
    pk = st.packed
    B = cfg.pallas_block
    NB = -(-R // B)
    print(f"scene={scene} chunks={pk.n_chunks} R={R} NB={NB}")

    def perturb(i):
        # distinct origins so the relay cannot dedup dispatches
        eps = jax.random.normal(jax.random.fold_in(key, i), o0.shape,
                                jnp.float32) * 1e-4
        return (o0 + eps, d0)

    INF = jnp.inf

    def prologue(o, d):
        oT = _pad_to(o, NB * B, 0.0).T.reshape(3, NB, B)
        dT = _pad_to(d, NB * B, 1.0).T.reshape(3, NB, B)
        tminb = jnp.full((NB, B), cfg.epsilon, jnp.float32)
        tmaxb = jnp.full((NB, B), INF, jnp.float32)

        def _rcp(dc):
            tiny = jnp.where(dc < 0.0, -1e-30, 1e-30)
            return 1.0 / jnp.where(jnp.abs(dc) < 1e-30, tiny, dc)

        cmin, cmax = pk.chunk_min, pk.chunk_max
        rT = [_rcp(dT[axis]).reshape(NB, B, 1) for axis in range(3)]
        te_pieces = []
        CSL = 64
        for c0 in range(0, pk.n_chunks, CSL):
            c1 = min(c0 + CSL, pk.n_chunks)
            ns = c1 - c0
            ten = jnp.full((NB, B, ns), -INF, jnp.float32)
            tex = jnp.full((NB, B, ns), INF, jnp.float32)
            for axis in range(3):
                oa = oT[axis].reshape(NB, B, 1)
                t_a = (cmin[None, None, c0:c1, axis] - oa) * rT[axis]
                t_b = (cmax[None, None, c0:c1, axis] - oa) * rT[axis]
                ten = jnp.maximum(ten, jnp.minimum(t_a, t_b))
                tex = jnp.minimum(tex, jnp.maximum(t_a, t_b))
            cross = ((ten <= tex) & (tex >= tminb[:, :, None])
                     & (ten <= tmaxb[:, :, None]))
            te_ray = jnp.maximum(ten - (1e-4 * jnp.abs(ten) + 1e-5), 0.0)
            te_pieces.append(jnp.min(
                jnp.where(cross, te_ray, INF).reshape(NB, 1, B, ns), axis=2))
        return jnp.concatenate(te_pieces, axis=2)   # [NB, 1, Nc]

    fn = jax.jit(lambda o, d: prologue(o, d))
    dt_pro = stream(fn, perturb)
    print(f"prologue slab test   {dt_pro*1e3:8.2f} ms")

    fn = jax.jit(lambda o, d: jnp.argsort(prologue(o, d), axis=2))
    dt_sort = stream(fn, perturb)
    print(f"  + argsort          {dt_sort*1e3:8.2f} ms "
          f"(sort ~{(dt_sort-dt_pro)*1e3:.2f})")

    def pack(o, d):
        oT = _pad_to(o, NB * B, 0.0).T.reshape(3, NB, B)
        dT = _pad_to(d, NB * B, 1.0).T.reshape(3, NB, B)
        z = jnp.zeros((NB, B), jnp.float32)
        return jnp.stack([oT[0], oT[1], oT[2], dT[0], dT[1], dT[2],
                          z, z, z, z, z, z, z, z, z, z], axis=1)
    fn = jax.jit(lambda o, d: pack(o, d))
    dt_pack = stream(fn, perturb)
    print(f"rays_packed build    {dt_pack*1e3:8.2f} ms")

    # Full production paths.
    fn = jax.jit(lambda o, d: intersect_scene_pallas(
        o, d, t_min, INF, st, cfg, exact_t=False))
    dt_nearq = stream(fn, perturb)
    print(f"near-q (full)        {dt_nearq*1e3:8.2f} ms "
          f"{R/dt_nearq/1e6:6.2f} Mrays/s")

    fn = jax.jit(lambda o, d: intersect_scene_pallas(
        o, d, t_min, 2e-5, st, cfg, exact_t=False))
    dt_launch = stream(fn, perturb)
    print(f"launch-q (0-iter)    {dt_launch*1e3:8.2f} ms "
          f"(evals ~{(dt_nearq-dt_launch)*1e3:.2f})")

    fn = jax.jit(lambda o, d: intersect_scene_pallas(
        o, d, t_min, INF, st, cfg, any_hit=True))
    dt_any = stream(fn, perturb)
    print(f"any-hit (full)       {dt_any*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
