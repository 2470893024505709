"""Castle perf breakdown on the live backend (round-3 speed-of-light
study).  Times each pipeline stage with per-call-synced medians:

  * nearest sweep (pallas) on coherent tile rays vs whole-image strided
  * any-hit sweep (shadow query shape: L x R rays)
  * hit_detail + shade (no occlusion) on the nearest results
  * full trace (max_depth 0 and 10)
  * block-size sensitivity (pallas_block sweep)

Usage: python tools/profile_castle.py [--rays 262144] [--blocks 256]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("SAMPLES", "1")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scenes
from portrayer_tpu import RenderConfig, flatten_scene
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.intersect import intersect_scene, hit_detail, occluded
from portrayer_tpu.ops.shade import shade_hits
from portrayer_tpu.ops.trace import trace


def timeit(f, *args, n=8):
    """Pipelined per-call time over DISTINCT inputs (perturb the first
    array arg per rep): per-call sync costs a ~25 ms relay round trip
    once any heavy program has run, and identical repeats can be deduped
    by the relay — streaming distinct inputs measures real throughput."""
    import jax.numpy as _jnp

    def vary(i):
        a0 = args[0]
        if hasattr(a0, "dtype") and a0.dtype in (_jnp.float32, _jnp.float64):
            return (a0 + _jnp.asarray(1e-6 * (i + 1), a0.dtype),) + args[1:]
        if hasattr(a0, "dtype"):  # PRNG key or int array
            import jax as _jax
            try:
                return (_jax.random.fold_in(a0, i),) + args[1:]
            except Exception:
                return args
        return args
    for _ in range(2):
        jax.block_until_ready(f(*args))
    argsets = [vary(i) for i in range(n)]
    jax.block_until_ready([a[0] for a in argsets])
    t0 = time.perf_counter()
    rs = [f(*a) for a in argsets]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / n


def report(label, dt, nrays):
    print(f"{label:44s}: {dt*1e3:9.2f} ms  {nrays/dt/1e6:8.2f} Mrays/s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--blocks", default="256")
    ap.add_argument("--skip-deep", action="store_true")
    args = ap.parse_args()

    spec = scenes.load("graphics-castle")
    w, h = spec.size
    st = flatten_scene(spec.scene, dtype=jnp.float32)
    pk = st.packed
    print(f"scene: nodes={st.n_nodes} pairs={st.n_pairs} chunks={pk.n_chunks}"
          f" kind_ranges={pk.kind_ranges} backend={jax.default_backend()}",
          flush=True)
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    R = args.rays
    side = int(np.sqrt(R))

    # coherent: center crop
    x0, y0 = (w - side) // 2, (h - side) // 2
    ys, xs = np.mgrid[y0:y0 + side, x0:x0 + side]
    pxc = jnp.asarray(xs.reshape(-1), jnp.float32) + 0.5
    pyc = jnp.asarray(ys.reshape(-1), jnp.float32) + 0.5
    oc, dc = cam.rays_at(pxc, pyc)
    # incoherent: whole-image flat stride
    idx = np.arange(0, w * h, max(1, (w * h) // R))[:R]
    pxi = jnp.asarray((idx % w).astype(np.float32)) + 0.5
    pyi = jnp.asarray((idx // w).astype(np.float32)) + 0.5
    oi, di = cam.rays_at(pxi, pyi)
    Ri = int(oi.shape[0])

    for B in [int(b) for b in args.blocks.split(",")]:
        cfg = RenderConfig(samples=1, accel="pallas", pallas_block=B)
        near = jax.jit(lambda o, d, cfg=cfg: intersect_scene(
            o, d, 1e-5, jnp.inf, st, cfg, exact_t=False))
        report(f"nearest B={B} coherent", timeit(near, oc, dc), R)
        report(f"nearest B={B} incoherent", timeit(near, oi, di), Ri)

    cfg = RenderConfig(samples=1, accel="pallas",
                       pallas_block=int(args.blocks.split(",")[0]))

    anyh = jax.jit(lambda o, d: occluded(o, d, 1e-3, jnp.inf, st, cfg))
    # shadow-shaped: origins = coherent hit points, dirs to the light
    near_c = jax.jit(lambda o, d: intersect_scene(
        o, d, 1e-5, jnp.inf, st, cfg, exact_t=False))
    hit = near_c(oc, dc)
    det = jax.jit(lambda o, d, hit: hit_detail(o, d, hit, st, cfg, 1e-5))(
        oc, dc, hit)
    lpos = st.light_pos[0]
    sdir = lpos[None] - det.point
    sdir = sdir / jnp.linalg.norm(sdir, axis=-1, keepdims=True)
    report("any-hit shadow (from coherent hits)",
           timeit(anyh, det.point, sdir), R)

    detf = jax.jit(lambda o, d, hit: hit_detail(o, d, hit, st, cfg, 1e-5))
    report("hit_detail", timeit(detf, oc, dc, hit), R)

    key = jax.random.PRNGKey(0)
    shf = jax.jit(lambda d, hit, det: shade_hits(
        d, hit, det, st, cfg, key, hit.hit))
    report("shade_hits (incl occluded)", timeit(shf, dc, hit, det), R)

    pix = jnp.arange(R, dtype=jnp.int32)
    bg = jnp.zeros((R, 3), jnp.float32)
    for depth, label in ((0, "trace depth=0"), (10, "trace depth=10")):
        if args.skip_deep and depth:
            continue
        cfgd = RenderConfig(samples=1, accel="pallas", max_depth=depth,
                            queue_caps=spec.queue_caps,
                            pallas_block=int(args.blocks.split(",")[0]))
        tf = jax.jit(lambda k, o, d, cfgd=cfgd: trace(
            k, o, d, pix, bg, R, st, cfgd, spp_contiguous=1))
        report(label + " coherent", timeit(tf, key, oc, dc, n=3), R)
        pixi = jnp.arange(Ri, dtype=jnp.int32)
        bgi = jnp.zeros((Ri, 3), jnp.float32)
        tfi = jax.jit(lambda k, o, d, cfgd=cfgd: trace(
            k, o, d, pixi, bgi, Ri, st, cfgd, spp_contiguous=1))
        report(label + " incoherent", timeit(tfi, key, oi, di, n=3), Ri)


if __name__ == "__main__":
    main()
