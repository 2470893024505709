"""Sub-block culling granularity sweep: time the castle nearest + any-hit
sweeps at pallas_subblock in {256 (=round-3 block-level), 64, 32} on the
real TPU.  Run on a QUIET machine (CPU contention throttles the relay —
docs/PERF.md methodology)."""
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
from portrayer_tpu.ops.intersect import intersect_scene, occluded


def stream(f, args_fn, n=10):
    jax.block_until_ready(f(*args_fn(0)))
    argsets = [args_fn(i + 1) for i in range(n)]
    t0 = time.time()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    spec = scenes.load("graphics-castle")
    w, h = spec.size
    st = flatten_scene(spec.scene, dtype=jnp.float32)
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    order = sys.argv[2] if len(sys.argv) > 2 else "tile16"
    if order == "strided":
        stride = max(1, (w * h) // (512 * 512))
        flat = np.arange(0, w * h, stride)[:512 * 512]
        px = jnp.asarray((flat % w).astype(np.float32)) + 0.5
        py = jnp.asarray((flat // w).astype(np.float32)) + 0.5
    else:
        side = 512
        x0, y0 = (w - side) // 2, (h - side) // 2
        ys, xs = np.mgrid[y0:y0 + side, x0:x0 + side]
        t16 = lambda a: (a.reshape(side // 16, 16, side // 16, 16)
                         .transpose(0, 2, 1, 3).reshape(-1))
        px = jnp.asarray(t16(xs), jnp.float32) + 0.5
        py = jnp.asarray(t16(ys), jnp.float32) + 0.5
    o, d = cam.rays_at(px, py)
    R = o.shape[0]

    subs = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                             else ["256", "64", "32"])]
    for sub in subs:
        cfg = RenderConfig(samples=1, accel="pallas", pallas_subblock=sub)
        near = jax.jit(lambda o, d, cfg=cfg: intersect_scene(
            o, d, 1e-5, jnp.inf, st, cfg, exact_t=False))
        t0 = time.time()
        hit = jax.block_until_ready(near(o, d))
        tc = time.time() - t0
        dt = stream(near, lambda i: (o + 1e-6 * (i + 1), d))
        print(f"SUB={sub:4d} nearest: {dt*1e3:7.2f} ms "
              f"({R/dt/1e6:6.2f} Mrays/s)  hits={int(hit.hit.sum())} "
              f"compile={tc:.0f}s", flush=True)
        anyh = jax.jit(lambda o, d, cfg=cfg: occluded(
            o, d, 1e-5, jnp.inf, st, cfg))
        occ = jax.block_until_ready(anyh(o, d))
        dt = stream(anyh, lambda i: (o + 1e-6 * (i + 1), d))
        print(f"SUB={sub:4d} any-hit: {dt*1e3:7.2f} ms "
              f"({R/dt/1e6:6.2f} Mrays/s)  occ={int(occ.sum())}", flush=True)


if __name__ == "__main__":
    main()
