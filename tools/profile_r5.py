"""Round-5 fwd+bwd ratio experiments on the castle crop.

Measures, at depth 10 on the 65k-ray 256-crop:
  1. fwd only                                  (scan tail)
  2. fwd+bwd ALL fields                        (scan tail)   <- round-4: ratio 2.82
  3. fwd only, unroll_tail=True
  4. fwd+bwd ALL fields, unroll_tail=True      <- the untested knob

Usage: python tools/profile_r5.py [case ...]   (cases: fwd scan unroll fwd_unroll)
Run on a QUIET machine.
"""
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
from portrayer_tpu.ops.trace import trace
from portrayer_tpu.parallel import make_mesh, train_step
from portrayer_tpu.parallel.sharding import DIFF_FIELDS


def stream(f, args_fn, n=8):
    # two warm-up calls: the relay uploads host-sourced buffers lazily
    jax.block_until_ready(f(*args_fn(1000)))
    jax.block_until_ready(f(*args_fn(1001)))
    argsets = [args_fn(i + 1) for i in range(n)]
    t0 = time.time()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    want = set(sys.argv[1:]) or {"fwd", "scan", "fwd_unroll", "unroll"}
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

    def cfg_of(unroll, divs=(16, 4, 1), remat_min=0):
        return RenderConfig(samples=1, accel="pallas", max_depth=10,
                            queue_caps=spec.queue_caps, unroll_tail=unroll,
                            queue_slice_divs=divs,
                            remat_min_lanes=remat_min)

    results = {}
    for name, unroll, bwd, divs, remat_min in [
        ("fwd", False, False, (16, 4, 1), 0),
        ("scan", False, True, (16, 4, 1), 0),
        ("fwd_unroll", True, False, (16, 4, 1), 0),
        ("unroll", True, True, (16, 4, 1), 0),
        # single-variant diagnostics: isolate lax.switch AD cost /
        # shrink the unrolled program under the relay's 2GiB AOT limit
        ("fwd_divs16", False, False, (16,), 0),
        ("divs16", False, True, (16,), 0),
        ("fwd_unroll16", True, False, (16,), 0),
        ("unroll16", True, True, (16,), 0),
        # remat exemptions: with no scan, un-remat'd rounds keep their
        # (small) shading temps and backward skips the replay entirely.
        # The round-3 13GB atlas-stacking failure was a scan artifact.
        ("unroll16_rm8k", True, True, (16,), 8192),
        ("unroll16_rmall", True, True, (16,), 1 << 20),
    ]:
        if name not in want:
            continue
        cfg = cfg_of(unroll, divs, remat_min)
        if bwd:
            fn = jax.jit(lambda k, o, d, cfg=cfg: train_step(
                mesh, k, o, d, pix, bg, R, 1, target, st, cfg,
                fields=DIFF_FIELDS))
        else:
            fn = jax.jit(lambda k, o, d, cfg=cfg: trace(
                k, o, d, pix, bg, R, st, cfg, spp_contiguous=1))
        t0 = time.time()
        dt = stream(fn, lambda i: (jax.random.fold_in(key, i), o, d))
        results[name] = dt
        print(f"{name:<12}: {dt*1e3:8.2f} ms   "
              f"({R/dt/1e6:5.2f} Mrays/s)  [compile+run {time.time()-t0:.0f}s]",
              flush=True)

    if "fwd" in results and "scan" in results:
        print(f"ratio scan  : {results['scan']/results['fwd']:.2f}")
    if "fwd_unroll" in results and "unroll" in results:
        print(f"ratio unroll: {results['unroll']/results['fwd_unroll']:.2f}")


if __name__ == "__main__":
    main()
