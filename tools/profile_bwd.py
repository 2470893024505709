"""Backward-cost ablation: which parameter's VJP is the fwd+bwd/fwd gap?

Times the castle crop train_step with grad restricted to single fields
vs all DIFF_FIELDS vs fwd-only.  Run on a QUIET machine."""
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
    jax.block_until_ready(f(*args_fn(0)))
    argsets = [args_fn(i + 1) for i in range(n)]
    t0 = time.time()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spec = scenes.load("graphics-castle")
    w, h = spec.size
    cfg = RenderConfig(samples=1, accel="pallas", max_depth=depth,
                       queue_caps=spec.queue_caps)
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

    fwd = jax.jit(lambda k, o, d: trace(
        k, o, d, pix, bg, R, st, cfg, spp_contiguous=1))
    dt_f = stream(fwd, lambda i: (jax.random.fold_in(key, i), o, d))
    print(f"fwd only          : {dt_f*1e3:8.2f} ms", flush=True)

    cases = [("ALL", DIFF_FIELDS)] + [(f, (f,)) for f in DIFF_FIELDS]
    if only:
        cases = [(n, f) for n, f in cases if n in only]
    for name, fields in cases:
        fn = jax.jit(lambda k, o, d, fields=fields: train_step(
            mesh, k, o, d, pix, bg, R, 1, target, st, cfg, fields=fields))
        dt = stream(fn, lambda i: (jax.random.fold_in(key, i), o, d))
        print(f"fwd+bwd {name:<12}: {dt*1e3:8.2f} ms "
              f"(ratio {dt/dt_f:4.2f})", flush=True)


if __name__ == "__main__":
    main()
