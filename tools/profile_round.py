"""Bounce-round breakdown: where do the ~500ms/round of castle depth-10 go?

Times trace at increasing max_depth (marginal round cost), prints live-ray
counts per round, then times the pieces of one bounce round on the real
round-1 child queue (intersect / detail / shade / compact / scatter)."""
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
from portrayer_tpu.ops.intersect import intersect_scene, hit_detail
from portrayer_tpu.ops.shade import shade_hits
import importlib
tr = importlib.import_module('portrayer_tpu.ops.trace')


def timeit(f, *args, n=8):
    """Pipelined per-call time over DISTINCT inputs (vary the first array
    arg per rep: floats get +eps, ints get a roll, PRNG keys fold_in) —
    per-call sync costs ~25 ms relay RTT and identical repeats dedup."""
    import jax as _jax
    import jax.numpy as _jnp

    def vary(i):
        a0 = args[0]
        if not hasattr(a0, "dtype"):
            return args
        if a0.dtype in (_jnp.float32, _jnp.float64):
            return (a0 + _jnp.asarray(1e-6 * (i + 1), a0.dtype),) + args[1:]
        if a0.dtype == _jnp.uint32:
            return (_jax.random.fold_in(a0, i),) + args[1:]
        return (_jnp.roll(a0, i + 1),) + args[1:]
    for _ in range(2):
        jax.block_until_ready(f(*args))
    argsets = [vary(i) for i in range(n)]
    jax.block_until_ready([a[0] for a in argsets])
    t0 = time.perf_counter()
    rs = [f(*a) for a in argsets]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / n


spec = scenes.load("graphics-castle")
w, h = spec.size
st = flatten_scene(spec.scene, dtype=jnp.float32)
cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
R = 262144
side = 512
x0, y0 = (w - side) // 2, (h - side) // 2
ys, xs = np.mgrid[y0:y0 + side, x0:x0 + side]
px = jnp.asarray(xs.reshape(-1), jnp.float32) + 0.5
py = jnp.asarray(ys.reshape(-1), jnp.float32) + 0.5
o, d = cam.rays_at(px, py)
pix = jnp.arange(R, dtype=jnp.int32)
bg = jnp.zeros((R, 3), jnp.float32)
key = jax.random.PRNGKey(0)

# live rays per round
cfg = RenderConfig(samples=1, accel="pallas", max_depth=10)
acc, stats = jax.jit(lambda k, o, d: tr.trace(
    k, o, d, pix, bg, R, st, cfg, spp_contiguous=1, with_stats=True))(key, o, d)
print("live rays per round:", np.asarray(stats.live).tolist(), flush=True)
print("overflow-dropped throughput fraction:",
      float(stats.dropped_w), flush=True)

for depth in (0, 1, 2, 3):
    cfgd = RenderConfig(samples=1, accel="pallas", max_depth=depth)
    f = jax.jit(lambda k, o, d, cfgd=cfgd: tr.trace(
        k, o, d, pix, bg, R, st, cfgd, spp_contiguous=1))
    dt = timeit(f, key, o, d)
    print(f"trace depth={depth}: {dt*1e3:9.2f} ms", flush=True)

# (per-piece _round timings removed: the round was restructured into
#  _round_shade + fused shadow/nearest launches — see ops/trace.py)
