"""Break down render time per accel path (flat / beam / pallas): primary
intersect vs full trace, with optional jax.profiler trace capture.

Usage:
  python tools/profile_bench.py [--scene big-scene] [--rays 262144]
      [--accels flat,beam,pallas] [--trace-dir /tmp/jax-trace]

--trace-dir captures a jax.profiler trace of one pallas trace invocation
(viewable with tensorboard / xprof) — SURVEY §5 tracing parity.
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
from portrayer_tpu.ops.intersect import intersect_scene
from portrayer_tpu.ops.trace import trace


def timeit(f, *args, n=5):
    """Median of per-call-synced wall times.

    Each call is individually block_until_ready-ed: the round-2 verdict
    found the pipelined variant (sync only after the last rep) reads
    ~0.1 ms for a ~1 s computation on the remote-relay TPU backend —
    the repeat dispatches were elided, so every per-op perf decision made
    off it was wrong.  Per-call sync matches a hand-timed loop."""
    for _ in range(3):   # relay uploads host-sourced buffers lazily
        r = f(*args)
        jax.block_until_ready(r)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big-scene")
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--accels", default="flat,beam,pallas")
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler trace of the pallas path")
    args = ap.parse_args()

    spec = scenes.load(args.scene)
    w, h = spec.size
    st = flatten_scene(spec.scene, dtype=jnp.float32)
    print(f"scene: n_nodes={st.n_nodes} n_pairs={st.n_pairs} "
          f"chunks={st.packed.n_chunks} backend={jax.default_backend()}")

    side = int(np.sqrt(args.rays))
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    ys, xs = np.mgrid[0:side, 0:side]
    px = jnp.asarray((xs.reshape(-1) * (w / side)) % w, jnp.float32) + 0.5
    py = jnp.asarray((ys.reshape(-1) * (h / side)) % h, jnp.float32) + 0.5
    o, d = cam.rays_at(px, py)
    Rr = o.shape[0]
    print(f"rays: {Rr}")

    accels = args.accels.split(",")
    for accel in accels:
        cfg = RenderConfig(samples=1, accel=accel, node_chunk=256)
        f = jax.jit(lambda o, d, cfg=cfg: intersect_scene(
            o, d, 1e-5, jnp.inf, st, cfg))
        dt = timeit(f, o, d)
        print(f"primary intersect [{accel:6s}]: {dt*1e3:8.1f} ms -> "
              f"{Rr/dt/1e6:7.2f} Mrays/s", flush=True)

    for accel in accels:
        cfg = RenderConfig(samples=1, accel=accel, node_chunk=256)
        P_ = Rr
        pix = jnp.arange(P_, dtype=jnp.int32)
        bg = jnp.zeros((P_, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        f = jax.jit(lambda key, o, d, cfg=cfg: trace(
            key, o, d, pix, bg, P_, st, cfg, spp_contiguous=1))
        dt = timeit(f, key, o, d)
        print(f"full trace        [{accel:6s}]: {dt*1e3:8.1f} ms -> "
              f"{Rr/dt/1e6:7.2f} Mrays/s", flush=True)
        if accel == "pallas" and args.trace_dir:
            with jax.profiler.trace(args.trace_dir):
                jax.block_until_ready(f(key, o, d))
            print(f"profiler trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
