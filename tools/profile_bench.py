"""Break down big-scene render time: primary intersect vs full trace."""
import os, sys, time
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


def timeit(f, *args, n=3):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    spec = scenes.load("big-scene")
    w, h = spec.size
    st = flatten_scene(spec.scene, dtype=jnp.float32)
    print(f"scene: n_nodes={st.n_nodes} n_pairs={st.n_pairs} groups={st.groups}")

    R = 1024 * 256  # quarter-megaray batch
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    ys, xs = np.mgrid[0:512, 0:512]
    px = jnp.asarray(xs.reshape(-1), jnp.float32) + 0.5
    py = jnp.asarray(ys.reshape(-1), jnp.float32) + 0.5
    o, d = cam.rays_at(px, py)
    Rr = o.shape[0]
    print(f"rays: {Rr}")

    for accel in ["flat", "beam"]:
        cfg = RenderConfig(samples=1, accel=accel, node_chunk=256)
        f = jax.jit(lambda o, d: intersect_scene(o, d, 1e-5, jnp.inf, st, cfg))
        dt = timeit(f, o, d)
        print(f"primary intersect [{accel}]: {dt*1e3:.1f} ms -> {Rr/dt/1e6:.2f} Mrays/s")

    # full trace on same rays
    for accel in ["flat", "beam"]:
        cfg = RenderConfig(samples=1, accel=accel, node_chunk=256)
        P_ = Rr
        pix = jnp.arange(P_, dtype=jnp.int32)
        bg = jnp.zeros((P_, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        f = jax.jit(lambda key, o, d: trace(key, o, d, pix, bg, P_, st, cfg))
        dt = timeit(f, key, o, d)
        print(f"full trace [{accel}]: {dt*1e3:.1f} ms -> {Rr/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
