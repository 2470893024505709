"""Chunk-packing A/B: crossed-chunks-per-block stats for morton vs sah.

The sweep kernel pays one [B,128] eval step per chunk a block's candidate
list holds, so expected crossings per block IS the forward sweep cost
model.  This runs entirely on CPU numpy — no TPU needed.

Usage: python tools/packing_lab.py [scene] [res]
"""
import os
import sys

os.environ.setdefault("SAMPLES", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
import scenes
from portrayer_tpu import RenderConfig, flatten_scene
from portrayer_tpu.camera import Camera


def block_stats(st, o, d, B=256):
    pk = st.packed
    R = o.shape[0]
    NB = R // B
    cmin = np.asarray(pk.chunk_min)
    cmax = np.asarray(pk.chunk_max)
    o = np.asarray(o).reshape(NB, B, 1, 3)
    dn = np.asarray(d).reshape(NB, B, 1, 3)
    inv = 1.0 / np.where(np.abs(dn) < 1e-30,
                         np.where(dn < 0, -1e-30, 1e-30), dn)
    t1 = (cmin[None, None] - o) * inv
    t2 = (cmax[None, None] - o) * inv
    ten = np.minimum(t1, t2).max(axis=3)
    tex = np.maximum(t1, t2).min(axis=3)
    cross = (ten <= tex) & (tex >= 1e-5)          # [NB, B, Nc]
    per_ray = cross.sum(axis=2)                    # [NB, B]
    per_block = cross.any(axis=1).sum(axis=1)      # [NB]
    return per_ray.mean(), per_block.mean(), per_block.max(), pk.n_chunks


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "graphics-castle"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spec = scenes.load(name)
    w, h = spec.size
    cfg = RenderConfig(samples=1)
    cam = Camera(spec.camera, (w, h), dtype=jnp.float32)
    x0, y0 = (w - res) // 2, (h - res) // 2
    ys, xs = np.mgrid[y0:y0 + res, x0:x0 + res]
    t16 = lambda a: (a.reshape(res // 16, 16, res // 16, 16)
                     .transpose(0, 2, 1, 3).reshape(-1))
    px = jnp.asarray(t16(xs), jnp.float32) + 0.5
    py = jnp.asarray(t16(ys), jnp.float32) + 0.5
    o, d = cam.rays_at(px, py)

    for packing in ("morton", "sah"):
        st = flatten_scene(spec.scene, dtype=jnp.float32, packing=packing)
        pr, pb, pbmax, nc = block_stats(st, o, d)
        print(f"{name:24s} {packing:6s}: chunks={nc:4d}  "
              f"per-ray crossed {pr:6.2f}  per-block union {pb:6.2f} "
              f"(max {pbmax})  evals/ray ~{pb * 128:7.0f}")


if __name__ == "__main__":
    main()
