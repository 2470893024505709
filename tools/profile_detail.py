"""hit_detail + shade micro-breakdown on the live backend: which of the
gathers / per-kind recomputes / winner-t reattach dominates the ~26 ms."""
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
from portrayer_tpu.ops.intersect import (
    intersect_scene, hit_detail, _winner_candidate_t, _cube_detail,
    _mesh_detail, _sphere_detail, _cylinder_detail,
)
from portrayer_tpu.scene.flatten import node_record, tri_record, MESH
from portrayer_tpu import math3d as m3


def timeit(f, *args, n=8):
    """Pipelined per-call time over DISTINCT inputs (vary the first array
    arg per rep: floats get +eps, ints get a roll, PRNG keys fold_in) —
    per-call sync costs ~25 ms relay RTT and identical repeats dedup."""
    import jax as _jax
    import jax.numpy as _jnp

    def vary(i):
        if not args:
            return args
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
    jax.block_until_ready([a[0] for a in argsets if a])
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
cfg = RenderConfig(samples=1, accel="pallas")

hit = jax.jit(lambda o, d: intersect_scene(
    o, d, 1e-5, jnp.inf, st, cfg, exact_t=False))(o, d)
node = jnp.maximum(hit.node, 0)
tri = jnp.maximum(hit.tri, 0)

ms = lambda dt: f"{dt*1e3:9.2f} ms"
nr = node_record(st)
trr = tri_record(st)
print("node_record build:", ms(timeit(jax.jit(lambda: node_record(st)))))
print("rec gather [R,34]:", ms(timeit(jax.jit(lambda n: nr[n]), node)))
print("tri gather [R,26]:", ms(timeit(jax.jit(lambda t: trr[t]), tri)))

rec = nr[node]
inv = rec[:, 0:12].reshape(R, 3, 4)
lo = m3.transform_point(inv, o)
ld = m3.transform_dir(inv, d)
t_min = jnp.full((R,), 1e-5, jnp.float32)
t_max = jnp.full((R,), jnp.inf, jnp.float32)
ray_kind = rec[:, 31].astype(jnp.int32)
present = {k for (k, _, _) in st.groups}
trec = tri_record(st)[tri]

wt = jax.jit(lambda lo, ld, rec, trec: _winner_candidate_t(
    lo, ld, ray_kind, rec, trec, t_min, t_max, 1e-5, present))
print("winner_t recompute:", ms(timeit(wt, lo, ld, rec, trec)))

p_local = lo + hit.t[:, None] * ld
cd = jax.jit(lambda lo, ld, p: _cube_detail(lo, ld, t_min, t_max, p, 1e-5,
                                            jnp.float32))
print("cube detail:      ", ms(timeit(cd, lo, ld, p_local)))
md = jax.jit(lambda lo, ld, trec: _mesh_detail(lo, ld, trec, t_min, t_max,
                                               jnp.float32))
print("mesh detail:      ", ms(timeit(md, lo, ld, trec)))
cyl = jax.jit(lambda lo, ld, p: _cylinder_detail(lo, ld, t_min, t_max, p,
                                                 jnp.float32))
print("cylinder detail:  ", ms(timeit(cyl, lo, ld, p_local)))

full = jax.jit(lambda o, d, hit: hit_detail(o, d, hit, st, cfg, 1e-5))
print("hit_detail full:  ", ms(timeit(full, o, d, hit)))

# shade minus occlusion: time texture sampling bits
from portrayer_tpu.ops.shade import sample_atlas, shade_hits
uv = jnp.stack([px / w, py / h], axis=-1)
mat_tex = rec[:, 22].astype(jnp.int32)
sa = jax.jit(lambda t, uv: sample_atlas(st.tex_data, st.tex_meta, t, uv))
print("tex atlas sample: ", ms(timeit(sa, mat_tex, uv)))
