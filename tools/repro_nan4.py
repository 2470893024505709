"""Dump shade_hits intermediates for the 9 NaN rays (castle, node 6905).
Run with JAX_PLATFORMS unset (TPU) and JAX_PLATFORMS=cpu to compare."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenes
from portrayer_tpu import RenderConfig
from portrayer_tpu.scene.flatten import flatten_scene, tri_record, node_record
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.intersect import intersect_scene, hit_detail
from portrayer_tpu.ops import shade as sh
from portrayer_tpu import math3d as m3

spec = scenes.load("graphics-castle")
W, H = spec.size
cfg = RenderConfig(samples=1, accel="flat", max_depth=0)
st = flatten_scene(spec.scene, dtype=cfg.dtype)
cam = Camera(spec.camera, spec.size, dtype=cfg.dtype)

BAD_PX = [946.5, 945.5, 946.5, 945.5, 946.5, 945.5, 946.5, 945.5, 946.5]
BAD_PY = [442.5, 457.5, 473.5, 488.5, 504.5, 519.5, 535.5, 550.5, 566.5]
px = jnp.asarray(BAD_PX, cfg.dtype)
py = jnp.asarray(BAD_PY, cfg.dtype)
o, d = cam.rays_at(px, py)
R = o.shape[0]
t_min = jnp.full((R,), cfg.epsilon, cfg.dtype)
src_node = jnp.full((R,), -1, jnp.int32)
src_tri = jnp.full((R,), -1, jnp.int32)
active = jnp.ones((R,), bool)

hit = intersect_scene(o, d, t_min, jnp.inf, st, cfg, active=active,
                      src_node=src_node, src_tri=src_tri)
det = hit_detail(o, d, hit, st, cfg, t_min, src_node=src_node,
                 src_tri=src_tri)
P = np.asarray

print("backend:", jax.default_backend())
print("t:", P(hit.t), "node:", P(hit.node), "tri:", P(hit.tri))
print("nmt[0]:\n", P(det.nmt)[0])
print("nmt nan:", np.isnan(P(det.nmt)).sum(), "inf:", np.isinf(P(det.nmt)).sum())
print("normal:", P(det.normal)[0], "uv:", P(det.uv)[0])

# triangle record internals
trec = P(tri_record(st))[np.maximum(P(hit.tri), 0)]
uva, uvb, uvc = trec[:, 18:20], trec[:, 20:22], trec[:, 22:24]
duv1 = uvb - uva
duv2 = uvc - uva
coeff = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
print("uva:", uva[0], "uvb:", uvb[0], "uvc:", uvc[0])
print("coeff:", coeff)

# shade intermediates
rec = det.rec
mat_tex = rec[:, 22].astype(jnp.int32)
mat_nm = rec[:, 23].astype(jnp.int32)
uv = sh._apply_uv_trans(rec[:, 25:31], det.uv)
print("uv warped:", P(uv)[0], "tex:", P(mat_tex), "nm:", P(mat_nm))
n_geom = m3.normalize(det.normal, eps=1e-30)
print("n_geom:", P(n_geom)[0])
nm_texel = sh.sample_atlas(st.nm_data, st.nm_meta, mat_nm, uv, srgb=False)
print("nm_texel:", P(nm_texel))
nm_vec = m3.normalize(sh._decode_normal_map(nm_texel), eps=1e-30)
print("nm_vec:", P(nm_vec))
n_mapped = m3.matvec3(det.nmt, nm_vec)
print("n_mapped:", P(n_mapped))
use_nm = (mat_nm >= 0) & det.has_nmt & det.has_uv
print("use_nm:", P(use_nm))
n = jnp.where(use_nm[..., None], n_mapped, n_geom)
img_texel = sh.sample_atlas(st.tex_data, st.tex_meta, mat_tex, uv)
print("img_texel:", P(img_texel)[0])

# meta of the atlas rows involved
print("nm_meta:", P(st.nm_meta), " nm_data len:", st.nm_data.shape)
m = P(st.nm_meta)[np.maximum(P(mat_nm), 0)]
off, w, h = m[:, 0], m[:, 1], m[:, 2]
x = np.trunc(P(uv)[:, 0] * (w - 1)).astype(np.int64)
y = np.trunc(P(uv)[:, 1] * (h - 1)).astype(np.int64)
print("raw x idx:", x, "raw y:", y, " w:", w, "h:", h)
xm = np.mod(x, np.maximum(w, 1))
ym = np.mod(y, np.maximum(h, 1))
idx = off + ym * w + xm
print("final idx:", idx, "max valid:", st.nm_data.shape[0] - 1)
