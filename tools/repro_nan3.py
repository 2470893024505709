"""Stage-by-stage NaN isolation for the castle TPU pallas path."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenes
from portrayer_tpu import RenderConfig
from portrayer_tpu.scene.flatten import flatten_scene
from portrayer_tpu.camera import Camera
from portrayer_tpu.ops.intersect import intersect_scene, hit_detail
from portrayer_tpu.ops.shade import shade_hits

spec = scenes.load("graphics-castle")
W, H = spec.size
cfg = RenderConfig(samples=1, accel="pallas", max_depth=0)
st = flatten_scene(spec.scene, dtype=cfg.dtype)
cam = Camera(spec.camera, spec.size, dtype=cfg.dtype)

idx = np.arange(0, W * H, 31)[:65536]
px = jnp.asarray((idx % W).astype(np.float32)) + 0.5
py = jnp.asarray((idx // W).astype(np.float32)) + 0.5
o, d = cam.rays_at(px, py)
R = o.shape[0]
t_min = jnp.full((R,), cfg.epsilon, cfg.dtype)
src_node = jnp.full((R,), -1, jnp.int32)
src_tri = jnp.full((R,), -1, jnp.int32)
active = jnp.ones((R,), bool)

BAD = np.array([27406, 28335, 29326, 30255, 31246, 32175, 33166, 34095, 35086])


@jax.jit
def stage1(o, d):
    hit = intersect_scene(o, d, t_min, jnp.inf, st, cfg, active=active,
                          src_node=src_node, src_tri=src_tri, exact_t=False)
    det = hit_detail(o, d, hit, st, cfg, t_min,
                     src_node=src_node, src_tri=src_tri)
    local, children, t_eps = shade_hits(
        d, hit, det, st, cfg, jax.random.fold_in(jax.random.PRNGKey(0), 0),
        active & hit.hit)
    return hit, det, local


hit, det, local = stage1(o, d)
hit = jax.tree.map(np.asarray, hit)
det_np = jax.tree.map(np.asarray, det)
local = np.asarray(local)

print("== pallas hit on bad lanes ==")
for i in BAD:
    print(f"lane {i}: t={hit.t[i]:.6g} node={hit.node[i]} tri={hit.tri[i]} "
          f"hit={hit.hit[i]}")
print("== det on bad lanes ==")
for i in BAD[:4]:
    print(f"lane {i}: point={det_np.point[i]} normal={det_np.normal[i]} "
          f"uv={det_np.uv[i]} mat={det_np.material[i]}")
    print(f"   rec[12:24]={det_np.rec[i][12:24]}")
print("== local color ==")
for i in BAD[:9]:
    print(f"lane {i}: local={local[i]}")

nan_local = np.isnan(local).any(axis=-1)
print("total nan local:", nan_local.sum(), "at", np.where(nan_local)[0][:20])
nan_det = np.isnan(det_np.normal).any(axis=-1)
print("total nan normal:", nan_det.sum())
nan_pt = np.isnan(det_np.point).any(axis=-1)
print("total nan point:", nan_pt.sum())
print("total nan t:", np.isnan(hit.t).sum())

# ground truth from the flat path on the bad rays (padded to 16)
cfg_flat = RenderConfig(samples=1, accel="flat", max_depth=0)
ob = jnp.asarray(np.asarray(o)[BAD])
db = jnp.asarray(np.asarray(d)[BAD])
Rb = len(BAD)
hit_f = intersect_scene(ob, db, jnp.full((Rb,), cfg.epsilon, cfg.dtype),
                        jnp.inf, st, cfg_flat,
                        active=jnp.ones((Rb,), bool),
                        src_node=jnp.full((Rb,), -1, jnp.int32),
                        src_tri=jnp.full((Rb,), -1, jnp.int32))
hit_f = jax.tree.map(np.asarray, hit_f)
print("== flat-path ground truth ==")
for k, i in enumerate(BAD):
    print(f"lane {i}: t={hit_f.t[k]:.6g} node={hit_f.node[k]} "
          f"tri={hit_f.tri[k]} hit={hit_f.hit[k]}")
