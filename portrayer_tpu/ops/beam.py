"""Segmented beam-sweep acceleration — the TPU-native replacement for the
reference's kd-tree (src/kdtree/*, SURVEY §7 step 9).

Why not a kd-tree walk: per-ray stack traversal is divergent scalar control
flow and random gathers — the worst case for a vector machine.  Instead:

  * Rays are grouped into *warps* (contiguous batches, coherent for primary
    and shadow rays).  Each warp carries interval bounds on its origins and
    directions.
  * The ray parameter range [0, t_far] is split into S geometric *segments*
    processed front-to-back (lax.scan).  For segment s the warp's reachable
    region is a compact "beam box"; node/triangle world AABBs are culled
    against it, compacted into per-warp candidate lists, and swept in
    chunks (a dynamic-trip while_loop sized by the *largest* list).
  * Early termination: once every ray in a warp has a hit closer than the
    segment start, the warp stops contributing candidates — the analogue of
    ordered kd descent (kdtree/node.rs:132-199), captured at warp
    granularity with fully static shapes.

Equivalence with the brute-force sweep is the correctness oracle (the
reference's mesh_equivalence pattern, kdmesh.rs:99-166) — see
tests/test_beam.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..scene.flatten import SceneTables, MESH
from .intersect import (
    Hit, _ANALYTIC_CANDIDATES, triangle_candidate, INF,
)


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    pad_width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def _compact_rows(mask):
    """Row-wise stream compaction: mask [W, N] -> (ids [W, N] with -1 pad,
    counts [W]).  ids[w, :counts[w]] are the column indices where mask."""
    W, N = mask.shape
    pos = jnp.cumsum(mask, axis=1) - 1                      # [W, N]
    counts = pos[:, -1] + 1
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, N), 1)
    target = jnp.where(mask, pos, N)                        # dump to col N
    buf = jnp.full((W, N + 1), -1, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
    buf = buf.at[rows, target].set(cols, mode="drop")
    return buf[:, :N], counts


def intersect_scene_beam(
    o, d, t_min, t_max, st: SceneTables, cfg: RenderConfig,
    active=None, src_node=None, src_tri=None,
) -> Hit:
    """Beam-accelerated nearest hit; same contract as intersect_scene.

    Requires normalized ray directions (t == world distance), which the
    renderer guarantees.
    """
    R0 = o.shape[0]
    dtype = o.dtype
    w = cfg.warp_size
    W = -(-R0 // w)
    R = W * w

    t_min = jnp.broadcast_to(jnp.asarray(t_min, dtype), (R0,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, dtype), (R0,))
    if active is None:
        active = jnp.ones((R0,), bool)
    if src_node is None:
        src_node = jnp.full((R0,), -1, jnp.int32)
    if src_tri is None:
        src_tri = jnp.full((R0,), -1, jnp.int32)

    o_w = _pad_to(o, R, 0.0).reshape(W, w, 3)
    d_w = _pad_to(d, R, 1.0).reshape(W, w, 3)
    act_w = _pad_to(active, R, False).reshape(W, w)
    tmin_w = _pad_to(t_min, R, 1.0).reshape(W, w)
    tmax_w = _pad_to(t_max, R, 0.0).reshape(W, w)
    src_w = _pad_to(src_node, R, -1).reshape(W, w)
    srct_w = _pad_to(src_tri, R, -1).reshape(W, w)

    BIG = jnp.asarray(3e38, dtype)
    omin = jnp.where(act_w[..., None], o_w, BIG).min(axis=1)     # [W,3]
    omax = jnp.where(act_w[..., None], o_w, -BIG).max(axis=1)
    dmin = jnp.where(act_w[..., None], d_w, BIG).min(axis=1)
    dmax = jnp.where(act_w[..., None], d_w, -BIG).max(axis=1)

    # Scene bounds / per-warp far distance.
    scene_min = jnp.minimum(st.aabb_min.min(axis=0), st.pair_aabb_min.min(axis=0))
    scene_max = jnp.maximum(st.aabb_max.max(axis=0), st.pair_aabb_max.max(axis=0))
    scene_center = 0.5 * (scene_min + scene_max)
    half_diag = 0.5 * jnp.linalg.norm(scene_max - scene_min)
    ocenter = 0.5 * (jnp.clip(omin, -BIG, BIG) + jnp.clip(omax, -BIG, BIG))
    t_far = jnp.linalg.norm(ocenter - scene_center, axis=-1) + half_diag  # [W]
    t_far = t_far * 1.01 + 1e-3

    S = cfg.n_segments
    C = cfg.beam_chunk
    eps = cfg.epsilon
    use_src = cfg.self_eps_local > 0.0

    best_t = jnp.full((W, w), INF, dtype)
    best_node = jnp.full((W, w), -1, jnp.int32)
    best_tri = jnp.full((W, w), -1, jnp.int32)

    # Static group info.
    groups = [(k, s, c) for (k, s, c) in st.groups if k != MESH and c > 0]
    mesh_present = st.group(MESH)[1] > 0 and st.n_pairs > 0

    def eff_t_min(global_ids, ld, is_src):
        """[W,w,C] t-range start with self-surface exclusion (see
        intersect_scene)."""
        base = tmin_w[:, :, None]
        if not use_src:
            return base
        d_norm = jnp.sqrt(jnp.sum(ld * ld, axis=-1))
        t_self = cfg.self_eps_local / jnp.maximum(d_norm, 1e-30)
        return jnp.where(is_src, jnp.maximum(base, t_self), base)

    def _pad_cols(ids_buf):
        n = ids_buf.shape[1]
        target = max(C, -(-n // C) * C)
        if target > n:
            ids_buf = jnp.pad(ids_buf, ((0, 0), (0, target - n)), constant_values=-1)
        return ids_buf

    def sweep_group(carry, ids_buf, counts, start, cand_fn):
        """Chunked sweep of per-warp candidate lists (analytic group)."""
        bt, bn, btr = carry
        ids_buf = _pad_cols(ids_buf)
        max_count = counts.max()

        def cond(state):
            ci, *_ = state
            return ci * C < max_count

        def body(state):
            ci, bt, bn, btr = state
            ids = jax.lax.dynamic_slice(ids_buf, (0, ci * C), (W, C))  # [W,C]
            valid = ids >= 0
            gids = jnp.maximum(ids, 0) + start                         # [W,C]
            inv = st.inv[gids]                                         # [W,C,3,4]
            rot = inv[:, None, :, :, :3]                               # [W,1,C,3,3]
            lo = jnp.sum(rot * o_w[:, :, None, None, :], -1) + inv[:, None, :, :, 3]
            ld = jnp.sum(rot * d_w[:, :, None, None, :], -1)           # [W,w,C,3]
            is_src = gids[:, None, :] == src_w[:, :, None]
            t = cand_fn(lo, ld, eff_t_min(gids, ld, is_src),
                        tmax_w[:, :, None], eps)
            t = jnp.where(valid[:, None, :] & act_w[:, :, None], t, INF)
            j = jnp.argmin(t, axis=2)                                  # [W,w]
            tj = jnp.take_along_axis(t, j[..., None], axis=2)[..., 0]
            better = tj < bt
            picked = jnp.take_along_axis(gids[:, None, :].repeat(w, 1), j[..., None], 2)[..., 0]
            bn = jnp.where(better, picked, bn)
            bt = jnp.where(better, tj, bt)
            return ci + 1, bt, bn, btr

        _, bt, bn, btr = jax.lax.while_loop(cond, body, (jnp.int32(0), bt, bn, btr))
        return bt, bn, btr

    def sweep_pairs(carry, ids_buf, counts):
        """Chunked sweep of per-warp mesh-pair candidate lists."""
        bt, bn, btr = carry
        ids_buf = _pad_cols(ids_buf)
        max_count = counts.max()

        def cond(state):
            ci, *_ = state
            return ci * C < max_count

        def body(state):
            ci, bt, bn, btr = state
            ids = jax.lax.dynamic_slice(ids_buf, (0, ci * C), (W, C))
            valid = ids >= 0
            pid = jnp.maximum(ids, 0)
            node_ix = st.pair_node[pid]                                # [W,C]
            tri_ix = st.pair_tri[pid]
            inv = st.inv[node_ix]
            rot = inv[:, None, :, :, :3]
            lo = jnp.sum(rot * o_w[:, :, None, None, :], -1) + inv[:, None, :, :, 3]
            ld = jnp.sum(rot * d_w[:, :, None, None, :], -1)
            a = st.tri_a[tri_ix][:, None]                              # [W,1,C,3]
            b = st.tri_b[tri_ix][:, None]
            c = st.tri_c[tri_ix][:, None]
            is_src = (
                (node_ix[:, None, :] == src_w[:, :, None])
                & (tri_ix[:, None, :] == srct_w[:, :, None])
            )
            t, _, _ = triangle_candidate(
                lo, ld, a, b, c, eff_t_min(node_ix, ld, is_src), tmax_w[:, :, None]
            )
            t = jnp.where(valid[:, None, :] & act_w[:, :, None], t, INF)
            j = jnp.argmin(t, axis=2)
            tj = jnp.take_along_axis(t, j[..., None], axis=2)[..., 0]
            better = tj < bt
            pick = lambda arr: jnp.take_along_axis(
                arr[:, None, :].repeat(w, 1), j[..., None], 2
            )[..., 0]
            bn = jnp.where(better, pick(node_ix), bn)
            btr = jnp.where(better, pick(tri_ix), btr)
            bt = jnp.where(better, tj, bt)
            return ci + 1, bt, bn, btr

        _, bt, bn, btr = jax.lax.while_loop(cond, body, (jnp.int32(0), bt, bn, btr))
        return bt, bn, btr

    def segment_body(carry, k):
        bt, bn, btr = carry
        frac_lo = (k.astype(dtype) / S) ** 2
        frac_hi = ((k.astype(dtype) + 1.0) / S) ** 2
        seg_lo = t_far * frac_lo                                       # [W]
        seg_hi = t_far * frac_hi

        # Warp upper bound: beyond max(min(best_t, t_max)) nothing improves.
        lane_ub = jnp.minimum(bt, tmax_w)
        lane_ub = jnp.where(act_w, lane_ub, 0.0)
        warp_ub = lane_ub.max(axis=1)                                  # [W]
        needed = (seg_lo < warp_ub) & (seg_lo < t_far)

        hi = jnp.minimum(seg_hi, warp_ub)
        # Reach box: origins + [seg_lo, hi] * directions (interval product).
        cands = jnp.stack([
            seg_lo[:, None] * dmin, seg_lo[:, None] * dmax,
            hi[:, None] * dmin, hi[:, None] * dmax,
        ])
        reach_min = omin + cands.min(axis=0)
        reach_max = omax + cands.max(axis=0)
        margin = 1e-3 * (jnp.abs(reach_max - reach_min) + 1.0)
        reach_min = reach_min - margin
        reach_max = reach_max + margin

        carry2 = (bt, bn, btr)
        for kind, start, count in groups:
            amin = st.aabb_min[start:start + count]
            amax = st.aabb_max[start:start + count]
            overlap = jnp.all(
                (amin[None] <= reach_max[:, None]) & (amax[None] >= reach_min[:, None]),
                axis=-1,
            )                                                           # [W,count]
            overlap = overlap & needed[:, None]
            ids_buf, counts = _compact_rows(overlap)
            carry2 = sweep_group(
                carry2, ids_buf, counts, start, _ANALYTIC_CANDIDATES[kind]
            )
        if mesh_present:
            overlap = jnp.all(
                (st.pair_aabb_min[None] <= reach_max[:, None])
                & (st.pair_aabb_max[None] >= reach_min[:, None]),
                axis=-1,
            )
            overlap = overlap & needed[:, None]
            ids_buf, counts = _compact_rows(overlap)
            carry2 = sweep_pairs(carry2, ids_buf, counts)
        return carry2, None

    (best_t, best_node, best_tri), _ = jax.lax.scan(
        segment_body, (best_t, best_node, best_tri),
        jnp.arange(S, dtype=jnp.int32),
    )

    bt = best_t.reshape(R)[:R0]
    bn = best_node.reshape(R)[:R0]
    btr = best_tri.reshape(R)[:R0]
    hit = jnp.isfinite(bt) & active
    return Hit(t=bt, node=jnp.where(hit, bn, -1),
               tri=jnp.where(hit, btr, -1), hit=hit)
