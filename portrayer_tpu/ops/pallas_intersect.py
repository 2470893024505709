"""Pallas TPU sweep kernel — the production intersection path.

The XLA sweeps in ops/intersect.py materialize [rays, chunk] intermediates
in HBM and are bandwidth-bound.  This kernel keeps the whole working set in
VMEM and runs the ray x prim cross product on the VPU as [B,1] x [1,128]
broadcasts:

  * The scene is the packed Morton-chunked prim table built by
    scene/flatten.py (`PackedPrims`): 128-wide single-kind chunks with
    world AABBs — the SIMD analogue of the reference's kd-tree leaves
    (src/kdtree/leaf.rs:89-231).  Chunks carry *specialized* kinds where
    the transform can be baked out at pack time (world-space spheres,
    axis-aligned boxes, world-space triangles), cutting the per-candidate
    VPU cost by 2-4x vs the general world->local affine path.
  * An XLA prologue runs the PER-RAY slab test of every chunk AABB as a
    fused [rays, chunks] reduce, grouped per SUB-ray group: a group's
    entry-t for a chunk is the min entry over its rays that actually
    cross it (+inf when none does — such chunks compact to the back of
    that group's list and are never visited).  Each group gets its OWN
    front-to-back candidate list + crossed count in SMEM.  The SHIPPED
    default is ONE group per block (cfg.pallas_subblock == pallas_block
    == 256): coherent tile-ordered blocks share near-identical crossing
    sets (block union 9.1 chunks vs per-ray 8.5 on castle), so finer
    per-32/64-ray lists only multiply per-visit fixed costs — measured
    24.6 -> 51 ms at SUB=32 (docs/PERF.md round-4 negative results).
    pallas_subblock < pallas_block remains a knob for incoherent
    workloads.  (Round 2 used a block-interval bound; one sky lane then
    forced whole-scene sweeps.)
  * The kernel sweeps each sub-block's list with a while_loop on
    [SUB, 128] tiles: dynamic-slice the chunk's table rows from the
    VMEM-resident slab, static-dispatch on the chunk's packed kind, and
    fold the per-ray nearest hit as a *lane-tagged int32 key*: positive
    floats order identically as int32 bit patterns, so
    (t_bits & ~127) | lane makes one lane-min reduction deliver both the
    nearest t (quantized to 2^-16 relative) and the winning lane — no
    argmin.  The key is lane-UNIQUE, so `packed == pmin` marks exactly
    one lane and a masked lane-sum extracts the winner's node/tri ids
    in-kernel — the XLA decode epilogue this replaces was 8.7 ms of
    [R]-sized gathers per 262k rays, 2.7x the candidate evals it
    decoded.  All-dead sub-blocks (compacted late bounce rounds) skip
    entirely.
  * The wrapper's XLA epilogue recomputes the winner's t *exactly* (and
    differentiably) from the scene tables via ops.intersect.winner_t — the
    same detached-selection / reattached-value construction hit_detail
    uses, so Hit.t keeps full f32 precision and the pallas path supports
    reverse-mode AD.
  * Prim tables larger than one VMEM slab stream through a second grid
    dimension; the running best lives in the (revisited) output block.

Selection semantics match ops/intersect.py except for ties within one
2^-16 relative t-quantum, which resolve by (chunk order, lane) — i.e.
Morton order — instead of scene order (verified negligible by the
equivalence tests, the reference's mesh_equivalence oracle pattern,
src/kdtree/kdmesh.rs:99-166).  The best-t early exit and the per-block
cull are additional tie-order divergence sources: a chunk skipped because
no ray still needs it can hold an exact-t tie that scene order would have
preferred — same quantum-sized effect, covered by the same tests.

any_hit=True answers occlusion queries (shadow rays, material.rs:174-179):
the sweep stops as soon as every live ray has found *some* in-range hit,
and only `.hit` is meaningful in the result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.flatten import (
    SceneTables, PACK_CHUNK, PACKED_SPHERE_W, PACKED_AABOX,
)
from .intersect import Hit, winner_t
from .beam import _pad_to

INF = jnp.inf
INF_BITS = 0x7F800000  # bit pattern of float32 +inf (python int: kernels must not capture arrays)
C = PACK_CHUNK  # 128 prims per chunk = one VPU lane sweep
# Same-kind chunk runs at or below this length sweep as a static unrolled
# loop (no sort, no early exit): for a handful of chunks the while_loop's
# SMEM cond read + reduce (a pipeline flush per iteration) costs more than
# just evaluating every chunk.
STATIC_SWEEP_MAX = 2


# ---------------------------------------------------------------------------
# Componentwise candidate math (same formulas as ops/intersect.py, which
# cites the reference per primitive; operands are [B,128] components).
# ---------------------------------------------------------------------------

def _gd(n, d, fill=INF):
    ok = d != 0.0
    return jnp.where(ok, n / jnp.where(ok, d, 1.0), fill)


def _acos(x):
    """arccos via Abramowitz-Stegun 4.4.45 (Mosaic has no acos lowering);
    |err| < 2e-7 on [-1,1], cleaned up by the quartic's Newton polish."""
    ax = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + c
    r = p * jnp.sqrt(1.0 - ax)
    return jnp.where(x < 0.0, jnp.pi - r, r)


def _cbrt(x):
    """Signed cube root via exp/log (Mosaic has no cbrt lowering)."""
    ax = jnp.maximum(jnp.abs(x), 1e-30)
    r = jnp.exp(jnp.log(ax) / 3.0)
    return jnp.where(x == 0.0, 0.0, jnp.sign(x) * r)


def _smallest_root(a, b, c, t_min, t_max):
    """Smallest quadratic root in [t_min, t_max) — math3d.smallest_root_in_range."""
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(b >= 0.0, 1.0, -1.0)
    q = -0.5 * (b + sgn * sq)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_q = jnp.where(q == 0.0, 1.0, q)
    ra = jnp.where(a == 0.0, INF, q / safe_a)
    rb = jnp.where(q == 0.0, -b / (2.0 * safe_a), c / safe_q)
    r0 = jnp.minimum(ra, rb)
    r1 = jnp.maximum(ra, rb)
    safe_b = jnp.where(b == 0.0, 1.0, b)
    lin = jnp.where(b == 0.0, INF, -c / safe_b)
    quad_ok = (a != 0.0) & (disc >= 0.0)
    r0 = jnp.where(a == 0.0, lin, jnp.where(quad_ok, r0, INF))
    r1 = jnp.where(a == 0.0, INF, jnp.where(quad_ok, r1, INF))
    ok0 = (r0 >= t_min) & (r0 < t_max)
    ok1 = (r1 >= t_min) & (r1 < t_max)
    return jnp.where(ok0, r0, jnp.where(ok1, r1, INF))


def _unit_sphere_root(b, c, t_min, t_max):
    """Smallest root of t^2 + b t + c in [t_min, t_max) (a == 1: world-space
    spheres against normalized directions)."""
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(b >= 0.0, 1.0, -1.0)
    q = -0.5 * (b + sgn * sq)
    safe_q = jnp.where(q == 0.0, 1.0, q)
    r0 = jnp.minimum(q, c / safe_q)
    r1 = jnp.maximum(q, c / safe_q)
    ok = disc >= 0.0
    ok0 = ok & (r0 >= t_min) & (r0 < t_max)
    ok1 = ok & (r1 >= t_min) & (r1 < t_max)
    return jnp.where(ok0, r0, jnp.where(ok1, r1, INF))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(B, SUB, SC, Nslab, slab_ranges, eps, self_eps_local, dtype,
                 use_src, any_hit=False, unroll=2):
    G = B // SUB
    UN = unroll

    def kernel(cnt_ref, cand_ref, rays_ref, pf_ref, pid_ref, *outs):
        if any_hit:
            (fnd_ref,) = outs
        else:
            bp_ref, bn_ref, bt_ref = outs
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            if any_hit:
                fnd_ref[0] = jnp.zeros((B, 1), jnp.int32)
            else:
                bp_ref[0] = jnp.full((B, 1), INF_BITS, jnp.int32)
                bn_ref[0] = jnp.full((B, 1), -1, jnp.int32)
                bt_ref[0] = jnp.full((B, 1), -1, jnp.int32)

        rays = rays_ref[0]                       # [16, B] feature-major
        # Feature-major [16, B] keeps the host-side pack lane-aligned (the
        # [B, 11] layout forced XLA to write 128-lane-padded tiles: ~6ms
        # per 262k rays just building the operand).  One transpose per
        # feature per *block* moves rays onto sublanes here.
        colv = lambda i: rays[i:i + 1, :].reshape(B, 1)  # [B, 1]
        # Loop-control reductions stay [B,1] (single-lane keys/bounds).
        tmax1 = colv(7)
        act1 = colv(10) > 0.0
        # Row 11: shadow-mode flag — occlusion-only lanes stop driving
        # chunk evaluations as soon as they have ANY in-range hit (their
        # per-lane bound drops to -inf), giving any-hit economics inside
        # the nearest kernel so shadow queries can share one fused launch
        # with the next bounce round's nearest query.
        shad1 = colv(11) > 0.0
        has_act = jnp.any(act1)

        def _alive():
            # Everything below — including the per-feature [1,B]->[B,1]
            # sublane relayouts of the preamble — only runs when the
            # block has at least one live ray.  Late bounce rounds
            # compact live rays to the queue front, so most blocks skip
            # the whole body.
            # Per-ray operands are materialized as full [B, C] tiles ONCE per
            # block: inside the chunk loop every op is then plain elementwise —
            # [B,1] x [1,C] outer-broadcast ops would pay a lane-broadcast
            # relayout per use per iteration on the VPU.  Sub-block sweeps
            # slice ROWS of these (32 rows = 4 (8,128) tiles — no relayout).
            col = lambda i: jnp.broadcast_to(colv(i), (B, C))
            b_ox, b_oy, b_oz = col(0), col(1), col(2)
            b_dx, b_dy, b_dz = col(3), col(4), col(5)
            b_tminb = col(6)
            b_tmaxb = col(7)
            b_act = col(10) > 0.0
            if use_src:
                b_src_i = col(8).astype(jnp.int32)   # ids stored as exact floats
                b_srct_i = col(9).astype(jnp.int32)

            # Reciprocal directions for the AABOX slab test, hoisted out of the
            # chunk loop (3 divides per ray per *block*, not per chunk).
            def _rcp(dc):
                tiny = jnp.where(dc < 0.0, -1e-30, 1e-30)
                return 1.0 / jnp.where(jnp.abs(dc) < 1e-30, tiny, dc)
            b_rdx, b_rdy, b_rdz = _rcp(b_dx), _rcp(b_dy), _rcp(b_dz)

            lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, C), 1)
            neg_big = jnp.asarray(-3e38, dtype)

            def make_chunk_t(g, sl):
                """chunk_t specialized to sub-block g (row slice `sl` of the
                block operands, SUB rows)."""
                ox, oy, oz = b_ox[sl], b_oy[sl], b_oz[sl]
                dx, dy, dz = b_dx[sl], b_dy[sl], b_dz[sl]
                tminb = b_tminb[sl]
                tmaxb = b_tmaxb[sl]
                act = b_act[sl]
                rdx, rdy, rdz = b_rdx[sl], b_rdy[sl], b_rdz[sl]
                if use_src:
                    src_i, srct_i = b_src_i[sl], b_srct_i[sl]

                def in_range(t, t_min):
                    return (t >= t_min) & (t < tmaxb)

                def chunk_t(pos, kind):
                    """Candidate (t, node, tri) — t [SUB,C], ids [1,C] — for
                    the chunk at sorted position `pos` of sub-block g's slab
                    row.  `kind` is STATIC — only that kind's branch is
                    traced (no runtime dispatch, absent kinds compile to
                    nothing)."""
                    cid = cand_ref[0, g, pos]
                    c0 = pl.multiple_of(cid * C, C)
                    row = lambda r: pf_ref[r, pl.ds(c0, C)].reshape(1, C)
                    node = pid_ref[0, pl.ds(c0, C)].reshape(1, C)
                    tri = pid_ref[1, pl.ds(c0, C)].reshape(1, C)
                    if use_src:
                        is_src = (node == src_i) & (tri == srct_i)
                    else:
                        is_src = jnp.zeros((SUB, C), bool)

                    def general_tmin(ld2):
                        """Self-eps raise in local units (config.self_eps_local)."""
                        if not use_src:
                            return tminb
                        t_self = self_eps_local * jax.lax.rsqrt(
                            jnp.maximum(ld2, 1e-30))
                        return jnp.where(is_src, jnp.maximum(tminb, t_self), tminb)

                    def local_frame():
                        m = [row(r) for r in range(12)]
                        lox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
                        loy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
                        loz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
                        ldx = m[0] * dx + m[1] * dy + m[2] * dz
                        ldy = m[4] * dx + m[5] * dy + m[6] * dz
                        ldz = m[8] * dx + m[9] * dy + m[10] * dz
                        return lox, loy, loz, ldx, ldy, ldz

                    # --- general kinds (world->local affine) -----------------------
                    def sphere_g():
                        lox, loy, loz, ldx, ldy, ldz = local_frame()
                        a = ldx * ldx + ldy * ldy + ldz * ldz
                        b = 2.0 * (lox * ldx + loy * ldy + loz * ldz)
                        c = lox * lox + loy * loy + loz * loz - 1.0
                        return _smallest_root(a, b, c, general_tmin(a), tmaxb)

                    def plane_g():
                        lox, loy, loz, ldx, ldy, ldz = local_frame()
                        t = _gd(-loy, ldy)
                        px = lox + t * ldx
                        pz = loz + t * ldz
                        r = 0.5 + eps
                        ld2 = ldx * ldx + ldy * ldy + ldz * ldz
                        ok = (in_range(t, general_tmin(ld2))
                              & (jnp.abs(px) <= r) & (jnp.abs(pz) <= r))
                        return jnp.where(ok, t, INF)

                    def cube_g():
                        lox, loy, loz, ldx, ldy, ldz = local_frame()
                        r = 0.5 + eps
                        o3 = (lox, loy, loz)
                        d3 = (ldx, ldy, ldz)
                        ld2 = ldx * ldx + ldy * ldy + ldz * ldz
                        t_min_e = general_tmin(ld2)
                        best = jnp.full((SUB, C), INF, dtype)
                        # FACES order of cube.rs:46-65 (sign-folded plane solve).
                        # Containment skips the solved axis (on-plane by
                        # construction; f32-robust for thin scales — see
                        # intersect._cube_face_fold).
                        p3 = lambda t: (lox + t * ldx, loy + t * ldy, loz + t * ldz)
                        for axis, sign in ((0, 0.5), (0, -0.5), (1, 0.5), (1, -0.5),
                                           (2, 0.5), (2, -0.5)):
                            sg = 1.0 if sign > 0 else -1.0
                            t = _gd(-(o3[axis] - sign) * sg, d3[axis] * sg)
                            p = p3(t)
                            contains = jnp.ones((SUB, C), bool)
                            for ax in range(3):
                                if ax != axis:
                                    contains = contains & (jnp.abs(p[ax]) <= r)
                            ok = in_range(t, t_min_e) & contains & (t < best)
                            best = jnp.where(ok, t, best)
                        return best

                    def cylinder_g():
                        lox, loy, loz, ldx, ldy, ldz = local_frame()
                        R2 = 0.25
                        a = ldx * ldx + ldz * ldz
                        b = 2.0 * (lox * ldx + loz * ldz)
                        c = lox * lox + loz * loz - R2
                        ld2 = a + ldy * ldy
                        t_min_e = general_tmin(ld2)
                        t_body = _smallest_root(a, b, c, t_min_e, tmaxb)
                        y = loy + t_body * ldy
                        best = jnp.where(~(y > 0.5) & ~(y < -0.5), t_body, INF)
                        for h in (0.5, -0.5):
                            t = _gd(h - loy, ldy)
                            px = lox + t * ldx
                            pz = loz + t * ldz
                            ok = in_range(t, t_min_e) & ~(px * px + pz * pz > R2)
                            t = jnp.where(ok, t, INF)
                            best = jnp.where(t < best, t, best)
                        return best

                    def cone_g():
                        lox, loy, loz, ldx, ldy, ldz = local_frame()
                        H = 1.0
                        h2 = H * H
                        r2 = 0.25
                        a = 4.0 * ldy * ldy * r2 - 4.0 * h2 * (ldx * ldx + ldz * ldz)
                        b = (-8.0 * h2 * (ldx * lox + ldz * loz)
                             - 4.0 * r2 * (ldy * H - 2.0 * ldy * loy))
                        c = (-4.0 * h2 * (lox * lox + loz * loz)
                             + r2 * (h2 - 4.0 * H * loy + 4.0 * loy * loy))
                        ld2 = ldx * ldx + ldy * ldy + ldz * ldz
                        t_min_e = general_tmin(ld2)
                        t_body = _smallest_root(a, b, c, t_min_e, tmaxb)
                        y = loy + t_body * ldy
                        t_body = jnp.where(~(y > 0.5) & ~(y < -0.5), t_body, INF)
                        t_cap = _gd(-0.5 - loy, ldy)
                        px = lox + t_cap * ldx
                        pz = loz + t_cap * ldz
                        okc = in_range(t_cap, t_min_e) & ~(px * px + pz * pz > r2)
                        t_cap = jnp.where(okc, t_cap, INF)
                        return jnp.where(t_cap < t_body, t_cap, t_body)

                    def torus_g():
                        # Quartic torus (primitive/torus.rs:56-110); radii in rows
                        # 12..13.  Ferrari + Newton polish, written without stacked
                        # axes for Mosaic (see math3d.quartic_roots).
                        lox, loy, loz, ldx, ldy, ldz = local_frame()
                        c_r, a_r = row(12), row(13)
                        dd = ldx * ldx + ldy * ldy + ldz * ldz
                        pp = lox * lox + loy * loy + loz * loz
                        dp = ldx * lox + ldy * loy + ldz * loz
                        t_min_e = general_tmin(dd)
                        a2 = a_r * a_r
                        c2 = c_r * c_r
                        k = pp - (a2 + c2)
                        A = dd * dd
                        Bq = 4.0 * dd * dp
                        C4 = 2.0 * dd * k + 4.0 * dp * dp + 4.0 * c2 * ldy * ldy
                        D = 4.0 * k * dp + 8.0 * c2 * loy * ldy
                        E = k * k - 4.0 * c2 * (a2 - loy * loy)

                        safe_A = jnp.where(A == 0.0, 1.0, A)
                        b = Bq / safe_A
                        c = C4 / safe_A
                        d_ = D / safe_A
                        e = E / safe_A
                        b2 = b * b
                        p = c - 3.0 * b2 / 8.0
                        q = d_ - b * c / 2.0 + b2 * b / 8.0
                        r = e - b * d_ / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

                        # Resolvent cubic z^3 + 2p z^2 + (p^2-4r) z - q^2.
                        a2c = 2.0 * p
                        a1c = p * p - 4.0 * r
                        a0c = -q * q
                        pc = a1c - a2c * a2c / 3.0
                        qc = 2.0 * a2c ** 3 / 27.0 - a2c * a1c / 3.0 + a0c
                        half_q = qc / 2.0
                        third_p = pc / 3.0
                        disc = half_q * half_q + third_p ** 3
                        safe_tp = jnp.minimum(third_p, -1e-30)
                        mm = 2.0 * jnp.sqrt(-safe_tp)
                        cos_arg = jnp.clip(
                            3.0 * qc / (pc * jnp.where(pc == 0.0, 1.0, mm)), -1.0, 1.0
                        )
                        phi = _acos(cos_arg)
                        z_trig = mm * jnp.cos(phi / 3.0) - a2c / 3.0
                        sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
                        u_c = _cbrt(-half_q + sqd)
                        v_c = _cbrt(-half_q - sqd)
                        z_card = u_c + v_c - a2c / 3.0
                        z = jnp.where(disc > 0.0, z_card, z_trig)
                        for _ in range(2):  # polish resolvent (Cardano cancellation)
                            fz = ((z + a2c) * z + a1c) * z + a0c
                            fpz = (3.0 * z + 2.0 * a2c) * z + a1c
                            z = z - fz / jnp.where(fpz == 0.0, 1.0, fpz)
                        z = jnp.maximum(z, 0.0)

                        sz = jnp.sqrt(z)
                        biquad = z < 1e-6 * (1.0 + jnp.abs(p))
                        s_safe = jnp.where(biquad, 1.0, sz)
                        half = (p + z) / 2.0
                        shift = q / (2.0 * s_safe)
                        c1 = half - shift
                        c2q = half + shift

                        d1 = sz * sz - 4.0 * c1
                        ok12 = d1 >= 0.0
                        sq1 = jnp.sqrt(jnp.maximum(d1, 0.0))
                        u1 = (-sz - sq1) / 2.0
                        u2 = (-sz + sq1) / 2.0
                        d2 = sz * sz - 4.0 * c2q
                        ok34 = d2 >= 0.0
                        sq2 = jnp.sqrt(jnp.maximum(d2, 0.0))
                        u3 = (sz - sq2) / 2.0
                        u4 = (sz + sq2) / 2.0

                        ydisc = p * p - 4.0 * r
                        okb = ydisc >= 0.0
                        ysq = jnp.sqrt(jnp.maximum(ydisc, 0.0))
                        y1 = (-p - ysq) / 2.0
                        y2 = (-p + ysq) / 2.0
                        okb1 = okb & (y1 >= 0.0)
                        okb2 = okb & (y2 >= 0.0)
                        r1s = jnp.sqrt(jnp.maximum(y1, 0.0))
                        r2s = jnp.sqrt(jnp.maximum(y2, 0.0))

                        # NB: bool selects lower as 1-bit select_n, which Mosaic
                        # rejects — use logic ops.
                        sel_ok = lambda okb_, okf: (biquad & okb_) | (~biquad & okf)
                        best = jnp.full((SUB, C), INF, dtype)
                        for u, ok in (
                            (jnp.where(biquad, -r1s, u1), sel_ok(okb1, ok12)),
                            (jnp.where(biquad, r1s, u2), sel_ok(okb1, ok12)),
                            (jnp.where(biquad, -r2s, u3), sel_ok(okb2, ok34)),
                            (jnp.where(biquad, r2s, u4), sel_ok(okb2, ok34)),
                        ):
                            t = u - b / 4.0
                            for _ in range(3):  # Newton polish (float32 robustness)
                                fv = (((A * t + Bq) * t + C4) * t + D) * t + E
                                fp = ((4.0 * A * t + 3.0 * Bq) * t + 2.0 * C4) * t + D
                                t = t - fv / jnp.where(fp == 0.0, 1.0, fp)
                            valid = ok & in_range(t, t_min_e)
                            t = jnp.where(valid, t, INF)
                            best = jnp.where(t < best, t, best)
                        return best

                    # --- specialized kinds (transform baked out at pack time) ------
                    def tri_w():
                        # Unit-triangle frame (see flatten._build_packed):
                        # rows 0..11 map homogeneous (o,1)/(d,0) into the
                        # (beta, gamma, w) frame; t = -o'w/d'w plus the
                        # barycentric compares reproduce the reference's
                        # Cramer accepted set (triangle.rs:39-80) with fewer
                        # VPU ops.
                        # Elementwise [B,C] transform (an MXU dot_general was
                        # tried and measured WORSE: K=4 uses 4/128 MXU rows
                        # and f32 needs multi-pass — the relayout + passes
                        # cost more than 21 VPU MACs).
                        m = [row(r) for r in range(12)]
                        ou = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
                        ov = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
                        ow = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
                        du = m[0] * dx + m[1] * dy + m[2] * dz
                        dv = m[4] * dx + m[5] * dy + m[6] * dz
                        dw = m[8] * dx + m[9] * dy + m[10] * dz
                        t = _gd(-ow, dw)
                        beta = ou + t * du
                        gamma = ov + t * dv
                        ok = (
                            in_range(t, tminb)
                            & ~(beta < 0.0) & ~(gamma < 0.0)
                            & ~(beta + gamma > 1.0)
                        )
                        if use_src:
                            # A ray leaving a planar triangle never legitimately
                            # re-hits it: exclude the source pair outright.
                            ok = ok & ~is_src
                        return jnp.where(ok, t, INF)

                    def sphere_w():
                        # World sphere (uniform-similarity nodes): roots of
                        # t^2 + 2 (o-c).d t + |o-c|^2 - r^2 (|d| == 1).
                        ocx = ox - row(0)
                        ocy = oy - row(1)
                        ocz = oz - row(2)
                        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
                        c = ocx * ocx + ocy * ocy + ocz * ocz - row(3)
                        if use_src:
                            t_self = self_eps_local * row(4)
                            t_min_e = jnp.where(
                                is_src, jnp.maximum(tminb, t_self), tminb)
                        else:
                            t_min_e = tminb
                        return _unit_sphere_root(b, c, t_min_e, tmaxb)

                    def aabox():
                        # Slab test on the pack-time-inflated world box: entry face
                        # if in range, else exit face — the accepted-hit semantics
                        # of the 6-face fold (cube.rs:70-82).
                        t1x = (row(0) - ox) * rdx
                        t2x = (row(3) - ox) * rdx
                        t1y = (row(1) - oy) * rdy
                        t2y = (row(4) - oy) * rdy
                        t1z = (row(2) - oz) * rdz
                        t2z = (row(5) - oz) * rdz
                        ten = jnp.maximum(jnp.maximum(
                            jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                            jnp.minimum(t1z, t2z))
                        tex = jnp.minimum(jnp.minimum(
                            jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                            jnp.maximum(t1z, t2z))
                        if use_src:
                            dlx = dx * row(6)
                            dly = dy * row(7)
                            dlz = dz * row(8)
                            ld2 = dlx * dlx + dly * dly + dlz * dlz
                            t_self = self_eps_local * jax.lax.rsqrt(
                                jnp.maximum(ld2, 1e-30))
                            t_min_e = jnp.where(
                                is_src, jnp.maximum(tminb, t_self), tminb)
                        else:
                            t_min_e = tminb
                        t = jnp.where(ten >= t_min_e, ten, tex)
                        ok = (ten <= tex) & in_range(t, t_min_e)
                        return jnp.where(ok, t, INF)

                    branches = (sphere_g, plane_g, cube_g, cylinder_g, cone_g,
                                tri_w, torus_g, sphere_w, aabox)
                    t = branches[kind]()    # static python dispatch
                    return jnp.where((node >= 0) & act, t, INF), node, tri

                return chunk_t

            def run_slab(si, g, sl):
                """Sweep sub-block g's candidate list for slab si.

                Loop control is COUNT-BASED: the prologue compacts each
                group's crossed chunks to the front of its list and hands
                the count in SMEM, so the while cond is one scalar
                compare.  (Round 3's cond recomputed a best-t bound from
                the [*,1] fold state every iteration — a vector->scalar
                sync whose pipeline flush cost ~4x the candidate evals it
                gated.  On castle the per-ray until-hit chunk count
                equals the crossed count to within 4%, so the best-t
                early exit bought nothing the crossing cull hadn't
                already.)  Evaluating positions past the count is safe —
                un-crossed chunks can only produce misses — so the
                UN-wide unrolled body needs no per-chunk masking."""
                chunk_t = make_chunk_t(g, sl)

                if any_hit:
                    fnd = fnd_ref[0, sl]
                    ri = 0
                    for kind, off, cnt, swept in slab_ranges[si]:
                        if not swept:   # short run: static unrolled sweep
                            for k in range(cnt):
                                t, _, _ = chunk_t(off + k, kind)
                                fnd = jnp.maximum(
                                    fnd,
                                    (jnp.min(t, axis=1, keepdims=True)
                                     < INF).astype(jnp.int32),
                                )
                            continue

                        def cond(state, ri=ri):
                            ci, _ = state
                            return ci < cnt_ref[0, g, ri]

                        def body(state, off=off, cnt=cnt, kind=kind):
                            ci, fnd = state
                            for k in range(UN):
                                pos = off + jnp.minimum(ci + k, cnt - 1)
                                t, _, _ = chunk_t(pos, kind)
                                fnd = jnp.maximum(
                                    fnd,
                                    (jnp.min(t, axis=1, keepdims=True)
                                     < INF).astype(jnp.int32),
                                )
                            return ci + UN, fnd

                        _, fnd = jax.lax.while_loop(
                            cond, body, (jnp.int32(0), fnd))
                        ri += 1
                    fnd_ref[0, sl] = fnd

                else:
                    bp = bp_ref[0, sl]
                    bn = bn_ref[0, sl]
                    bt = bt_ref[0, sl]

                    def fold_near(pos, kind, bp, bn, bt):
                        # Lane-tagged min fold PLUS in-kernel winner-id
                        # extraction: the packed key is lane-unique, so
                        # `packed == pmin` marks exactly one lane and a
                        # masked lane-sum reads that lane's node/tri id.
                        # This removes the whole XLA decode epilogue —
                        # measured 8.7 ms of [R]-sized gathers per 262k
                        # rays, 2.7x the candidate evals they decoded
                        # (docs/PERF.md round-5).
                        t, node, tri = chunk_t(pos, kind)
                        tb = pltpu.bitcast(t, jnp.int32)
                        packed = jax.lax.bitwise_or(
                            jax.lax.bitwise_and(tb, -128), lanes)
                        pmin = jnp.min(packed, axis=1, keepdims=True)  # [SUB,1]
                        better = pmin < bp
                        is_win = packed == pmin
                        wn = jnp.sum(jnp.where(is_win, node, 0),
                                     axis=1, keepdims=True)
                        wt = jnp.sum(jnp.where(is_win, tri, 0),
                                     axis=1, keepdims=True)
                        bp = jnp.where(better, pmin, bp)
                        bn = jnp.where(better, wn, bn)
                        bt = jnp.where(better, wt, bt)
                        return bp, bn, bt

                    ri = 0
                    for kind, off, cnt, swept in slab_ranges[si]:
                        if not swept:   # short run: static unrolled sweep
                            for k in range(cnt):
                                bp, bn, bt = fold_near(
                                    off + k, kind, bp, bn, bt)
                            continue

                        def cond(state, ri=ri):
                            ci, _, _, _ = state
                            return ci < cnt_ref[0, g, ri]

                        def body(state, off=off, cnt=cnt, kind=kind):
                            # UN-wide unroll: chunks per iteration overlap
                            # their row loads/compute; trailing positions
                            # past the count are un-crossed chunks (misses
                            # only) and the strict < fold keeps the
                            # earlier candidate winning ties.
                            ci, bp, bn, bt = state
                            for k in range(UN):
                                idx = jnp.minimum(ci + k, cnt - 1)
                                bp, bn, bt = fold_near(
                                    off + idx, kind, bp, bn, bt)
                            return ci + UN, bp, bn, bt

                        _, bp, bn, bt = jax.lax.while_loop(
                            cond, body, (jnp.int32(0), bp, bn, bt))
                        ri += 1
                    bp_ref[0, sl] = bp
                    bn_ref[0, sl] = bn
                    bt_ref[0, sl] = bt

            # Per-(slab, sub-block) sweeps: each runs under its own
            # pl.when — all-dead sub-blocks (late bounce rounds compact
            # live rays to the queue front) skip at 32-ray granularity.
            for si in range(Nslab):
                gate = has_act if Nslab == 1 else ((s == si) & has_act)
                for g in range(G):
                    sl = slice(g * SUB, (g + 1) * SUB)
                    g_gate = gate if G == 1 else (gate & jnp.any(act1[sl]))
                    pl.when(g_gate)(
                        lambda si=si, g=g, sl=sl: run_slab(si, g, sl))

        _alive()

    return kernel


# ---------------------------------------------------------------------------
# Wrapper: XLA cull prologue + pallas_call + exact-t epilogue
# ---------------------------------------------------------------------------

def intersect_scene_pallas(
    o, d, t_min, t_max, st: SceneTables, cfg: RenderConfig,
    active=None, src_node=None, src_tri=None, any_hit=False,
    exact_t=True, shadow=None,
) -> Hit:
    """Nearest hit via the Pallas sweep; same contract as intersect_scene.

    any_hit=True answers occlusion queries: only `.hit` is meaningful.
    exact_t=False skips the winner-t recompute epilogue and returns the
    kernel's quantized t key (2^-16 relative) — for callers that follow up
    with hit_detail, whose reattach recomputes the exact differentiable t
    anyway (one recompute instead of two; ~6.5ms per 262k rays on castle).
    shadow: optional [R] bool — lanes needing only an occlusion verdict;
    they stop driving the sweep after ANY hit, so only their `.hit` is
    meaningful (t/node/tri may be a non-nearest hit).  This lets one
    launch serve shadow + nearest lanes at any-hit economics."""
    pk = st.packed
    B = cfg.pallas_block
    assert B % 8 == 0
    dtype = o.dtype
    R0 = o.shape[0]
    NB = -(-R0 // B)
    R = NB * B

    t_min = jnp.broadcast_to(jnp.asarray(t_min, dtype), (R0,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, dtype), (R0,))
    if active is None:
        active = jnp.ones((R0,), bool)
    use_src = src_node is not None and cfg.self_eps_local > 0.0
    if src_node is None:
        src_node = jnp.full((R0,), -1, jnp.int32)
    if src_tri is None:
        src_tri = jnp.full((R0,), -1, jnp.int32)

    # Feature-major (transposed) ray rows [NB, B]: every downstream op
    # then runs on lane-aligned [*, B] tiles — the ray-major [NB, B, 3]
    # layout pads its minor dim 3 -> 128 lanes and cost ~5ms/262k rays in
    # block-bound reductions alone.
    oT = _pad_to(o, R, 0.0).T.reshape(3, NB, B)
    dT = _pad_to(d, R, 1.0).T.reshape(3, NB, B)
    actb = _pad_to(active, R, False).reshape(NB, B)
    tminb = _pad_to(t_min, R, 1.0).reshape(NB, B)
    tmaxb = _pad_to(t_max_b, R, 0.0).reshape(NB, B)
    srcb = _pad_to(src_node, R, -1).reshape(NB, B)
    srctb = _pad_to(src_tri, R, -1).reshape(NB, B)
    if shadow is None:
        shadb = jnp.zeros((NB, B), dtype)
    else:
        shadb = _pad_to(shadow.astype(dtype), R, 0.0).reshape(NB, B)

    # Per-ray slab test against every chunk AABB, reduced per SUB-BLOCK:
    # a sub-block's entry-t for a chunk is the min entry over its SUB rays
    # that actually CROSS it — chunks crossed by no ray of the sub-block
    # get +inf, sort to the back of that sub-block's candidate list and
    # are never visited.  (Round 3 reduced per 256-ray block; the block
    # UNION made every ray sweep ~8-13k candidates where a per-ray oracle
    # needs ~300-500 — sub-block lists are the granularity fix.)  The
    # chunk axis is processed in static slices so peak memory is bounded
    # at [NB, B, 64] per temp regardless of XLA fusion (round-3 advisor:
    # interpret/CPU runs materialized ~160MB intermediates per launch).
    SUB = cfg.pallas_subblock or B
    if B % SUB:
        SUB = B
    G = B // SUB

    def _rcp(dc):
        tiny = jnp.where(dc < 0.0, -1e-30, 1e-30)
        return 1.0 / jnp.where(jnp.abs(dc) < 1e-30, tiny, dc)

    cmin, cmax = pk.chunk_min, pk.chunk_max             # [Nc,3]
    rT = [_rcp(dT[axis]).reshape(NB, B, 1) for axis in range(3)]
    te_pieces = []
    CSL = 64
    for c0 in range(0, pk.n_chunks, CSL):
        c1 = min(c0 + CSL, pk.n_chunks)
        ns = c1 - c0
        ten = jnp.full((NB, B, ns), -INF, dtype)
        tex = jnp.full((NB, B, ns), INF, dtype)
        for axis in range(3):
            oa = oT[axis].reshape(NB, B, 1)
            t_a = (cmin[None, None, c0:c1, axis] - oa) * rT[axis]
            t_b = (cmax[None, None, c0:c1, axis] - oa) * rT[axis]
            ten = jnp.maximum(ten, jnp.minimum(t_a, t_b))
            tex = jnp.minimum(tex, jnp.maximum(t_a, t_b))
        cross = (
            (ten <= tex)
            & (tex >= tminb[:, :, None])
            & (ten <= tmaxb[:, :, None])
            & actb[:, :, None]
        )
        # Conservative slack for f32 slab rounding (chunk AABBs are already
        # inflated at pack time, scene/flatten.inflate).
        te_ray = jnp.maximum(ten - (1e-4 * jnp.abs(ten) + 1e-5), 0.0)
        te_pieces.append(jnp.min(
            jnp.where(cross, te_ray, INF).reshape(NB, G, SUB, ns), axis=2
        ))
    t_enter = jnp.concatenate(te_pieces, axis=2)  # [NB, G, Nc]

    Nc = pk.n_chunks
    SC = min(Nc, cfg.pallas_slab_chunks)
    Ncp = -(-Nc // SC) * SC
    Nslab = Ncp // SC
    pf, pid = pk.f32, pk.ids
    if Ncp > Nc:
        extra = Ncp - Nc
        t_enter = jnp.pad(t_enter, ((0, 0), (0, 0), (0, extra)),
                          constant_values=INF)
        pf = jnp.pad(pf, ((0, 0), (0, extra * C)))
        pid = jnp.pad(pid, ((0, 0), (0, extra * C)), constant_values=-1)

    ranges = pk.kind_ranges
    if not ranges:
        # Tables built before kind_ranges existed (stale caches): derive
        # from chunk_kind — requires a concrete (non-traced) array.
        import numpy as _np
        ck = [int(k) for k in _np.asarray(pk.chunk_kind)]
        ranges = []
        for i, k in enumerate(ck):
            if ranges and ranges[-1][0] == k:
                ranges[-1][2] += 1
            else:
                ranges.append([k, i, 1])
        ranges = tuple(tuple(r) for r in ranges)

    # Split the global same-kind chunk runs at slab boundaries into
    # per-slab static (kind, local_off, count, swept) lists; `swept` picks
    # the ordered while_loop sweep over the static unrolled one.
    slab_ranges = []
    for si in range(Nslab):
        lo, hi = si * SC, (si + 1) * SC
        rs = []
        for kind, g0, gcnt in ranges:
            a, b = max(g0, lo), min(g0 + gcnt, hi)
            if b > a:
                rs.append((int(kind), a - lo, b - a,
                           (b - a) > STATIC_SWEEP_MAX))
        slab_ranges.append(tuple(rs))
    slab_ranges = tuple(slab_ranges)

    # Per-(sub-block, range) candidate compaction: only `swept` ranges
    # pay the argsort (short runs are evaluated unconditionally, in table
    # order).  Crossed chunks (finite te) sort to the FRONT of each
    # group's list and their count goes to the kernel in SMEM — the
    # kernel's while cond is then one scalar compare per UN chunks (the
    # best-t exit it replaces cost a vector->scalar flush per iteration
    # and, with the per-ray cull, saved <4% of evals on castle).  The
    # front-to-back ordering is kept for tie-order continuity only.
    te3 = t_enter.reshape(NB, G, Nslab, SC)
    cand_rows, cnt_rows = [], []
    for si in range(Nslab):
        pieces_cand, pieces_cnt, pos = [], [], 0
        for kind, off, cnt, swept in slab_ranges[si]:
            seg = te3[:, :, si, off:off + cnt]          # [NB, G, cnt]
            if swept:
                order = jnp.argsort(seg, axis=2).astype(jnp.int32)
                pieces_cand.append(off + order)
                pieces_cnt.append(
                    jnp.sum(jnp.isfinite(seg), axis=2).astype(jnp.int32))
            else:
                pieces_cand.append(jnp.broadcast_to(
                    jnp.arange(off, off + cnt, dtype=jnp.int32)[None, None],
                    (NB, G, cnt)))
            pos += cnt
        if pos < SC:  # slab-alignment padding chunks: never visited
            pieces_cand.append(jnp.zeros((NB, G, SC - pos), jnp.int32))
        cand_rows.append(jnp.concatenate(pieces_cand, axis=2))
        if pieces_cnt:
            cnt_rows.append(jnp.stack(pieces_cnt, axis=2))  # [NB, G, n_swept]
        else:
            cnt_rows.append(jnp.zeros((NB, G, 1), jnp.int32))
    RMAX = max(r.shape[2] for r in cnt_rows)
    cnt_rows = [jnp.pad(r, ((0, 0), (0, 0), (0, RMAX - r.shape[2])))
                for r in cnt_rows]
    cand = jnp.stack(cand_rows, axis=1)      # [NB, Nslab, G, SC] local chunk
    cnts = jnp.stack(cnt_rows, axis=1)       # [NB, Nslab, G, RMAX]

    SCp = SC
    # 3-D with a G middle axis: Mosaic requires a block's last two dims
    # to be (8,128)-divisible or equal to the array's — (1, SCp) blocks of
    # a [NB*Nslab, SCp] array violate that; [.., G, SCp] blocks satisfy it.
    cnt_smem = cnts.reshape(NB * Nslab, G, RMAX)
    cand_smem = cand.reshape(NB * Nslab, G, SCp)
    # Feature-major pack: [NB, 16, B] (11 live rows + pad to a full
    # sublane pair) — lane dim B stays aligned, so this is a cheap
    # contiguous write instead of a 128-lane-padded interleave.
    zeros_row = jnp.zeros((NB, B), dtype)
    rays_packed = jnp.stack(
        [
            oT[0], oT[1], oT[2],
            dT[0], dT[1], dT[2],
            tminb, tmaxb,
            srcb.astype(dtype), srctb.astype(dtype),
            actb.astype(dtype),
            shadb,
            zeros_row, zeros_row, zeros_row, zeros_row,
        ],
        axis=1,
    )                                                   # [NB, 16, B]

    unroll = cfg.pallas_unroll or 1
    kernel = _make_kernel(B, SUB, SC, Nslab, slab_ranges, cfg.epsilon,
                          cfg.self_eps_local, dtype, use_src,
                          any_hit=any_hit, unroll=unroll)

    rays_spec = pl.BlockSpec((1, 16, B), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, G, RMAX), lambda b, s: (b * Nslab + s, 0, 0),
                            memory_space=pltpu.SMEM)
    cand_spec = pl.BlockSpec((1, G, SCp), lambda b, s: (b * Nslab + s, 0, 0),
                             memory_space=pltpu.SMEM)
    pf_spec = pl.BlockSpec((21, SC * C), lambda b, s: (0, s),
                           memory_space=pltpu.VMEM)
    pid_spec = pl.BlockSpec((2, SC * C), lambda b, s: (0, s),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, B, 1), lambda b, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    interpret = (
        cfg.pallas_interpret
        if cfg.pallas_interpret is not None
        else jax.default_backend() != "tpu"
    )

    if any_hit:
        out_shape = [jax.ShapeDtypeStruct((NB, B, 1), jnp.int32)]
        out_specs = [out_spec]
    else:
        # (packed t-key, winner node, winner tri) — ids are folded inside
        # the kernel, so no decode gathers downstream.
        out_shape = [
            jax.ShapeDtypeStruct((NB, B, 1), jnp.int32),
            jax.ShapeDtypeStruct((NB, B, 1), jnp.int32),
            jax.ShapeDtypeStruct((NB, B, 1), jnp.int32),
        ]
        out_specs = [out_spec, out_spec, out_spec]

    outs = pl.pallas_call(
        kernel,
        grid=(NB, Nslab),
        in_specs=[cnt_spec, cand_spec, rays_spec, pf_spec, pid_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(cnt_smem, cand_smem, rays_packed, pf, pid)

    if any_hit:
        fnd = outs[0].reshape(R)[:R0]
        hit = (fnd > 0) & active
        neg = jnp.full((R0,), -1, jnp.int32)
        return Hit(t=jnp.where(hit, 0.0, INF), node=neg, tri=neg, hit=hit)

    bp = outs[0].reshape(R)[:R0]
    hit = (bp < INF_BITS) & active
    # Winner ids come straight from the kernel's masked-lane-sum fold —
    # no decode gathers (the old position -> chunk -> packed-column
    # gather chain cost 8.7 ms per 262k rays, 2.7x the candidate evals
    # it decoded; docs/PERF.md round-5).
    node = jnp.where(hit, outs[1].reshape(R)[:R0], -1)
    tri = jnp.where(hit, outs[2].reshape(R)[:R0], -1)

    # Exact (and differentiable-by-construction) t for the winners; the
    # quantized key (low mantissa bits cleared) is only the fallback for
    # roots lost to float asymmetry between kernel and recompute.
    t_q = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(bp, -128), jnp.float32)
    if not exact_t:
        return Hit(t=jnp.where(hit, t_q, INF), node=node, tri=tri, hit=hit)
    t_re = winner_t(o, d, node, tri, st, cfg, t_min, t_max,
                    src_node=src_node if use_src else None,
                    src_tri=src_tri if use_src else None)
    t = jnp.where(hit & jnp.isfinite(t_re), t_re,
                  jnp.where(hit, t_q, INF))
    return Hit(t=t, node=node, tri=tri, hit=hit)
