"""Pallas TPU sweep kernel — the production intersection path.

The XLA sweeps in ops/intersect.py materialize [rays, chunk] intermediates
in HBM and are bandwidth-bound (~2 Mrays/s on a 1000-prim scene).  This
kernel keeps the whole working set in VMEM and runs the ray x prim cross
product on the VPU as [B,1] x [1,128] broadcasts:

  * The scene is the packed Morton-chunked prim table built by
    scene/flatten.py (`PackedPrims`): 128-wide single-kind chunks with
    world AABBs — the SIMD analogue of the reference's kd-tree leaves
    (src/kdtree/leaf.rs:89-231).
  * An XLA prologue culls chunks per ray block with the conservative
    interval slab test (the beam-sweep test, ops/beam.py), sorts survivors
    front-to-back by conservative entry-t, and hands the kernel per-block
    candidate lists (culled/padded entries carry entry-t = +inf).
  * The kernel walks candidates with a while_loop: dynamic-slice the
    chunk's 21 table rows from the VMEM-resident slab, transform the ray
    block into prim-local frames, lax.switch on the chunk's primitive
    kind, fold a per-lane nearest hit, and stop as soon as the next
    chunk's entry-t exceeds the block's current-best upper bound — the
    early termination of ordered kd-tree descent (kdtree/node.rs:132-199)
    at ray-block granularity with fully static shapes.
  * Prim tables larger than one VMEM slab stream through a second grid
    dimension; the running best lives in the (revisited) output block.

TPU block-shape rules (last two dims divisible by (8,128) or equal to the
array's) shape the layouts: per-ray vectors are stored [NB, B, 1] (rays on
sublanes) and per-block candidate lists [NB*Nslab, 1, SCp] (candidates on
lanes) so blocks cover full trailing dims, and per-candidate scalars are
read with one-hot masked reductions instead of dynamic vector indexing.

Selection semantics match ops/intersect.py except for exact-t ties between
two different primitives, which resolve by Morton order instead of scene
order (verified negligible by the equivalence tests, the reference's
mesh_equivalence oracle pattern, src/kdtree/kdmesh.rs:99-166).

Forward-only (no VJP): the differentiable path uses accel="flat".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.flatten import SceneTables, PACK_CHUNK
from .intersect import Hit
from .beam import _warp_entry_t, _pad_to

INF = jnp.inf
C = PACK_CHUNK  # 128 prims per chunk = one VPU lane sweep


# ---------------------------------------------------------------------------
# Componentwise candidate math (same formulas as ops/intersect.py, which
# cites the reference per primitive; operands are [B,128] local components).
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


def _branches(t_max, eps):
    """The six per-kind candidate functions for lax.switch.

    Signature: (lox,loy,loz, ldx,ldy,ldz, t_min, ax,ay,az, bx,by,bz,
    cx,cy,cz) -> t [B,128] (inf = miss).  Vertex rows are ignored by the
    analytic kinds.
    """

    def in_range(t, t_min):
        return (t >= t_min) & (t < t_max)

    def sphere(lox, loy, loz, ldx, ldy, ldz, t_min, *_):
        a = ldx * ldx + ldy * ldy + ldz * ldz
        b = 2.0 * (lox * ldx + loy * ldy + loz * ldz)
        c = lox * lox + loy * loy + loz * loz - 1.0
        return _smallest_root(a, b, c, t_min, t_max)

    def plane(lox, loy, loz, ldx, ldy, ldz, t_min, *_):
        t = _gd(-loy, ldy)
        px = lox + t * ldx
        pz = loz + t * ldz
        r = 0.5 + eps
        ok = in_range(t, t_min) & (jnp.abs(px) <= r) & (jnp.abs(pz) <= r)
        return jnp.where(ok, t, INF)

    def cube(lox, loy, loz, ldx, ldy, ldz, t_min, *_):
        r = 0.5 + eps
        o3 = (lox, loy, loz)
        d3 = (ldx, ldy, ldz)
        best = jnp.full(lox.shape, INF, lox.dtype)
        # FACES order of cube.rs:46-65 (sign-folded plane solve).
        for axis, sign in ((0, 0.5), (0, -0.5), (1, 0.5), (1, -0.5),
                           (2, 0.5), (2, -0.5)):
            s = 1.0 if sign > 0 else -1.0
            t = _gd(-(o3[axis] - sign) * s, d3[axis] * s)
            px = lox + t * ldx
            py = loy + t * ldy
            pz = loz + t * ldz
            contains = (
                (jnp.abs(px) <= r) & (jnp.abs(py) <= r) & (jnp.abs(pz) <= r)
            )
            ok = in_range(t, t_min) & contains & (t < best)
            best = jnp.where(ok, t, best)
        return best

    def cylinder(lox, loy, loz, ldx, ldy, ldz, t_min, *_):
        R2 = 0.25
        a = ldx * ldx + ldz * ldz
        b = 2.0 * (lox * ldx + loz * ldz)
        c = lox * lox + loz * loz - R2
        t_body = _smallest_root(a, b, c, t_min, t_max)
        y = loy + t_body * ldy
        best = jnp.where(~(y > 0.5) & ~(y < -0.5), t_body, INF)
        for h in (0.5, -0.5):
            t = _gd(h - loy, ldy)
            px = lox + t * ldx
            pz = loz + t * ldz
            ok = in_range(t, t_min) & ~(px * px + pz * pz > R2)
            t = jnp.where(ok, t, INF)
            best = jnp.where(t < best, t, best)
        return best

    def cone(lox, loy, loz, ldx, ldy, ldz, t_min, *_):
        H = 1.0
        h2 = H * H
        r2 = 0.25
        a = 4.0 * ldy * ldy * r2 - 4.0 * h2 * (ldx * ldx + ldz * ldz)
        b = (
            -8.0 * h2 * (ldx * lox + ldz * loz)
            - 4.0 * r2 * (ldy * H - 2.0 * ldy * loy)
        )
        c = (
            -4.0 * h2 * (lox * lox + loz * loz)
            + r2 * (h2 - 4.0 * H * loy + 4.0 * loy * loy)
        )
        t_body = _smallest_root(a, b, c, t_min, t_max)
        y = loy + t_body * ldy
        t_body = jnp.where(~(y > 0.5) & ~(y < -0.5), t_body, INF)
        t_cap = _gd(-0.5 - loy, ldy)
        px = lox + t_cap * ldx
        pz = loz + t_cap * ldz
        okc = in_range(t_cap, t_min) & ~(px * px + pz * pz > r2)
        t_cap = jnp.where(okc, t_cap, INF)
        return jnp.where(t_cap < t_body, t_cap, t_body)

    def torus(lox, loy, loz, ldx, ldy, ldz, t_min, ax, ay, *_):
        # Quartic torus (primitive/torus.rs:56-110); center radius in packed
        # row 12 (ax), tube radius in row 13 (ay).  Ferrari + Newton polish,
        # written without stacked axes for Mosaic (see math3d.quartic_roots
        # for the reference implementation).
        c_r, a_r = ax, ay
        dd = ldx * ldx + ldy * ldy + ldz * ldz
        pp = lox * lox + loy * loy + loz * loz
        dp = ldx * lox + ldy * loy + ldz * loz
        a2 = a_r * a_r
        c2 = c_r * c_r
        k = pp - (a2 + c2)
        A = dd * dd
        B = 4.0 * dd * dp
        C4 = 2.0 * dd * k + 4.0 * dp * dp + 4.0 * c2 * ldy * ldy
        D = 4.0 * k * dp + 8.0 * c2 * loy * ldy
        E = k * k - 4.0 * c2 * (a2 - loy * loy)

        safe_A = jnp.where(A == 0.0, 1.0, A)
        b = B / safe_A
        c = C4 / safe_A
        d = D / safe_A
        e = E / safe_A
        b2 = b * b
        p = c - 3.0 * b2 / 8.0
        q = d - b * c / 2.0 + b2 * b / 8.0
        r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

        # Resolvent cubic z^3 + 2p z^2 + (p^2-4r) z - q^2: largest real root.
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
        for _ in range(2):  # polish the resolvent (Cardano cancellation)
            fz = ((z + a2c) * z + a1c) * z + a0c
            fpz = (3.0 * z + 2.0 * a2c) * z + a1c
            z = z - fz / jnp.where(fpz == 0.0, 1.0, fpz)
        z = jnp.maximum(z, 0.0)

        s = jnp.sqrt(z)
        biquad = z < 1e-6 * (1.0 + jnp.abs(p))
        s_safe = jnp.where(biquad, 1.0, s)
        half = (p + z) / 2.0
        shift = q / (2.0 * s_safe)
        c1 = half - shift
        c2q = half + shift

        d1 = s * s - 4.0 * c1
        ok12 = d1 >= 0.0
        sq1 = jnp.sqrt(jnp.maximum(d1, 0.0))
        u1 = (-s - sq1) / 2.0
        u2 = (-s + sq1) / 2.0
        d2 = s * s - 4.0 * c2q
        ok34 = d2 >= 0.0
        sq2 = jnp.sqrt(jnp.maximum(d2, 0.0))
        u3 = (s - sq2) / 2.0
        u4 = (s + sq2) / 2.0

        ydisc = p * p - 4.0 * r
        okb = ydisc >= 0.0
        ysq = jnp.sqrt(jnp.maximum(ydisc, 0.0))
        y1 = (-p - ysq) / 2.0
        y2 = (-p + ysq) / 2.0
        okb1 = okb & (y1 >= 0.0)
        okb2 = okb & (y2 >= 0.0)
        r1s = jnp.sqrt(jnp.maximum(y1, 0.0))
        r2s = jnp.sqrt(jnp.maximum(y2, 0.0))

        # NB: bool selects lower as 1-bit select_n, which Mosaic rejects
        # ("unsupported target bitwidth for truncation") — use logic ops.
        sel_ok = lambda okb, okf: (biquad & okb) | (~biquad & okf)
        best = jnp.full(lox.shape, INF, lox.dtype)
        for u, ok in (
            (jnp.where(biquad, -r1s, u1), sel_ok(okb1, ok12)),
            (jnp.where(biquad, r1s, u2), sel_ok(okb1, ok12)),
            (jnp.where(biquad, -r2s, u3), sel_ok(okb2, ok34)),
            (jnp.where(biquad, r2s, u4), sel_ok(okb2, ok34)),
        ):
            t = u - b / 4.0
            for _ in range(3):  # Newton polish (float32 robustness)
                f = (((A * t + B) * t + C4) * t + D) * t + E
                fp = ((4.0 * A * t + 3.0 * B) * t + 2.0 * C4) * t + D
                t = t - f / jnp.where(fp == 0.0, 1.0, fp)
            valid = ok & in_range(t, t_min)
            t = jnp.where(valid, t, INF)
            best = jnp.where(t < best, t, best)
        return best

    def triangle(lox, loy, loz, ldx, ldy, ldz, t_min,
                 ax, ay, az, bx, by, bz, cx, cy, cz):
        # Shirley/Cramer (triangle.rs:39-80), componentwise.
        A, B_, C_ = ax - bx, ay - by, az - bz
        D, E, F = ax - cx, ay - cy, az - cz
        G, H, I = ldx, ldy, ldz
        J, K, L = ax - lox, ay - loy, az - loz
        ei_hf = E * I - H * F
        gf_di = G * F - D * I
        dh_eg = D * H - E * G
        M = A * ei_hf + B_ * gf_di + C_ * dh_eg
        ak_jb = A * K - J * B_
        jc_al = J * C_ - A * L
        bl_ck = B_ * L - C_ * K
        t = _gd(-(F * ak_jb + E * jc_al + D * bl_ck), M)
        gamma = _gd(I * ak_jb + H * jc_al + G * bl_ck, M, 2.0)
        beta = _gd(J * ei_hf + K * gf_di + L * dh_eg, M, 2.0)
        ok = (
            in_range(t, t_min)
            & ~(gamma < 0.0) & ~(gamma > 1.0)
            & ~(beta < 0.0) & ~(beta > 1.0 - gamma)
        )
        return jnp.where(ok, t, INF)

    return (sphere, plane, cube, cylinder, cone, triangle, torus)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(B, SCp, eps, self_eps_local, dtype, any_hit=False):
    use_src = self_eps_local > 0.0

    def kernel(candte_ref, rays_ref, pf_ref, pid_ref, aabb_ref,
               bt_ref, bn_ref, btr_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            bt_ref[0] = jnp.full((B, 1), INF, dtype)
            bn_ref[0] = jnp.full((B, 1), -1, jnp.int32)
            btr_ref[0] = jnp.full((B, 1), -1, jnp.int32)

        rays = rays_ref[0]                       # [B, 11] (one DMA per step)
        col = lambda i: rays[:, i:i + 1]         # [B, 1] lane slices
        ox, oy, oz = col(0), col(1), col(2)
        dx, dy, dz = col(3), col(4), col(5)
        tmin = col(6)
        tmax = col(7)
        src = col(8).astype(jnp.int32)           # ids stored as exact floats
        srct = col(9).astype(jnp.int32)
        act = col(10) > 0.0
        bt_prev = bt_ref[0]  # carried across slabs (s iterates fastest)

        te_row = candte_ref[0, 0:1, :]  # [1, SCp]; +inf = dead
        cand_row = candte_ref[0, 1:2, :].astype(jnp.int32)
        lane_sc = jax.lax.broadcasted_iota(jnp.int32, (1, SCp), 1)
        has_act = jnp.any(act)
        neg_inf = jnp.asarray(-INF, dtype)

        branches = _branches(tmax, eps)

        def chunk_hits(cand):
            cid = jax.lax.shift_right_logical(cand, 3)
            kind = jax.lax.bitwise_and(cand, 7)
            c0 = cid * C
            row = lambda r: pf_ref[r, pl.ds(c0, C)].reshape(1, C)
            m = [row(r) for r in range(12)]
            lox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
            loy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
            loz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
            ldx = m[0] * dx + m[1] * dy + m[2] * dz
            ldy = m[4] * dx + m[5] * dy + m[6] * dz
            ldz = m[8] * dx + m[9] * dy + m[10] * dz
            node = pid_ref[0, pl.ds(c0, C)].reshape(1, C)
            tri = pid_ref[1, pl.ds(c0, C)].reshape(1, C)
            if use_src:
                is_src = (node == src) & (tri == srct)
                dn = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
                t_self = self_eps_local / jnp.maximum(dn, 1e-30)
                t_min_e = jnp.where(is_src, jnp.maximum(tmin, t_self), tmin)
            else:
                t_min_e = jnp.broadcast_to(tmin, (B, C))
            verts = [row(r) for r in range(12, 21)]
            t = jax.lax.switch(
                kind, branches,
                lox, loy, loz, ldx, ldy, ldz, t_min_e, *verts,
            )
            t = jnp.where((node >= 0) & act, t, INF)
            return t, node, tri

        def pick_scalar(values, ci, fill):
            """values[0, ci] via one-hot masked max (no dynamic indexing)."""
            return jnp.max(jnp.where(lane_sc == ci, values, fill))

        def cond(state):
            ci, btl, _, _ = state
            per_ray = jnp.minimum(jnp.min(btl, axis=1, keepdims=True), bt_prev)
            if any_hit:
                # Shadow query: a ray is done at its FIRST in-range hit;
                # sweep until every active ray found one (or chunks ran out).
                unfound = per_ray >= tmax
                ub = jnp.max(jnp.where(act & unfound, tmax, -1.0))
            else:
                per_ray = jnp.minimum(per_ray, tmax)
                ub = jnp.max(jnp.where(act, per_ray, 0.0))
            te_ci = pick_scalar(te_row, ci, neg_inf)
            return (ci < SCp) & has_act & (te_ci <= ub) & jnp.isfinite(te_ci)

        def body(state):
            ci, btl, bnl, btrl = state
            cand = pick_scalar(cand_row, ci, jnp.int32(0))

            # Per-ray chunk-AABB slab pre-test (~128x cheaper than the
            # candidate math): the prologue's beam test is conservative over
            # the whole block and knows nothing about the current best-t;
            # here each ray tests the exact chunk AABB against its live
            # [t_min, min(best, t_max)) interval, and the whole chunk is
            # skipped when no lane needs it — the per-ray analogue of the
            # kd-tree's t-range clipping descent (kdtree/node.rs:90-110).
            cid = jax.lax.shift_right_logical(cand, 3)
            csel = lane_sc == cid
            arow = lambda r: jnp.sum(jnp.where(csel, aabb_ref[r:r + 1, :], 0.0))
            ten = jnp.full((B, 1), -INF, dtype)
            tex = jnp.full((B, 1), INF, dtype)
            for ax, (o_c, d_c) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
                tiny = jnp.where(d_c < 0.0, -1e-30, 1e-30)
                rcp = 1.0 / jnp.where(jnp.abs(d_c) < 1e-30, tiny, d_c)
                t1 = (arow(ax) - o_c) * rcp
                t2 = (arow(ax + 4) - o_c) * rcp
                ten = jnp.maximum(ten, jnp.minimum(t1, t2))
                tex = jnp.minimum(tex, jnp.maximum(t1, t2))
            per_best = jnp.minimum(jnp.min(btl, axis=1, keepdims=True), bt_prev)
            if any_hit:
                needs = act & (per_best >= tmax)           # still unfound
                ub = tmax
            else:
                needs = act
                ub = jnp.minimum(per_best, tmax)
            needs = needs & (jnp.maximum(ten, tmin) <= jnp.minimum(tex, ub))

            def run(args):
                btl, bnl, btrl = args
                t, node, tri = chunk_hits(cand)
                better = t < btl
                return (
                    jnp.where(better, t, btl),
                    jnp.where(better, node, bnl),
                    jnp.where(better, tri, btrl),
                )

            btl, bnl, btrl = jax.lax.cond(
                jnp.any(needs), run, lambda a: a, (btl, bnl, btrl)
            )
            return ci + 1, btl, bnl, btrl

        _, btl, bnl, btrl = jax.lax.while_loop(
            cond, body,
            (
                jnp.int32(0),
                jnp.full((B, C), INF, dtype),
                jnp.full((B, C), -1, jnp.int32),
                jnp.full((B, C), -1, jnp.int32),
            ),
        )

        # Lane reduction: nearest t; tie -> lowest lane (Morton order).
        btmin = jnp.min(btl, axis=1, keepdims=True)          # [B,1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
        pick = jnp.min(jnp.where(btl <= btmin, lanes, C), axis=1, keepdims=True)
        sel = lanes == pick
        bn_red = jnp.sum(jnp.where(sel, bnl, 0), axis=1, keepdims=True)
        btr_red = jnp.sum(jnp.where(sel, btrl, 0), axis=1, keepdims=True)

        prev_t = bt_ref[0]                                   # [B,1]
        better = btmin < prev_t
        bt_ref[0] = jnp.where(better, btmin, prev_t)
        bn_ref[0] = jnp.where(better, bn_red, bn_ref[0])
        btr_ref[0] = jnp.where(better, btr_red, btr_ref[0])

    return kernel


# ---------------------------------------------------------------------------
# Wrapper: XLA cull prologue + pallas_call
# ---------------------------------------------------------------------------

def intersect_scene_pallas(
    o, d, t_min, t_max, st: SceneTables, cfg: RenderConfig,
    active=None, src_node=None, src_tri=None, any_hit=False,
) -> Hit:
    """Nearest hit via the Pallas sweep; same contract as intersect_scene.

    any_hit=True answers occlusion queries (shadow rays,
    material.rs:174-179): each ray stops at its first in-range hit, so the
    reported t/node are *some* hit, not the nearest — only `.hit` is
    meaningful."""
    pk = st.packed
    B = cfg.pallas_block
    assert B % 8 == 0
    dtype = o.dtype
    R0 = o.shape[0]
    NB = -(-R0 // B)
    R = NB * B

    t_min = jnp.broadcast_to(jnp.asarray(t_min, dtype), (R0,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, dtype), (R0,))
    if active is None:
        active = jnp.ones((R0,), bool)
    if src_node is None:
        src_node = jnp.full((R0,), -1, jnp.int32)
    if src_tri is None:
        src_tri = jnp.full((R0,), -1, jnp.int32)

    ob = _pad_to(o, R, 0.0).reshape(NB, B, 3)
    db = _pad_to(d, R, 1.0).reshape(NB, B, 3)
    actb = _pad_to(active, R, False).reshape(NB, B)
    tminb = _pad_to(t_min, R, 1.0).reshape(NB, B)
    tmaxb = _pad_to(t_max, R, 0.0).reshape(NB, B)
    srcb = _pad_to(src_node, R, -1).reshape(NB, B)
    srctb = _pad_to(src_tri, R, -1).reshape(NB, B)

    # Block interval bounds over active lanes (beam.py semantics).
    BIG = jnp.asarray(3e38, dtype)
    omin = jnp.where(actb[..., None], ob, BIG).min(axis=1)
    omax = jnp.where(actb[..., None], ob, -BIG).max(axis=1)
    dmin = jnp.where(actb[..., None], db, BIG).min(axis=1)
    dmax = jnp.where(actb[..., None], db, -BIG).max(axis=1)
    any_active = actb.any(axis=1)
    omin = jnp.where(any_active[:, None], omin, BIG)
    omax = jnp.where(any_active[:, None], omax, -BIG)
    dmin = jnp.where(any_active[:, None], dmin, 0.0)
    dmax = jnp.where(any_active[:, None], dmax, 0.0)

    t_enter = _warp_entry_t(
        omin, omax, dmin, dmax, pk.chunk_min, pk.chunk_max
    )  # [NB, Nc]

    Nc = pk.n_chunks
    SC = min(Nc, cfg.pallas_slab_chunks)
    Ncp = -(-Nc // SC) * SC
    Nslab = Ncp // SC
    pf, pid, kind_pad = pk.f32, pk.ids, pk.chunk_kind
    if Ncp > Nc:
        extra = Ncp - Nc
        t_enter = jnp.pad(t_enter, ((0, 0), (0, extra)), constant_values=INF)
        kind_pad = jnp.pad(kind_pad, (0, extra))
        pf = jnp.pad(pf, ((0, 0), (0, extra * C)))
        pid = jnp.pad(pid, ((0, 0), (0, extra * C)), constant_values=-1)

    # Per-chunk AABB table for the kernel's per-ray slab pre-test, inflated
    # by a small absolute+relative epsilon so float asymmetry between the
    # cull and the candidate math can never reject a true hit.  Rows:
    # 0..2 = min xyz, 4..6 = max xyz (3, 7 pad for sublane alignment);
    # padding chunks get an empty box (min > max).
    cmin = pk.chunk_min - (1e-5 + 1e-5 * jnp.abs(pk.chunk_min))
    cmax = pk.chunk_max + (1e-5 + 1e-5 * jnp.abs(pk.chunk_max))
    if Ncp > Nc:
        extra = Ncp - Nc
        cmin = jnp.pad(cmin, ((0, extra), (0, 0)), constant_values=1.0)
        cmax = jnp.pad(cmax, ((0, extra), (0, 0)), constant_values=0.0)
    zero_row = jnp.zeros((Ncp,), dtype)
    aabb = jnp.stack(
        [cmin[:, 0], cmin[:, 1], cmin[:, 2], zero_row,
         cmax[:, 0], cmax[:, 1], cmax[:, 2], zero_row],
        axis=0,
    )                                                   # [8, Ncp]

    te = t_enter.reshape(NB, Nslab, SC)
    order = jnp.argsort(te, axis=2).astype(jnp.int32)
    te_s = jnp.take_along_axis(te, order, axis=2)
    kinds_slab = jnp.broadcast_to(
        kind_pad.reshape(Nslab, SC)[None], (NB, Nslab, SC)
    )
    kind_sorted = jnp.take_along_axis(kinds_slab, order, axis=2)
    cand = order * 8 + kind_sorted

    SCp = SC
    # One packed (entry-t, candidate-id) array and one packed ray array per
    # block: a handful of DMAs per grid step instead of 15 (small-DMA issue
    # latency dominated all-dead rounds).
    candte = jnp.stack(
        [te_s.reshape(NB * Nslab, SCp),
         cand.reshape(NB * Nslab, SCp).astype(dtype)],
        axis=1,
    )                                                   # [NBs, 2, SCp]
    rays_packed = jnp.stack(
        [
            ob[..., 0], ob[..., 1], ob[..., 2],
            db[..., 0], db[..., 1], db[..., 2],
            tminb, tmaxb,
            srcb.astype(dtype), srctb.astype(dtype),
            actb.astype(dtype),
        ],
        axis=-1,
    )                                                   # [NB, B, 11]

    kernel = _make_kernel(B, SCp, cfg.epsilon, cfg.self_eps_local, dtype,
                          any_hit=any_hit)

    rays_spec = pl.BlockSpec((1, B, 11), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    candte_spec = pl.BlockSpec((1, 2, SCp),
                               lambda b, s: (b * Nslab + s, 0, 0),
                               memory_space=pltpu.VMEM)
    pf_spec = pl.BlockSpec((21, SC * C), lambda b, s: (0, s),
                           memory_space=pltpu.VMEM)
    pid_spec = pl.BlockSpec((2, SC * C), lambda b, s: (0, s),
                            memory_space=pltpu.VMEM)
    aabb_spec = pl.BlockSpec((8, SC), lambda b, s: (0, s),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, B, 1), lambda b, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    interpret = (
        cfg.pallas_interpret
        if cfg.pallas_interpret is not None
        else jax.default_backend() != "tpu"
    )

    bt, bn, btr = pl.pallas_call(
        kernel,
        grid=(NB, Nslab),
        in_specs=[candte_spec, rays_spec, pf_spec, pid_spec, aabb_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((NB, B, 1), dtype),
            jax.ShapeDtypeStruct((NB, B, 1), jnp.int32),
            jax.ShapeDtypeStruct((NB, B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(candte, rays_packed, pf, pid, aabb)

    bt = bt.reshape(R)[:R0]
    bn = bn.reshape(R)[:R0]
    btr = btr.reshape(R)[:R0]
    hit = jnp.isfinite(bt) & active
    return Hit(t=bt, node=jnp.where(hit, bn, -1),
               tri=jnp.where(hit, btr, -1), hit=hit)
