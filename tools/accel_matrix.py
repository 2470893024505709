#!/usr/bin/env python
"""Accel-backend feature matrix gate — the TPU analogue of the reference's
Travis loop that builds/runs every example under each feature config
(.travis.yml:7-21: default / flat_scene / kdtree / render_bounding_volumes).

Renders every example scene downscaled at SAMPLES=2 under each accel
backend in {flat, beam, pallas} and diffs the outputs per scene: the
backends are selection-equivalent by design (ops/intersect.py), so any
divergence beyond sampling-free tolerance is a regression in a
non-default backend.  Exits non-zero on failure.

Usage:
    python tools/accel_matrix.py [--scale 0.25] [--samples 2]
        [--only name1,name2] [--accels flat,beam,pallas] [--tol 2e-3]

Runs on the session's default backend; on CPU the pallas kernel runs in
interpret mode (same semantics as Mosaic — the tpu-marked unit tests
cover the Mosaic lowering).  Budget: ~12 min at --scale 0.25 on CPU.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--only", default=None)
    ap.add_argument("--accels", default="flat,beam,pallas")
    ap.add_argument("--tol", type=float, default=2e-3,
                    help="max allowed mean |u8 diff|/255 between backends")
    ap.add_argument("--frac-tol", type=float, default=2e-3,
                    help="max allowed fraction of pixels differing > 10/255")
    args = ap.parse_args()

    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        jax.config.update("jax_platforms", "cpu")

    import scenes
    from portrayer_tpu import render_linear, finalize, RenderConfig

    accels = args.accels.split(",")
    names = args.only.split(",") if args.only else scenes.names()
    failures = []
    for name in names:
        spec = scenes.load(name)
        w = max(32, int(spec.size[0] * args.scale))
        h = max(32, int(spec.size[1] * args.scale))
        imgs = {}
        row = [f"{name:34s} {w}x{h}"]
        for accel in accels:
            cfg = RenderConfig(
                samples=args.samples, tile=(64, 64), accel=accel,
                # interpret mode off-TPU so "pallas" exercises the kernel
                # path rather than falling through to beam
                pallas_interpret=(
                    None if jax.default_backend() == "tpu" else True),
                seed=0,
            )
            t0 = time.time()
            img = finalize(render_linear(
                spec.scene, spec.camera, (w, h), spec.background, cfg))
            imgs[accel] = img
            row.append(f"{accel}:{time.time()-t0:6.1f}s")
        # Queue-overflow gate (trace.TraceStats.dropped_w): stale per-scene
        # queue_caps hints must fail loudly, not silently tint renders.
        # One full-frame strided check per scene on the base accel config.
        from portrayer_tpu.debug import queue_overflow_fraction
        cfg0 = RenderConfig(
            samples=1, tile=(64, 64), accel=accels[0], seed=0,
            queue_caps=spec.queue_caps,
            pallas_interpret=(
                None if jax.default_backend() == "tpu" else True))
        dw = queue_overflow_fraction(
            spec.scene, spec.camera, (w, h), spec.background, cfg0,
            max_rays=16384)
        row.append(f"dropped_w={dw:.2e}")
        if dw > 1e-3:
            failures.append((name, "queue-overflow", "dropped_w", dw, 0.0))

        base = accels[0]
        for accel in accels[1:]:
            diff = np.abs(imgs[accel] - imgs[base])
            mean = float(diff.mean())
            frac = float((diff > 10.0 / 255.0).any(axis=-1).mean())
            ok = mean <= args.tol and frac <= args.frac_tol
            row.append(f"{base}vs{accel}: mean={mean:.5f} frac={frac:.5f} "
                       f"{'ok' if ok else 'FAIL'}")
            if not ok:
                failures.append((name, base, accel, mean, frac))
        print("  ".join(row), flush=True)

    if failures:
        print(f"\n{len(failures)} backend divergence(s):")
        for f in failures:
            print("  ", f)
        sys.exit(1)
    print("\nall backends agree on all scenes")


if __name__ == "__main__":
    main()
