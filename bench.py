"""Benchmark: big-scene primary-ray throughput on one chip.

Mirrors the reference's published kd-tree benchmark workload
(examples/big-scene.rs: 1980x1020, SAMPLES=1, 1000 random primitives;
render/09_kdtree_timing_data.txt) and reports primary-ray throughput.

Baseline: the reference renders this in ~4.7 s with its kd-tree
(~0.43 Mrays/s primary, BASELINE.md) on a ~56-thread CPU host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# One real render pass is enough for timing; keep bench runtime bounded.
os.environ.setdefault("SAMPLES", "1")

BASELINE_MRAYS = 0.43  # reference big-scene primary throughput (BASELINE.md)


def main():
    import jax
    import scenes
    from portrayer_tpu import render_u8, RenderConfig
    from portrayer_tpu.scene.flatten import flatten_scene

    spec = scenes.load("big-scene")
    w, h = spec.size
    cfg = RenderConfig(samples=1, tile=(256, 256))
    st = flatten_scene(spec.scene, dtype=cfg.dtype)

    # Warm-up (compile) with the full tile grid, then a timed render.
    render_u8(st, spec.camera, (w, h), spec.background, cfg)

    t0 = time.time()
    img = render_u8(st, spec.camera, (w, h), spec.background, cfg)
    dt = time.time() - t0

    rays = w * h * 1
    mrays = rays / dt / 1e6
    out = {
        "metric": "big_scene_primary_rays",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
    }
    print(json.dumps(out))
    return img


if __name__ == "__main__":
    main()
