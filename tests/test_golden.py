"""Golden-image comparisons against the reference's committed renders
(/root/reference/render/*.png).  Renders a small slice region at full
image resolution (identical camera mapping) and compares with tolerance
covering sampling noise (the goldens used thread_rng jitter @ ~100spp)."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

import scenes
from portrayer_tpu import render_linear, finalize, RenderConfig

GOLDEN_DIR = "/root/reference/render"


def golden_slice(name, region, samples=16, mean_tol=0.035, p95_tol=0.10):
    spec = scenes.load(name)
    assert spec.golden, f"no golden for {name}"
    gpath = os.path.join(GOLDEN_DIR, spec.golden)
    gold = np.asarray(PILImage.open(gpath).convert("RGB"), dtype=np.float64) / 255.0
    (x1, y1), (x2, y2) = region

    cfg = RenderConfig(samples=samples, tile=(64, 64), node_chunk=128)
    img = render_linear(
        spec.scene, spec.camera, spec.size, spec.background, cfg,
        region=region,
    )
    ours = finalize(img)[y1:y2 + 1, x1:x2 + 1]
    theirs = gold[y1:y2 + 1, x1:x2 + 1]
    diff = np.abs(ours - theirs)
    mean = diff.mean()
    p95 = np.quantile(diff, 0.95)
    assert mean < mean_tol and p95 < p95_tol, (
        f"{name} slice {region}: mean={mean:.4f} p95={p95:.4f}"
    )


@pytest.mark.golden
def test_primitives_simple_center():
    # cylinder + cone + grass floor region
    golden_slice("primitives-simple", ((390, 220), (517, 347)))


@pytest.mark.golden
def test_primitives_simple_sky():
    # background gradient must be near-exact
    golden_slice("primitives-simple", ((20, 10), (83, 41)), samples=4,
                 mean_tol=0.01, p95_tol=0.02)


@pytest.mark.golden
def test_antialiasing_monkey():
    """Flat-shaded monkey (mesh path) vs the golden.

    03_antialiasing.png is a 1200x1000 montage: left column = the 1- and
    32-sample full renders upscaled 2x; right column = zoomed crops.  We
    compare against the bottom-left quadrant (32 spp) downsampled 2x."""
    spec = scenes.load("antialiasing")
    gold = np.asarray(
        PILImage.open(os.path.join(GOLDEN_DIR, spec.golden)).convert("RGB"),
        dtype=np.float64,
    ) / 255.0
    gold = gold[500:, :600][::2, ::2]

    cfg = RenderConfig(samples=16, tile=(64, 64), node_chunk=128)
    img = render_linear(spec.scene, spec.camera, spec.size, spec.background, cfg)
    ours = finalize(img)
    diff = np.abs(ours - gold)
    assert diff.mean() < 0.02 and np.quantile(diff, 0.95) < 0.06, (
        f"mean={diff.mean():.4f} p95={np.quantile(diff, 0.95):.4f}"
    )
