"""Scene configurations mirroring the reference's examples/ programs.

Each module exposes ``build() -> SceneSpec``.  The registry maps example
names (matching /root/reference/examples/*.rs) to builders.
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Callable, Optional, Tuple


@dataclasses.dataclass
class SceneSpec:
    scene: object
    camera: object
    size: Tuple[int, int]          # (width, height)
    background: Callable
    name: str
    golden: Optional[str] = None   # reference render PNG (in /root/reference/render)
    # Measured per-round bounce-queue capacity hint (multiples of the
    # primary ray count; see RenderConfig.queue_caps).  None = auto.
    queue_caps: Optional[Tuple[float, ...]] = None


_REGISTRY = {
    "simple": ("scenes.simple", None),
    "primitives-simple": ("scenes.primitives_simple", "01a_primitives-simple.png"),
    "primitives": ("scenes.primitives", "01b_primitives.png"),
    "smooth-shading": ("scenes.smooth_shading", "02_smooth-shading.png"),
    "antialiasing": ("scenes.antialiasing", "03_antialiasing.png"),
    "normal-mapping": ("scenes.normal_mapping", "04a_normal-mapping.png"),
    "texture-mapping": ("scenes.texture_mapping", "05a_texture-mapping.png"),
    "cube-mapping": ("scenes.cube_mapping", "05b_cube-mapping.png"),
    "water-glass": ("scenes.water_glass", "06a_water-glass.png"),
    "transmission-refraction": ("scenes.transmission_refraction", "06b_transmission-refraction.png"),
    "glossy-reflection": ("scenes.glossy_reflection", "07_glossy-reflection.png"),
    "soft-shadows": ("scenes.soft_shadows", "08_soft-shadows.png"),
    "entering-the-mirror-dimension": ("scenes.mirror_dimension", "entering-the-mirror-dimension.png"),
    # NB: 09a_kdtree.png is NOT registered as big-scene's golden — the
    # object layout comes from Rust's seeded StdRng stream, which a Python
    # port cannot reproduce, so pixels are incomparable.
    "big-scene": ("scenes.big_scene", None),
    "instance": ("scenes.instance", None),
    "hier": ("scenes.hier", None),
    "nonhier": ("scenes.nonhier", None),
    "nonhier2": ("scenes.nonhier2", None),
    "single-triangle": ("scenes.single_triangle", None),
    "four-shapes": ("scenes.four_shapes", None),
    "simple-cows": ("scenes.simple_cows", None),
    "macho-cows": ("scenes.macho_cows", None),
    "monkeys-making-monkeys": ("scenes.monkeys_making_monkeys", None),
    "fish": ("scenes.fish", None),
    "graphics-poster": ("scenes.graphics_poster", None),
    "graphics-temple": ("scenes.graphics_temple", None),
    "graphics-castle": ("scenes.graphics_castle", None),
    # The checked-in example code builds the *green*-bodied variant
    # (examples/robot-alarm-clock.rs:101 has the green diffuse active).
    "robot-alarm-clock": ("scenes.robot_alarm_clock", "10_robot-alarm-clock_green.png"),
    # Extras beyond the reference's examples:
    # the torus exists in the reference only as unregistered dead code.
    "torus-showcase": ("scenes.torus_showcase", None),
}


def names():
    return list(_REGISTRY)


def load(name: str) -> SceneSpec:
    mod_name, golden = _REGISTRY[name]
    mod = importlib.import_module(mod_name)
    spec = mod.build()
    spec.golden = golden
    return spec
