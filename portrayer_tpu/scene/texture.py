"""Textures and normal maps (host-side description + device sampling data).

Mirrors src/texture.rs:
  * ``Texture`` is either a procedural function (FnTex) or an image.
  * Image sampling is nearest-neighbour with euclidean-remainder wraparound
    tiling: x = trunc(u * (w-1)) rem_euclid w   (src/texture.rs:104-141).
  * ImageTexture converts sRGB -> linear with c^2.2 per sample
    (src/texture.rs:162-168) — texels stay uint8 on device (12x less HBM
    and host->device transfer than prebaked f32 on texture-heavy scenes
    like graphics-castle) and the decode happens at sample time through a
    256-entry LUT, which is bit-identical to prebaking (the LUT holds
    exactly (i/255)^2.2 for every possible texel value).
  * NormalMap decodes RGB -> LH tangent-space vector and converts to RH via a
    fixed matrix (nx, ny, nz) -> (nx, -nz, -ny)  (src/texture.rs:192-221).

Procedural textures are Python callables ``fn(uv[...,2]) -> rgb[...,3]``
written in jnp — they are traced into the shading kernel directly.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np



def _load_image_rgb(path) -> np.ndarray:
    from PIL import Image as PILImage

    img = PILImage.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)  # [H, W, 3] sRGB-encoded


def _as_u8(data: np.ndarray) -> np.ndarray:
    data = np.asarray(data)
    if data.dtype == np.uint8:
        return data
    return np.clip(np.round(data * 255.0), 0, 255).astype(np.uint8)


class ImageTexture:
    """A texture sampled from an image; texels stored as sRGB uint8 and
    linearized (c^2.2) at sample time via the shared decode LUT."""

    def __init__(self, path=None, *, data: Optional[np.ndarray] = None):
        if data is None:
            data = _load_image_rgb(path)
        self.raw = _as_u8(data)  # [H, W, 3] sRGB-encoded uint8
        self.path = path

    @property
    def shape(self):
        return self.raw.shape

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class NormalMap:
    """Normal map: uint8 texel values, decoded to vectors at shade time."""

    def __init__(self, path=None, *, data: Optional[np.ndarray] = None):
        if data is None:
            data = _load_image_rgb(path)
        self.raw = _as_u8(data)
        self.path = path

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class Texture:
    """FnTex | Image sum type (src/texture.rs:22-27)."""

    def __init__(self, source):
        if isinstance(source, Texture):
            source = source.source
        self.source = source

    @property
    def is_image(self) -> bool:
        return isinstance(self.source, ImageTexture)

    @property
    def fn(self) -> Callable:
        assert not self.is_image
        return self.source

    @property
    def image(self) -> ImageTexture:
        assert self.is_image
        return self.source

    @classmethod
    def open(cls, path) -> "Texture":
        return cls(ImageTexture(path))

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
