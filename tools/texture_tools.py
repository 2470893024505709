"""Texture-preparation helpers — Python equivalents of the reference's
imagemagick scripts (make-cube-map.sh, make-sphere-tex.sh,
sample_image_antialiasing.sh at the reference repo root).

CLI:
  python tools/texture_tools.py cube-map tex.png     -> tex_cubemap.png
  python tools/texture_tools.py sphere-tex tex.png   -> tex_2.png
  python tools/texture_tools.py antialias-sample a_1.png a_32.png out.png
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image


def make_cube_map(path: str, out: str | None = None) -> str:
    """Tile a square texture 4x3 into the cube-map atlas layout that
    Cube's UV mapping expects (make-cube-map.sh: montage -tile 4x3)."""
    img = np.asarray(Image.open(path).convert("RGB"))
    atlas = np.tile(img, (3, 4, 1))
    out = out or os.path.splitext(path)[0] + "_cubemap.png"
    Image.fromarray(atlas).save(out)
    return out


def make_sphere_tex(path: str, out: str | None = None) -> str:
    """Double a square texture horizontally for the sphere's 2:1 UV
    mapping (make-sphere-tex.sh: montage -tile 2x)."""
    img = np.asarray(Image.open(path).convert("RGB"))
    tex = np.tile(img, (1, 2, 1))
    out = out or os.path.splitext(path)[0] + "_2.png"
    Image.fromarray(tex).save(out)
    return out


def antialias_sample(path_1spp: str, path_nspp: str, out: str) -> str:
    """Side-by-side antialiasing comparison with zoomed crops
    (sample_image_antialiasing.sh)."""
    panels = []
    for p in (path_1spp, path_nspp):
        img = Image.open(p).convert("RGB")
        big = img.resize((img.width * 2, img.height * 2), Image.NEAREST)
        crop = big.crop((0, 0, min(300, big.width), min(250, big.height)))
        crop2 = crop.resize((crop.width * 2, crop.height * 2), Image.NEAREST)
        panels.append((big, crop2))
    w = max(p[0].width + p[1].width for p in panels)
    h = sum(max(p[0].height, p[1].height) for p in panels)
    canvas = Image.new("RGB", (w, h), (0, 0, 0))
    y = 0
    for big, crop2 in panels:
        canvas.paste(big, (0, y))
        canvas.paste(crop2, (big.width, y))
        y += max(big.height, crop2.height)
    canvas.save(out)
    return out


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    cmd = argv[1]
    if cmd == "cube-map":
        print("Writing", make_cube_map(argv[2]))
    elif cmd == "sphere-tex":
        print("Writing", make_sphere_tex(argv[2]))
    elif cmd == "antialias-sample":
        print("Writing", antialias_sample(argv[2], argv[3], argv[4]))
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
