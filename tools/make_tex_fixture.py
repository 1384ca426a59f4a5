"""Generate the committed textured-OBJ test fixture (tests/assets/):
a small room with a checkerboard map_Kd + dent normal map_bump — the
file-driven texture import path (RTScene.cpp:680-766 analogue).
Deterministic: re-running reproduces identical bytes."""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")

OBJ = """mtllib texbox.mtl
v -1 0 -1
v  1 0 -1
v  1 0  1
v -1 0  1
v -1 0 -1
v  1 0 -1
v  1 2 -1
v -1 2 -1
v -0.3 1.99 -0.3
v  0.3 1.99 -0.3
v  0.3 1.99  0.3
v -0.3 1.99  0.3
vt 0 0
vt 2 0
vt 2 2
vt 0 2
vn 0 1 0
vn 0 0 1
vn 0 -1 0
usemtl floortex
f 1/1/1 2/2/1 3/3/1
f 1/1/1 3/3/1 4/4/1
usemtl wall
f 5/1/2 7/3/2 6/2/2
f 5/1/2 8/4/2 7/3/2
usemtl lamp
f 9/1/3 11/3/3 10/2/3
f 9/1/3 12/4/3 11/3/3
"""

MTL = """newmtl floortex
Kd 1.0 1.0 1.0
Ks 0.0 0.0 0.0
map_Kd texdiff.png
map_bump texnorm.png

newmtl wall
Kd 0.5 0.6 0.7

newmtl lamp
Kd 0.0 0.0 0.0
Ke 12.0 11.0 10.0
"""


def checker(n=64, tiles=8):
    y, x = np.mgrid[0:n, 0:n]
    c = (((x * tiles // n) + (y * tiles // n)) % 2).astype(np.float32)
    rgb = np.stack([0.2 + 0.7 * c, 0.25 + 0.45 * c, 0.6 - 0.35 * c], -1)
    return (rgb * 255 + 0.5).astype(np.uint8)


def normal_map(n=64):
    """Tangent-space dents: nx,ny from a sine height field."""
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) / n
    hx = np.cos(2 * np.pi * 4 * x) * 0.35
    hy = np.cos(2 * np.pi * 4 * y) * 0.35
    nz = 1.0 / np.sqrt(1.0 + hx * hx + hy * hy)
    nx, ny = -hx * nz, -hy * nz
    rgb = np.stack([nx, ny, nz], -1) * 0.5 + 0.5
    return (rgb * 255 + 0.5).astype(np.uint8)


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "texbox.obj"), "w") as f:
        f.write(OBJ)
    with open(os.path.join(OUT, "texbox.mtl"), "w") as f:
        f.write(MTL)
    Image.fromarray(checker()).save(os.path.join(OUT, "texdiff.png"))
    Image.fromarray(normal_map()).save(os.path.join(OUT, "texnorm.png"))
    print("wrote fixture to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
