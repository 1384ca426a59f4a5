"""Image IO: PNG output (the reference's SOIL screenshot path,
``Engine.cpp:180-204``) and simple comparison metrics for tests/golden
checks."""
from __future__ import annotations

import numpy as np


def to_srgb_u8(img: np.ndarray, flip_vertical: bool = True) -> np.ndarray:
    """Linear HDR (H, W, 3) -> display u8 with gamma 2.2. Rows are stored
    bottom-up (film v=0 at the bottom), so PNGs flip by default."""
    x = np.asarray(img, np.float32)
    if flip_vertical:
        x = x[::-1]
    x = np.clip(x, 0.0, 1.0) ** (1.0 / 2.2)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, flip_vertical: bool = True):
    from PIL import Image

    Image.fromarray(to_srgb_u8(img, flip_vertical)).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) / 255.0


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def relative_mse(a: np.ndarray, ref: np.ndarray, eps: float = 1e-2) -> float:
    """MSE normalized by reference brightness (standard renderer metric)."""
    a = np.asarray(a)
    ref = np.asarray(ref)
    return float(np.mean((a - ref) ** 2 / (ref * ref + eps)))
