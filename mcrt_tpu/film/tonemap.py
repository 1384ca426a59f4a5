"""Extended Reinhard tone mapping (``assets/kernels/ToneMapping.cl:32-63``)
plus the (defined-but-unused in the reference) log-average luminance pass
(:6-30), provided here as an auto-key option."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ToneMapConfig
from ..core.math import luminance


def reinhard(image: jax.Array, cfg: ToneMapConfig) -> jax.Array:
    """Extended Reinhard with white point Lwhite; per-pixel, preserves hue."""
    lum = jnp.maximum(luminance(image), 1e-8)
    lw2 = cfg.l_white * cfg.l_white
    ld = lum * (1.0 + lum / lw2) / (1.0 + lum)
    return image * (ld / lum)[..., None]


def log_average_luminance(image: jax.Array, delta: float = 1e-4) -> jax.Array:
    """Two-pass log-average luminance (``ToneMapping.cl:6-30``)."""
    return jnp.exp(jnp.mean(jnp.log(delta + luminance(image))))
