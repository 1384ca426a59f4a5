"""Bilateral denoiser (``assets/kernels/Denoise.cl:6-47``): brute-force
spatial+range Gaussian over the displayed image.

The (2r+1)^2 neighborhood loop is a static Python loop over shifted images —
XLA fuses it into a dense stencil; no gathers."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DenoiseConfig


def bilateral(image: jax.Array, cfg: DenoiseConfig) -> jax.Array:
    r = cfg.radius
    inv_2ss = 1.0 / (2.0 * cfg.sigma_spatial ** 2)
    inv_2sr = 1.0 / (2.0 * cfg.sigma_range ** 2)
    acc = jnp.zeros_like(image)
    wsum = jnp.zeros(image.shape[:-1], image.dtype)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jnp.roll(image, (dy, dx), axis=(0, 1))
            d2 = jnp.sum((shifted - image) ** 2, axis=-1)
            w = jnp.exp(-(dx * dx + dy * dy) * inv_2ss - d2 * inv_2sr)
            acc = acc + shifted * w[..., None]
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-8)[..., None]
