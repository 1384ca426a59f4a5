"""Pixel reconstruction filters (``assets/kernels/filters.cl:12-69``):
box, triangle, Gaussian, Mitchell-Netravali, Lanczos-windowed sinc.

Each evaluates the 2D separable (or radial, for box) filter at an offset from
the pixel center, in pixel units.  Used by filter-importance-weighted
progressive accumulation (``reconstruction.cl:6-60``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import FilterConfig, FilterType


def _gaussian_1d(x, alpha, radius):
    g = jnp.exp(-alpha * x * x) - jnp.exp(-alpha * radius * radius)
    return jnp.maximum(g, 0.0)


def _mitchell_1d(x, b, c):
    x = jnp.abs(2.0 * x)
    x2 = x * x
    x3 = x2 * x
    inner = (
        (12.0 - 9.0 * b - 6.0 * c) * x3
        + (-18.0 + 12.0 * b + 6.0 * c) * x2
        + (6.0 - 2.0 * b)
    ) * (1.0 / 6.0)
    outer = (
        (-b - 6.0 * c) * x3
        + (6.0 * b + 30.0 * c) * x2
        + (-12.0 * b - 48.0 * c) * x
        + (8.0 * b + 24.0 * c)
    ) * (1.0 / 6.0)
    return jnp.where(x > 1.0, jnp.where(x > 2.0, 0.0, outer), inner)


def _sinc(x):
    x = jnp.abs(x)
    px = jnp.pi * x
    return jnp.where(x < 1e-5, 1.0, jnp.sin(px) / px)


def _lanczos_1d(x, tau, radius):
    x = jnp.abs(x)
    return jnp.where(x > radius, 0.0, _sinc(x) * _sinc(x / tau))


def eval_filter(cfg: FilterConfig, offset: jax.Array) -> jax.Array:
    """Filter weight at `offset` (..., 2) pixels from the pixel center."""
    x = offset[..., 0]
    y = offset[..., 1]
    r = cfg.radius
    if cfg.type == FilterType.BOX:
        inside = (jnp.abs(x) <= r) & (jnp.abs(y) <= r)
        return jnp.where(inside, 1.0, 0.0)
    if cfg.type == FilterType.TRIANGLE:
        return jnp.maximum(r - jnp.abs(x), 0.0) * jnp.maximum(r - jnp.abs(y), 0.0)
    if cfg.type == FilterType.GAUSSIAN:
        return _gaussian_1d(x, cfg.gaussian_alpha, r) * _gaussian_1d(y, cfg.gaussian_alpha, r)
    if cfg.type == FilterType.MITCHELL:
        return _mitchell_1d(x / r, cfg.mitchell_b, cfg.mitchell_c) * _mitchell_1d(
            y / r, cfg.mitchell_b, cfg.mitchell_c
        )
    if cfg.type == FilterType.LANCZOS:
        return _lanczos_1d(x, cfg.lanczos_tau, r) * _lanczos_1d(y, cfg.lanczos_tau, r)
    raise ValueError(f"unknown filter {cfg.type}")
