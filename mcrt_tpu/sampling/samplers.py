"""Sampling primitives + MIS heuristics.

Vectorized analogues of ``assets/kernels/samplers.cl:127-246``: uniform
hemisphere/sphere/disk/concentric-disk/cone/triangle, cosine hemisphere, and
the balance/power MIS heuristics.  All functions map (..., 2) uniforms to
directions/points; shading space is y-up like the reference's
(``bxdfs.cl:22-59``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m

INV_PI = 1.0 / jnp.pi
INV_2PI = 0.5 / jnp.pi


def uniform_hemisphere(u: jax.Array):
    """y-up unit hemisphere; pdf = 1/(2π)."""
    cos_t = u[..., 0]
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u[..., 1]
    return m.spherical_direction(sin_t, cos_t, phi)


def uniform_hemisphere_pdf():
    return INV_2PI


def uniform_sphere(u: jax.Array):
    cos_t = 1.0 - 2.0 * u[..., 0]
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u[..., 1]
    return m.spherical_direction(sin_t, cos_t, phi)


def uniform_sphere_pdf():
    return 1.0 / (4.0 * jnp.pi)


def concentric_disk(u: jax.Array):
    """Shirley-Chiu concentric disk map, branch-free."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (jnp.pi / 4.0) * m.safe_div(oy, ox),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * m.safe_div(ox, oy),
    )
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def cosine_hemisphere(u: jax.Array):
    """y-up cosine-weighted hemisphere via concentric disk; pdf = cosθ/π."""
    d = concentric_disk(u)
    y = m.safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.stack([d[..., 0], y, d[..., 1]], axis=-1)


def cosine_hemisphere_pdf(cos_theta: jax.Array):
    return jnp.abs(cos_theta) * INV_PI


def uniform_cone(u: jax.Array, cos_theta_max: jax.Array):
    cos_t = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u[..., 1]
    return m.spherical_direction(sin_t, cos_t, phi)


def uniform_cone_pdf(cos_theta_max: jax.Array):
    return m.safe_div(jnp.ones_like(cos_theta_max), 2.0 * jnp.pi * (1.0 - cos_theta_max))


def uniform_triangle(u: jax.Array):
    """Barycentric (b0, b1) uniform over a triangle (sqrt warp)."""
    su0 = m.safe_sqrt(u[..., 0])
    b0 = 1.0 - su0
    b1 = u[..., 1] * su0
    return jnp.stack([b0, b1], axis=-1)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    """``samplers.cl:233-239``."""
    return m.safe_div(nf * f_pdf, nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """``samplers.cl:241-246`` (β=2)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return m.safe_div(f * f, f * f + g * g)
