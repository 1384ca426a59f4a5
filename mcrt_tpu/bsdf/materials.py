"""Material dispatch: per-hit uber-material property fetch + normal mapping.

Analogue of ``assets/kernels/materials.cl``: ``getUberMaterialProperties``
(:67-91) gathers constants and modulates them by up to 8 optional texture
lookups; normal mapping perturbs the shading frame (:14-30).  The reference's
single material type is ``RT_UBER_MATERIAL`` (:118-156) — same here: one
dispatch-free SoA gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.types import Interaction
from ..scene.scene import (
    N_TEX_SLOTS,
    TEX_DIFFUSE,
    TEX_GLOSSY,
    TEX_IOR,
    TEX_KR,
    TEX_KT,
    TEX_NORMAL,
    TEX_OPACITY,
    TEX_ROUGHNESS,
    Scene,
)
from . import bxdfs as bx
from .uber import UberBSDF


def _maybe_texture(scene: Scene, tex_id: jax.Array, uv: jax.Array,
                   duvdx: jax.Array, duvdy: jax.Array, default: jax.Array):
    """Sample texture where tex_id >= 0, else keep `default` — the
    ``readTexture2Df*_ifValid`` pattern (``textures.cl:211-241``)."""
    if scene.textures.num == 0:
        return default, jnp.ones_like(default[..., :1])
    from ..scene.textures import sample_texture

    rgba = sample_texture(scene.textures, tex_id, uv, duvdx, duvdy)
    ok = (tex_id >= 0)[..., None]
    rgb = jnp.where(ok, rgba[..., :3], default)
    alpha = jnp.where(ok[..., 0], rgba[..., 3], 1.0)
    return rgb, alpha[..., None]


def fetch_bsdf(scene: Scene, it: Interaction,
               dist: int = bx.TROWBRIDGE_REITZ) -> tuple[UberBSDF, Interaction]:
    """Gather material params at each interaction and apply normal mapping.

    Returns (bsdf, interaction-with-perturbed-frame).  Texture modulation
    multiplies the constant like the reference (``materials.cl:67-91``);
    diffuse-texture alpha multiplies opacity (opacity-in-alpha).
    """
    mats = scene.materials
    mid = jnp.maximum(it.material, 0)

    def g(arr):
        return jnp.take(arr, mid, axis=0, mode="clip")

    diffuse = g(mats.diffuse)
    glossy = g(mats.glossy)
    kr = g(mats.kr)
    kt = g(mats.kt)
    opacity = g(mats.opacity)
    roughness = g(mats.roughness)
    ior = g(mats.ior)
    tex = g(mats.tex)  # (N, 8)

    if scene.textures.num > 0:
        # static per-slot gating: slots no material binds compile away
        # entirely (used_slots is trace-time constant)
        used = scene.materials.used_slots
        one3 = jnp.ones_like(diffuse)

        def slot(s):
            return _maybe_texture(scene, tex[..., s], it.uv, it.duvdx,
                                  it.duvdy, one3)

        d_a = jnp.ones_like(diffuse[..., :1])
        if used[TEX_DIFFUSE]:
            d_rgb, d_a = slot(TEX_DIFFUSE)
            diffuse = diffuse * d_rgb
        if used[TEX_GLOSSY]:
            glossy = glossy * slot(TEX_GLOSSY)[0]
        if used[TEX_KR]:
            kr = kr * slot(TEX_KR)[0]
        if used[TEX_KT]:
            kt = kt * slot(TEX_KT)[0]
        if used[TEX_OPACITY] or used[TEX_DIFFUSE]:
            # opacity map multiplies, diffuse alpha multiplies (opacity-in-alpha)
            op_rgb = slot(TEX_OPACITY)[0] if used[TEX_OPACITY] else one3
            opacity = opacity * op_rgb * d_a
        if used[TEX_ROUGHNESS]:
            roughness = roughness * slot(TEX_ROUGHNESS)[0][..., 0]
        if used[TEX_IOR]:
            i_rgb, _ = slot(TEX_IOR)
            ior = jnp.where(tex[..., TEX_IOR] >= 0, i_rgb[..., 0] * ior, ior)

        if used[TEX_NORMAL]:
            # normal mapping: perturb ns and re-orthonormalize the frame
            # (materials.cl:14-30)
            n_rgb, _ = slot(TEX_NORMAL)
            has_nm = tex[..., TEX_NORMAL] >= 0
            n_ts = m.normalize(n_rgb * 2.0 - 1.0)  # tangent space, z-up map
            ns_new = m.normalize(
                it.dpdu * n_ts[..., 0:1] + it.dpdv * n_ts[..., 1:2]
                + it.ns * n_ts[..., 2:3]
            )
            ns = jnp.where(has_nm[..., None], ns_new, it.ns)
            t = m.normalize(it.dpdu - ns * m.dot3(it.dpdu, ns))
            b = jnp.cross(ns, t)
            it = it.replace(ns=ns, dpdu=t, dpdv=b)

    alpha = bx.roughness_to_alpha(roughness)
    bsdf = UberBSDF(
        diffuse=diffuse,
        glossy=glossy,
        kr=kr,
        kt=kt,
        passthrough=jnp.clip(1.0 - opacity, 0.0, 1.0),
        alpha=alpha,
        eta=ior,
        conductor_eta=g(mats.conductor_eta),
        conductor_k=g(mats.conductor_k),
        rs_blend=g(mats.rs_blend),
        dist=dist,
        used=getattr(mats, "used_lobes", (True,) * 7),
    )
    return bsdf, it
