"""Surface interaction construction from hit records.

Analogue of ``assets/kernels/geometry.cl``: triangle partial derivatives
dpdu/dpdv from UVs (:9-28), vertex attribute fetch + interpolation (:30-90),
and ``computeSurfaceInteraction`` (:177-215) — the variant without ray
differentials that both reference integrators actually use.  The
differential-aware path (:92-175) is provided for texture LOD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.types import Hit, Interaction, RayDiff, Rays
from .scene import (
    FA_LIGHT, FA_MAT, FA_N0, FA_N1, FA_N2, FA_P0, FA_P1, FA_P2, FA_UV0,
    FA_UV1, FA_UV2, Scene,
)


def _face_attributes(scene: Scene, prim: jax.Array):
    """ONE packed gather per hit instead of six distinct-index sweeps —
    see ``Geometry.face_attrs``.  Returns (p[3], n[3], uv[3], mat, light)."""
    row = jnp.take(scene.geometry.face_attrs, prim, axis=0, mode="clip")
    p = [row[..., FA_P0:FA_P0 + 3], row[..., FA_P1:FA_P1 + 3],
         row[..., FA_P2:FA_P2 + 3]]
    n = [row[..., FA_N0:FA_N0 + 3], row[..., FA_N1:FA_N1 + 3],
         row[..., FA_N2:FA_N2 + 3]]
    uv = [row[..., FA_UV0:FA_UV0 + 2], row[..., FA_UV1:FA_UV1 + 2],
          row[..., FA_UV2:FA_UV2 + 2]]
    mat = row[..., FA_MAT].astype(jnp.int32)
    light = row[..., FA_LIGHT].astype(jnp.int32)
    return p, n, uv, mat, light


def triangle_dpduv(p, uv):
    """dpdu/dpdv from the uv parametrization (``geometry.cl:9-28``); falls back
    to an arbitrary ONB around the geometric normal for degenerate UVs."""
    duv02 = uv[0] - uv[2]
    duv12 = uv[1] - uv[2]
    dp02 = p[0] - p[2]
    dp12 = p[1] - p[2]
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)[..., None]
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv
    dpdv = (-duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12) * inv
    ng = m.normalize(jnp.cross(p[1] - p[0], p[2] - p[0]))
    t_fb, b_fb = m.build_orthonormal_basis(ng)
    dpdu = jnp.where(ok[..., None], dpdu, t_fb)
    dpdv = jnp.where(ok[..., None], dpdv, b_fb)
    return dpdu, dpdv, ng


def transfer_differentials(rays: Rays, diff: RayDiff, p: jax.Array,
                           ng: jax.Array, dpdu: jax.Array,
                           dpdv: jax.Array):
    """Ray-differential transfer onto the hit plane → (duvdx, duvdy)
    (``computeSurfaceInteractionWithDifferentials``,
    ``geometry.cl:92-175``): intersect the neighbor-pixel rays with the
    plane through ``p`` with normal ``ng``, then solve for the uv offsets
    in the (raw, un-orthonormalized) dpdu/dpdv parametrization.  Where the
    reference selects the two most-normal-aligned dimensions for its 2×2
    solve (``geometry.cl:130-147``), this uses the branch-free
    least-squares normal equations — identical result for exact plane
    offsets, and vector-friendly."""
    denom = m.dot(rays.d, ng)  # = dot(p - o, ng)/t for the main ray
    dist = m.dot(p - rays.o, ng)

    def plane_offset(dd):
        dn = m.dot(dd, ng)
        ok = jnp.abs(dn) > 1e-12
        t = jnp.where(ok, dist / jnp.where(ok, dn, 1.0), 0.0)
        px = rays.o + dd * t[..., None]
        return px - p, ok

    dpdx, okx = plane_offset(diff.dddx)
    dpdy, oky = plane_offset(diff.dddy)
    # normal equations: [uu uv; uv vv] [du; dv] = [dot(dp,dpdu); dot(dp,dpdv)]
    uu = m.dot(dpdu, dpdu)
    uvd = m.dot(dpdu, dpdv)
    vv = m.dot(dpdv, dpdv)
    ok0 = jnp.abs(denom) > 1e-12

    def solve(dp, ok):
        b0 = m.dot(dp, dpdu)
        b1 = m.dot(dp, dpdv)
        du, dv, s_ok = m.solve_2x2(uu, uvd, uvd, vv, b0, b1)
        good = ok & ok0 & s_ok
        return jnp.stack(
            [jnp.where(good, du, 0.0), jnp.where(good, dv, 0.0)], axis=-1
        )

    return solve(dpdx, okx), solve(dpdy, oky)


def compute_interaction(scene: Scene, rays: Rays, hit: Hit,
                        diff: RayDiff | None = None) -> Interaction:
    """Build the shading record at each hit (``computeSurfaceInteraction``,
    ``geometry.cl:177-215``).  Invalid lanes get benign defaults.  When
    ``diff`` is given, uv screen derivatives are transferred onto the hit
    plane (``geometry.cl:92-175``) and drive texture LOD."""
    prim = jnp.maximum(hit.prim, 0)
    p3, n3, uv3, mat, light = _face_attributes(scene, prim)

    if scene.geometry.instanced:
        # instanced scene: face attributes are source-mesh (object) space;
        # apply the hit SHAPE's transform at fetch — the reference's
        # RTShape-transform vertex fetch (``geometry.cl:30-90``; instances
        # from ``RTScene::attachMesh``, ``RTScene.cpp:564-678``).  Material
        # and light ids come from the per-shape tables (the two-level query
        # reports the instance's shape id).
        shape = jnp.maximum(hit.shape, 0)
        tw = jnp.take(scene.shapes.to_world, shape, axis=0, mode="clip")
        nm = jnp.take(scene.shapes.normal_mat, shape, axis=0, mode="clip")
        rot = tw[..., :3, :3]
        trans = tw[..., :3, 3]
        p3 = [jnp.einsum("...ij,...j->...i", rot, p) + trans for p in p3]
        n3 = [jnp.einsum("...ij,...j->...i", nm, v) for v in n3]
        ok = hit.shape >= 0
        mat = jnp.where(
            ok, jnp.take(scene.shapes.material, shape, axis=0, mode="clip"),
            -1)
        light = jnp.where(
            ok, jnp.take(scene.shapes.light, shape, axis=0, mode="clip"), -1)

    b1 = hit.u[..., None]
    b2 = hit.v[..., None]
    b0 = 1.0 - b1 - b2
    pos = p3[0] * b0 + p3[1] * b1 + p3[2] * b2
    ns = m.normalize(n3[0] * b0 + n3[1] * b1 + n3[2] * b2)
    uv = uv3[0] * b0[..., :1] + uv3[1] * b1[..., :1] + uv3[2] * b2[..., :1]

    dpdu, dpdv, ng = triangle_dpduv(p3, uv3)
    # orient geometric normal to the shading normal's side (geometry.cl:177-215)
    ng = jnp.where(m.dot3(ng, ns) < 0.0, -ng, ng)
    # orthonormalize the shading frame around ns (Gram-Schmidt)
    t = m.normalize(dpdu - ns * m.dot3(dpdu, ns))
    b = jnp.cross(ns, t)

    valid = hit.valid

    if diff is not None:
        duvdx, duvdy = transfer_differentials(rays, diff, pos, ng, dpdu, dpdv)
        duvdx = jnp.where(valid[..., None], duvdx, 0.0)
        duvdy = jnp.where(valid[..., None], duvdy, 0.0)
    else:
        # None (an empty pytree leaf) — texture sampling statically takes
        # the bilinear base-mip path, no dead LOD math or extra gathers
        duvdx = None
        duvdy = None
    return Interaction(
        p=pos,
        ng=ng,
        ns=ns,
        dpdu=t,
        dpdv=b,
        uv=uv,
        wo=-rays.d,
        duvdx=duvdx,
        duvdy=duvdy,
        material=jnp.where(valid, mat, -1).astype(jnp.int32),
        light=jnp.where(valid, light, -1).astype(jnp.int32),
        valid=valid,
    )


def spawn_ray(it: Interaction, d: jax.Array, offset: float,
              tmax: jax.Array | float, active: jax.Array) -> Rays:
    """Offset the origin along the geometric normal, sign-flipped for
    transmission (``PathTracing.cl:139-175`` geometric-offset ray spawn)."""
    side = jnp.where(m.dot(it.ng, d) >= 0.0, 1.0, -1.0)
    o = it.p + it.ng * (side * offset)[..., None]
    n = o.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    return Rays(
        o=o,
        d=d,
        tmin=jnp.zeros((n,), jnp.float32),
        tmax=tmax_arr,
        active=active,
    )


def spawn_shadow_ray(it: Interaction, wi: jax.Array, dist: jax.Array,
                     offset: float, active: jax.Array) -> Rays:
    """Shadow ray toward a light sample: offset at the surface end and clip
    tmax short of the light (``PathTracing.cl:107-136`` NEE shadow rays)."""
    side = jnp.where(m.dot(it.ng, wi) >= 0.0, 1.0, -1.0)
    o = it.p + it.ng * (side * offset)[..., None]
    return Rays(
        o=o,
        d=wi,
        tmin=jnp.zeros_like(dist),
        tmax=jnp.maximum(dist - 2.0 * offset, 0.0),
        active=active,
    )
