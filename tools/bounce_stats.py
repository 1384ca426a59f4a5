"""Measure entered-block counts for ACTUAL integrator bounce rays at
several (tile, block) granularities — informs TILE/BLOCK choice for the v2
kernel."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.accel.pallas_blocked import build_blocked, _coherence_order
from mcrt_tpu.bsdf import uber
from mcrt_tpu.bsdf.materials import fetch_bsdf
from mcrt_tpu.camera.pinhole import pixel_uv
from mcrt_tpu.config import IntegratorConfig, RenderConfig
from mcrt_tpu.core import math as m
from mcrt_tpu.core.types import Rays
from mcrt_tpu.sampling import rng
from mcrt_tpu.scene.builders import bunny_field
from mcrt_tpu.scene.interaction import compute_interaction, spawn_ray


def collect_bounce_rays(scene, camera, cfg, intersector, bounces=(0, 1, 3, 5)):
    w, h = cfg.width, cfg.height
    n = w * h
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    stream = rng.make_stream(cfg.sampler, jnp.asarray(0), jnp.arange(n))
    out = {}
    icfg = cfg.integrator
    for b in range(max(bounces) + 1):
        if b in bounces:
            out[b] = jax.tree.map(np.asarray, rays)
        hit = intersector.intersect(scene, rays)
        it = compute_interaction(scene, rays, hit)
        bsdf, it = fetch_bsdf(scene, it)
        _, stream = rng.next_1d(stream)
        _, stream = rng.next_2d(stream)
        u_bsdf, stream = rng.next_3d(stream)
        wo_l = m.to_local(it.dpdu, it.dpdv, it.ns, it.wo)
        bs = uber.sample(bsdf, wo_l, u_bsdf)
        wi_w = m.to_world(it.dpdu, it.dpdv, it.ns, bs.wi)
        extend = rays.active & hit.valid & bs.valid
        rays = spawn_ray(it, wi_w, icfg.trace_offset, icfg.max_trace_distance, extend)
    return out


def entered_stats(rays_np, acc, tile_sizes=(128, 256, 512, 1024, 2048),
                  sub_blocks=(128, 64, 32)):
    rays = rays_np
    order = np.asarray(_coherence_order(rays, acc.bounds))
    o = np.asarray(rays.o)[order]
    d = np.asarray(rays.d)[order]
    act = np.asarray(rays.active)[order]
    tri = np.asarray(acc.tri)
    nt = tri.shape[0]
    p0 = tri[:, 0:3]
    p1 = p0 + tri[:, 3:6]
    p2 = p0 + tri[:, 6:9]
    pmin = np.minimum(np.minimum(p0, p1), p2)
    pmax = np.maximum(np.maximum(p0, p1), p2)
    degen = (tri[:, 3:9] == 0).all(1)
    pmin[degen] = np.nan
    pmax[degen] = np.nan
    n = o.shape[0]
    live_frac = act.mean()
    print(f"  live={live_frac:.2f}")
    for bs in sub_blocks:
        nb = nt // bs
        lo = np.nanmin(pmin.reshape(nb, bs, 3), axis=1)
        hi = np.nanmax(pmax.reshape(nb, bs, 3), axis=1)
        for ts in tile_sizes:
            n_tiles = n // ts
            idxs = range(0, n_tiles, max(1, n_tiles // 12))
            ent = []
            for ti in idxs:
                sl = slice(ti * ts, (ti + 1) * ts)
                o_t, d_t, a_t = o[sl], d[sl], act[sl]
                if not a_t.any():
                    ent.append(0)
                    continue
                o_t, d_t = o_t[a_t], d_t[a_t]
                inv = 1.0 / np.where(np.abs(d_t) > 1e-12, d_t, 1e-12)
                t0s = (lo[None] - o_t[:, None]) * inv[:, None]
                t1s = (hi[None] - o_t[:, None]) * inv[:, None]
                tn = np.maximum(np.minimum(t0s, t1s).max(-1), 0.0)
                tf = np.minimum(np.maximum(t0s, t1s).min(-1), 1e30)
                with np.errstate(invalid="ignore"):
                    e = np.nan_to_num((tn <= tf), nan=False)
                ent.append(e.any(0).sum())
            tests_per_ray = np.mean(ent) * bs
            print(f"  block={bs:4d} tile={ts:5d}: entered/tile={np.mean(ent):7.0f} "
                  f"of {nb}, tests/ray={tests_per_ray:9.0f}")


def main():
    scene, camera = bunny_field()
    cfg = RenderConfig(width=256, height=256, spp=1,
                       integrator=IntegratorConfig(max_depth=8))
    intersector = build_intersector(scene, cfg)
    acc = build_blocked(scene.geometry)
    rays_by_bounce = collect_bounce_rays(scene, camera, cfg, intersector)
    for b, rn in rays_by_bounce.items():
        print(f"bounce {b}:")
        entered_stats(rn, acc)


if __name__ == "__main__":
    main()
