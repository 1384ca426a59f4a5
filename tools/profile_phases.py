"""Phase-level breakdown: coherence sort, cull, list sort, traversal kernel,
on primary + real bounce-1/2 rays + real shadow rays from the integrator."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel.pallas_blocked import (
    TILE, build_blocked, intersect_blocked, occluded_blocked,
    _coherence_order, _pack_rays, _visit_lists, _query_closest,
)
from mcrt_tpu.camera.pinhole import pixel_uv
from mcrt_tpu.config import IntegratorConfig, RenderConfig
from mcrt_tpu.core.types import Rays
from mcrt_tpu.scene.builders import bunny_field


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, n=5):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def collect(scene, camera, cfg, intersector):
    """Real integrator rays: (bounce rays by depth, shadow rays by depth)."""
    from mcrt_tpu.bsdf import uber
    from mcrt_tpu.bsdf.materials import fetch_bsdf
    from mcrt_tpu.core import math as m
    from mcrt_tpu.lights import lights as lt
    from mcrt_tpu.sampling import rng
    from mcrt_tpu.scene.interaction import (
        compute_interaction, spawn_ray, spawn_shadow_ray,
    )

    w, h = cfg.width, cfg.height
    n = w * h
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    stream = rng.make_stream(cfg.sampler, jnp.asarray(0), jnp.arange(n))
    icfg = cfg.integrator
    brays, srays_all = {}, {}
    for b in range(4):
        brays[b] = jax.tree.map(np.asarray, rays)
        hit = intersector.intersect(scene, rays)
        alive = rays.active & hit.valid
        it = compute_interaction(scene, rays, hit)
        bsdf, it = fetch_bsdf(scene, it)
        u_pick, stream = rng.next_1d(stream)
        u_light, stream = rng.next_2d(stream)
        u_bsdf, stream = rng.next_3d(stream)
        can_nee = alive & bsdf.has_non_delta() & (scene.lights.num > 0)
        l_idx, _ = lt.pick_light(scene.lights, u_pick)
        ls = lt.sample_li(scene, l_idx, it.p, u_light)
        sr = spawn_shadow_ray(it, ls.wi, ls.dist, icfg.trace_offset,
                              can_nee & ls.valid)
        srays_all[b] = jax.tree.map(np.asarray, sr)
        wo_l = m.to_local(it.dpdu, it.dpdv, it.ns, it.wo)
        bs = uber.sample(bsdf, wo_l, u_bsdf)
        wi_w = m.to_world(it.dpdu, it.dpdv, it.ns, bs.wi)
        extend = alive & bs.valid
        rays = spawn_ray(it, wi_w, icfg.trace_offset,
                         icfg.max_trace_distance, extend)
    return brays, srays_all


def main():
    scene, camera = bunny_field()
    geom = scene.geometry
    acc = build_blocked(geom)

    w = h = 512
    cfg = RenderConfig(width=w, height=h, spp=1,
                       integrator=IntegratorConfig(max_depth=8))
    from mcrt_tpu.accel import build_intersector
    intersector = build_intersector(scene, cfg)
    brays, srays = collect(scene, camera, cfg, intersector)

    # phase timings on primary rays
    prim = Rays(**{k: jnp.asarray(v) for k, v in
                   vars(brays[0]).items()}) if hasattr(brays[0], '__dict__') \
        else jax.tree.map(jnp.asarray, brays[0])

    coh = jax.jit(lambda r: _coherence_order(r, acc.bounds))
    t_coh = timed(coh, prim)

    @jax.jit
    def lists_fn(r):
        order = _coherence_order(r, acc.bounds)
        rq = jax.tree.map(lambda a: jnp.take(a, order, axis=0), r)
        packed = _pack_rays(rq)
        return _visit_lists(packed, acc.chunk_aabb, acc.aabb, False)

    counts, _, _ = lists_fn(prim)
    t_lists = timed(lists_fn, prim)
    print(f"coherence argsort: {t_coh*1e3:7.2f} ms")
    print(f"+cull+sort       : {t_lists*1e3:7.2f} ms")

    isect = jax.jit(lambda r: intersect_blocked(geom, acc, r))
    occl = jax.jit(lambda r: occluded_blocked(geom, acc, r))

    for b, rn in brays.items():
        r = jax.tree.map(jnp.asarray, rn)
        t = timed(isect, r, n=3)
        cnts = np.asarray(lists_fn(r)[0])
        live = float(np.asarray(rn.active).mean())
        print(f"closest b{b}: {t*1e3:8.2f} ms  live={live:.2f} "
              f"visits/tile mean={cnts.mean():6.0f} max={cnts.max()}")
    for b, rn in srays.items():
        r = jax.tree.map(jnp.asarray, rn)
        t = timed(occl, r, n=3)
        live = float(np.asarray(rn.active).mean())
        print(f"shadow  b{b}: {t*1e3:8.2f} ms  live={live:.2f}")


if __name__ == "__main__":
    main()
