"""Bisect the depth-1 frame cost: time jitted sub-pipelines of one
render_sample to locate the ~300 ms depth-independent overhead the depth
sweep exposed (bench depth-1 = 400 ms/spp vs ~29 ms marginal per bounce).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.bsdf import uber
from mcrt_tpu.bsdf.materials import fetch_bsdf
from mcrt_tpu.camera.pinhole import pixel_uv
from mcrt_tpu.config import IntegratorConfig, RenderConfig, SamplerConfig, SamplerType
from mcrt_tpu.core import math as m
from mcrt_tpu.core.types import Rays
from mcrt_tpu.lights import lights as lt
from mcrt_tpu.renderer import render_sample, _morton_pixel_order, frame_jitter
from mcrt_tpu.sampling import rng
from mcrt_tpu.scene.builders import bunny_field
from mcrt_tpu.scene.interaction import compute_interaction, spawn_shadow_ray


def timed(fn, *args, reps=4):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene, camera = bunny_field()
    cfg = RenderConfig(width=width, height=width, spp=1,
                       sampler=SamplerConfig(type=SamplerType.SOBOL),
                       integrator=IntegratorConfig(max_depth=1))
    intersector = build_intersector(scene, cfg)
    w = h = width
    n = w * h
    order, inv_order = _morton_pixel_order(w, h)

    def stage(level):
        def fn(scene_in, frame):
            jitter = frame_jitter(frame)
            uv = pixel_uv(w, h, jitter=jitter[None, :])
            uv = jnp.take(uv, jnp.asarray(order), axis=0)
            o, d = camera.generate_rays(uv)
            rays = Rays.make(o, d)
            if level == 0:
                return jnp.sum(rays.d)
            stream = rng.make_stream(cfg.sampler, frame, jnp.asarray(order))
            if level == 1:
                u, _ = rng.next_3d(stream)
                return jnp.sum(u)
            hit = intersector.intersect(scene_in, rays)
            if level == 2:
                return jnp.sum(hit.t)
            it = compute_interaction(scene_in, rays, hit)
            bsdf, it = fetch_bsdf(scene_in, it)
            if level == 3:
                return jnp.sum(it.p) + jnp.sum(bsdf.diffuse)
            u_pick, stream = rng.next_1d(stream)
            u_light, stream = rng.next_2d(stream)
            u_bsdf, stream = rng.next_3d(stream)
            l_idx, pdf_choice = lt.pick_light(scene_in.lights, u_pick)
            ls = lt.sample_li(scene_in, l_idx, it.p, u_light)
            if level == 4:
                return jnp.sum(ls.li)
            wo_l = m.to_local(it.dpdu, it.dpdv, it.ns, it.wo)
            f_nee = uber.evaluate(bsdf, wo_l, m.to_local(it.dpdu, it.dpdv, it.ns, ls.wi))
            bs = uber.sample(bsdf, wo_l, u_bsdf)
            if level == 5:
                return jnp.sum(f_nee) + jnp.sum(bs.f)
            srays = spawn_shadow_ray(it, ls.wi, ls.dist, 1e-4,
                                     hit.valid & ls.valid)
            blocked = intersector.occluded(scene_in, srays)
            if level == 6:
                return jnp.sum(blocked)
            return jnp.sum(f_nee)
        return jax.jit(fn)

    names = ["rays only", "+sobol 3d", "+primary isect", "+interaction+fetch",
             "+light sample", "+bsdf eval/sample", "+shadow query"]
    f0 = jnp.asarray(0, jnp.int32)
    prev = 0.0
    for lvl, name in enumerate(names):
        t = timed(stage(lvl), scene, f0)
        print(f"level {lvl} {name:22s}: {t*1e3:7.1f} ms (delta "
              f"{(t-prev)*1e3:+7.1f})", flush=True)
        prev = t

    full = jax.jit(lambda s, f: jnp.sum(render_sample(s, camera, f, cfg,
                                                      intersector)[0]))
    t = timed(full, scene, f0)
    print(f"full render_sample depth1   : {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
