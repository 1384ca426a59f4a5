"""Per-stage microbench of the bounce loop on TPU.

Each stage runs K times inside one jitted lax.fori_loop (the axon tunnel
costs ~30ms per dispatch, so eager per-op timing is useless); reported
time is per iteration.
"""
from __future__ import annotations

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
from mcrt_tpu.sampling import rng
from mcrt_tpu.scene.builders import textured_hall
from mcrt_tpu.scene.interaction import compute_interaction, spawn_ray, spawn_shadow_ray

K = 16
SIZE = 512


def timed_loop(name, fn, *args):
    """fn(*args) -> pytree; runs K reps inside one jit via fori_loop."""

    @jax.jit
    def rep(*a):
        def body(i, acc):
            out = fn(*a)
            leaves = [x.astype(jnp.float32).sum() if x.dtype != jnp.bool_
                      else x.sum().astype(jnp.float32)
                      for x in jax.tree.leaves(out)]
            return acc + sum(leaves)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    float(rep(*args))
    t0 = time.perf_counter()
    r = rep(*args)
    float(r)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:34s} {dt*1e3:8.2f} ms/iter")
    return dt


def main():
    scene, camera = textured_hall()
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=1,
                       sampler=SamplerConfig(type=SamplerType.SOBOL),
                       integrator=IntegratorConfig(max_depth=8))
    inter = build_intersector(scene, cfg)
    n = SIZE * SIZE
    uv = pixel_uv(SIZE, SIZE)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    stream = rng.make_stream(cfg.sampler, jnp.asarray(0), jnp.arange(n))
    hit = jax.jit(lambda s, r: inter.intersect(s, r))(scene, rays)
    it = jax.jit(compute_interaction)(scene, rays, hit)
    bsdf, it2 = jax.jit(fetch_bsdf)(scene, it)
    u3 = jnp.full((n, 3), 0.37, jnp.float32)
    u2 = u3[:, :2]
    u1 = u3[:, 0]
    wo_l = m.to_local(it2.dpdu, it2.dpdv, it2.ns, it2.wo)

    timed_loop("intersect (closest)", lambda s, r: inter.intersect(s, r), scene, rays)
    timed_loop("occluded", lambda s, r: inter.occluded(s, r), scene, rays)
    timed_loop("compute_interaction", compute_interaction, scene, rays, hit)
    timed_loop("fetch_bsdf", fetch_bsdf, scene, it)
    timed_loop("uber.sample", uber.sample, bsdf, wo_l, u3)
    timed_loop("uber.evaluate", uber.evaluate, bsdf, wo_l, wo_l)
    timed_loop("uber.pdf", uber.pdf, bsdf, wo_l, wo_l)

    def nee(s, it_, u1_, u2_):
        l_idx, pdfc = lt.pick_light(s.lights, u1_)
        ls = lt.sample_li(s, l_idx, it_.p, u2_)
        return ls.li, ls.pdf, ls.wi

    timed_loop("light pick+sample_li", nee, scene, it2, u1, u2)
    timed_loop("rng.next_3d (sobol)", lambda st: rng.next_3d(st)[0], stream)
    timed_loop("spawn_ray", spawn_ray, it2, d, 1e-4, 1e6, hit.valid)

    from mcrt_tpu.accel.pallas_blocked import _coherence_order
    accel = getattr(inter, "accel", None)
    if accel is not None and hasattr(accel, "bounds"):
        timed_loop("coherence argsort",
                   lambda r: _coherence_order(r, accel.bounds), rays)
        gather = lambda r, o_: jax.tree.map(lambda a: jnp.take(a, o_, axis=0), r)
        order = jnp.argsort(u1).astype(jnp.int32)
        timed_loop("ray gather by order", gather, rays, order)


if __name__ == "__main__":
    main()
