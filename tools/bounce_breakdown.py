"""Per-bounce query breakdown on the bench scene (VERDICT r4 item 2).

Replays the integrator's actual wavefronts (closest-hit rays AND NEE shadow
rays at every bounce) host-side, then times each blocked-accel query
individually on the chip with hard per-call sync.  This is the committed
"incoherent bounce" optimization map: the primary-query phase breakdown in
bench.py covers only the coherent case; the frame's 603 ms/spp is dominated
by the ~8 closest + ~8 occlusion queries on progressively less coherent
wavefronts, which this tool itemizes.

Usage: python tools/bounce_breakdown.py [width] [depth]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.bsdf import uber
from mcrt_tpu.bsdf.materials import fetch_bsdf
from mcrt_tpu.camera.pinhole import pixel_uv
from mcrt_tpu.config import IntegratorConfig, RenderConfig, SamplerConfig, SamplerType
from mcrt_tpu.core import math as m
from mcrt_tpu.core.types import Rays
from mcrt_tpu.lights import lights as lt
from mcrt_tpu.sampling import rng
from mcrt_tpu.scene.builders import bunny_field
from mcrt_tpu.scene.interaction import (
    compute_interaction, spawn_ray, spawn_shadow_ray,
)


def collect_wavefronts(scene, camera, cfg, intersector):
    """One sample's (closest, shadow) ray wavefronts per bounce, mirroring
    integrators/path.py's _shade ordering and RNG consumption."""
    w, h = cfg.width, cfg.height
    n = w * h
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    stream = rng.make_stream(cfg.sampler, jnp.asarray(0), jnp.arange(n))
    icfg = cfg.integrator
    closest, shadows = [], []
    for b in range(icfg.max_depth):
        closest.append(jax.tree.map(np.asarray, rays))
        hit = intersector.intersect(scene, rays)
        it = compute_interaction(scene, rays, hit)
        bsdf, it = fetch_bsdf(scene, it)
        alive = rays.active & hit.valid
        u_pick, stream = rng.next_1d(stream)
        u_light, stream = rng.next_2d(stream)
        u_bsdf, stream = rng.next_3d(stream)
        l_idx, pdf_choice = lt.pick_light(scene.lights, u_pick)
        ls = lt.sample_li(scene, l_idx, it.p, u_light)
        nee_ok = alive & bsdf.has_non_delta() & ls.valid
        srays = spawn_shadow_ray(it, ls.wi, ls.dist, icfg.trace_offset, nee_ok)
        shadows.append(jax.tree.map(np.asarray, srays))
        wo_l = m.to_local(it.dpdu, it.dpdv, it.ns, it.wo)
        bs = uber.sample(bsdf, wo_l, u_bsdf)
        wi_w = m.to_world(it.dpdu, it.dpdv, it.ns, bs.wi)
        extend = alive & bs.valid
        rays = spawn_ray(it, wi_w, icfg.trace_offset,
                         icfg.max_trace_distance, extend)
    return closest, shadows


def timed(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene, camera = bunny_field()
    cfg = RenderConfig(
        width=width, height=width, spp=1,
        sampler=SamplerConfig(type=SamplerType.SOBOL),
        integrator=IntegratorConfig(max_depth=depth),
    )
    intersector = build_intersector(scene, cfg)
    print("collecting wavefronts...", flush=True)
    closest, shadows = collect_wavefronts(scene, camera, cfg, intersector)

    isect = jax.jit(lambda r: intersector.intersect(scene, r).t)
    occl = jax.jit(lambda r: intersector.occluded(scene, r))
    tot_c = tot_s = 0.0
    for b, (cr, sr) in enumerate(zip(closest, shadows)):
        cr = jax.tree.map(jnp.asarray, cr)
        sr = jax.tree.map(jnp.asarray, sr)
        tc = timed(isect, cr)
        ts = timed(occl, sr)
        tot_c += tc
        tot_s += ts
        live_c = int(np.asarray(cr.active).sum())
        live_s = int(np.asarray(sr.active).sum())
        print(f"bounce {b}: closest {tc*1e3:7.1f} ms ({live_c:7d} live)  "
              f"occluded {ts*1e3:7.1f} ms ({live_s:7d} live)", flush=True)
    print(f"total: closest {tot_c*1e3:.1f} ms + occluded {tot_s*1e3:.1f} ms "
          f"= {(tot_c+tot_s)*1e3:.1f} ms/spp of query time")


if __name__ == "__main__":
    main()
