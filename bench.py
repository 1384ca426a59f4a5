"""Benchmark harness: rays/sec/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md) — this harness *establishes*
the baseline.  Primary metric: rays/sec/chip on the standard scene at 8
bounces (BASELINE config 3 analogue; until a Sponza-scale OBJ is available the
scene is the canonical Cornell fixture / procedural stand-in selected by
BENCH_SCENE).

Measurement notes (axon tunnel): per-dispatch latency ~30ms and slow
device->host transfers, so we time M back-to-back dispatches of the jitted
frame function and sync once via a scalar readback; ray counts come from a
separate instrumented run that sums actual active lanes per bounce (closest
hits + NEE shadow rays), matching how the reference's wavefront issues
queries (SURVEY §3.2: (1 + maxDepth) intersections + maxDepth occlusions).
"""
from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def count_rays_per_sample(scene, camera, cfg, intersector):
    """Instrumented pass: actual rays traced for one spp (closest + shadow).
    Jitted as one program — eager execution through the axon tunnel would pay
    ~30ms per op dispatch."""
    return float(jax.jit(
        functools.partial(
            _count_rays_traced, camera=camera, cfg=cfg, intersector=intersector
        )
    )(scene))


def _count_rays_traced(scene, camera, cfg, intersector):
    from mcrt_tpu.bsdf import uber
    from mcrt_tpu.bsdf.materials import fetch_bsdf
    from mcrt_tpu.core import math as m
    from mcrt_tpu.core.types import Rays, Throughput
    from mcrt_tpu.camera.pinhole import pixel_uv
    from mcrt_tpu.integrators import path as pi
    from mcrt_tpu.sampling import rng
    from mcrt_tpu.scene.interaction import compute_interaction, spawn_ray

    # trace with counting: emulate the integrator's activity masks
    n = cfg.width * cfg.height
    uv = pixel_uv(cfg.width, cfg.height)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    stream = rng.make_stream(cfg.sampler, jnp.asarray(0), jnp.arange(n))

    count = jnp.asarray(0.0)
    tp_active = jnp.ones((n,), bool)
    icfg = cfg.integrator
    for bounce in range(icfg.max_depth):
        count = count + tp_active.sum(dtype=jnp.float32)  # closest-hit query
        hit = intersector.intersect(scene, rays)
        alive = tp_active & hit.valid
        it = compute_interaction(scene, rays, hit)
        bsdf, it = fetch_bsdf(scene, it)
        u_pick, stream = rng.next_1d(stream)
        u_light, stream = rng.next_2d(stream)
        u_bsdf, stream = rng.next_3d(stream)
        nee = alive & bsdf.has_non_delta() & (scene.lights.num > 0)
        count = count + nee.sum(dtype=jnp.float32)  # shadow query
        wo_l = m.to_local(it.dpdu, it.dpdv, it.ns, it.wo)
        bs = uber.sample(bsdf, wo_l, u_bsdf)
        wi_w = m.to_world(it.dpdu, it.dpdv, it.ns, bs.wi)
        extend = alive & bs.valid
        rays = spawn_ray(it, wi_w, icfg.trace_offset, icfg.max_trace_distance, extend)
        tp_active = extend
    return count


def main():
    scene_name = os.environ.get("BENCH_SCENE", "bunny_field")
    width = int(os.environ.get("BENCH_WIDTH", "512"))
    height = int(os.environ.get("BENCH_HEIGHT", "512"))
    depth = int(os.environ.get("BENCH_DEPTH", "8"))
    spp_per_call = int(os.environ.get("BENCH_SPP_PER_CALL", "4"))
    calls = int(os.environ.get("BENCH_CALLS", "8"))

    from mcrt_tpu.accel import build_intersector
    from mcrt_tpu.config import AccelType, IntegratorConfig, RenderConfig
    from mcrt_tpu.parallel.render import render_spp_batch
    from mcrt_tpu.scene.builders import cornell_box

    # AUTO resolves to the Pallas blocked kernel on TPU (the measured-fastest
    # strategy at every scene size), XLA paths on CPU
    accel = AccelType(os.environ.get("BENCH_ACCEL", "auto"))

    if scene_name == "bunny_field":
        from mcrt_tpu.scene.builders import bunny_field

        scene, camera = bunny_field()
    else:
        scene, camera = cornell_box()

    cfg = RenderConfig(
        width=width, height=height, spp=spp_per_call, accel=accel,
        integrator=IntegratorConfig(max_depth=depth),
    )
    intersector = build_intersector(scene, cfg)

    @jax.jit
    def render(scene_in, frames):
        img = render_spp_batch(scene_in, camera, frames, cfg, intersector)
        return jnp.sum(img)  # scalar readback only

    # rays per full spp-batch call
    rays_per_sample = count_rays_per_sample(scene, camera, cfg, intersector)
    rays_per_call = rays_per_sample * spp_per_call

    # warmup / compile
    frames = jnp.arange(spp_per_call, dtype=jnp.int32)
    np.asarray(render(scene, frames))

    t0 = time.time()
    acc = None
    for i in range(calls):
        acc = render(scene, frames + i * spp_per_call)
    _ = float(acc)  # sync
    dt = time.time() - t0

    rays_per_sec = rays_per_call * calls / dt
    n_chips = jax.device_count()
    result = {
        "metric": "rays/sec/chip",
        "value": round(rays_per_sec / n_chips),
        "unit": f"rays/s ({scene_name} {width}x{height}, {depth} bounces, accel={cfg.accel.value})",
        "vs_baseline": 1.0,  # reference publishes no numbers; this run IS the baseline
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
