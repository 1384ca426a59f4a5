"""Ablation timing for the bench config: which phase dominates?

Times one spp of textured_hall 512x512 x 8 bounces under different
configurations (sampler, accel, resolution) to localize the bottleneck.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.config import (
    AccelType, IntegratorConfig, RenderConfig, SamplerConfig, SamplerType,
)
from mcrt_tpu.parallel.render import render_spp_batch
from mcrt_tpu.scene import builders


def timeit(fn, *args, n=4):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / n


def run(tag, scene_name="textured_hall", sampler=SamplerType.SOBOL,
        accel=AccelType.AUTO, depth=8, size=512, spp=1):
    scene, camera = getattr(builders, scene_name)()
    cfg = RenderConfig(width=size, height=size, spp=spp, accel=accel,
                       sampler=SamplerConfig(type=sampler),
                       integrator=IntegratorConfig(max_depth=depth))
    inter = build_intersector(scene, cfg)
    frames = jnp.arange(spp, dtype=jnp.int32)

    @jax.jit
    def render(s, f):
        return jnp.sum(render_spp_batch(s, camera, f, cfg, inter))

    dt = timeit(render, scene, frames)
    print(f"{tag:44s} {dt*1e3/spp:9.1f} ms/spp")
    return dt / spp


if __name__ == "__main__":
    base = run("base: sobol/auto/8bounce/512")
    run("sampler=random", sampler=SamplerType.RANDOM)
    run("accel=brute", accel=AccelType.BRUTE)
    run("accel=lbvh", accel=AccelType.LBVH)
    run("depth=2", depth=2)
    run("depth=4", depth=4)
    run("size=256", size=256)
    run("spp=4 (batched)", spp=4)
