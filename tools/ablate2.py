"""Second-round ablation: which part of the 60 ms/bounce is what?

Variants of textured_hall 512x512 @ 8 bounces, one spp per timed call.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

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


def strip_textures(scene):
    mats = scene.materials
    return scene.replace(
        materials=mats.replace(
            tex=jnp.full_like(mats.tex, -1),
            used_slots=(False,) * 8,
        )
    )


def run(tag, scene, camera, sampler=SamplerType.SOBOL, accel=AccelType.AUTO,
        depth=8, size=512, shadows=True, mis=False):
    cfg = RenderConfig(width=size, height=size, spp=1, accel=accel,
                       sampler=SamplerConfig(type=sampler),
                       integrator=IntegratorConfig(
                           max_depth=depth, enable_shadows=shadows,
                           use_mis=mis))
    inter = build_intersector(scene, cfg)
    frames = jnp.arange(1, dtype=jnp.int32)

    @jax.jit
    def render(s, f):
        return jnp.sum(render_spp_batch(s, camera, f, cfg, inter))

    dt = timeit(render, scene, frames)
    print(f"{tag:44s} {dt*1e3:9.1f} ms/spp", flush=True)
    return dt


if __name__ == "__main__":
    scene, camera = builders.textured_hall()
    bare = strip_textures(scene)
    base = run("base: tex/sobol/auto/8bounce/512", scene, camera)
    run("no textures", bare, camera)
    run("no textures, random sampler", bare, camera, sampler=SamplerType.RANDOM)
    run("no textures, no shadows", bare, camera, shadows=False)
    run("no shadows (tex on)", scene, camera, shadows=False)
    run("no textures, depth=2", bare, camera, depth=2)
    run("mis on", scene, camera, mis=True)
