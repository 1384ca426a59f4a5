"""Perf breakdown for the blocked intersector on the bench scene.

Measures, on the real chip:
  - one closest-hit query on primary rays (coherent)
  - one closest-hit query on random rays (bounce-like, incoherent)
  - one occluded query on random rays
  - one full render_sample (integrator + all queries)
  - entered-block statistics per tile (host-side replay of the cull logic)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel.pallas_blocked import (
    BLOCK, TILE, build_blocked, intersect_blocked,
    occluded_blocked, _coherence_order,
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


def main():
    scene, camera = bunny_field()
    geom = scene.geometry
    acc = build_blocked(geom)
    print(f"tris(padded)={acc.tri.shape[1]} blocks={acc.num_blocks}")

    w = h = 512
    n = w * h
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    primary = Rays.make(o, d)

    key = jax.random.PRNGKey(0)
    lo, hi = np.asarray(acc.bounds)
    ro = jax.random.uniform(key, (n, 3)) * (hi - lo) + lo
    rd = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    random_rays = Rays.make(ro, rd)

    isect = jax.jit(lambda r: intersect_blocked(geom, acc, r))
    occl = jax.jit(lambda r: occluded_blocked(geom, acc, r))

    t_prim = timed(isect, primary)
    t_rand = timed(isect, random_rays)
    t_occ_rand = timed(occl, random_rays)
    t_occ_prim = timed(occl, primary)
    print(f"closest primary : {t_prim*1e3:8.2f} ms  ({n/t_prim/1e6:7.2f} Mrays/s)")
    print(f"closest random  : {t_rand*1e3:8.2f} ms  ({n/t_rand/1e6:7.2f} Mrays/s)")
    print(f"occluded primary: {t_occ_prim*1e3:8.2f} ms  ({n/t_occ_prim/1e6:7.2f} Mrays/s)")
    print(f"occluded random : {t_occ_rand*1e3:8.2f} ms  ({n/t_occ_rand/1e6:7.2f} Mrays/s)")

    # full frame for comparison
    from mcrt_tpu.accel import build_intersector
    from mcrt_tpu.renderer import render_sample

    cfg = RenderConfig(width=w, height=h, spp=1,
                       integrator=IntegratorConfig(max_depth=8))
    intersector = build_intersector(scene, cfg)
    frame_fn = jax.jit(lambda f: render_sample(scene, camera, f, cfg, intersector)[0])
    t_frame = timed(frame_fn, jnp.asarray(0), n=3)
    print(f"render_sample(8 bounces): {t_frame*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
