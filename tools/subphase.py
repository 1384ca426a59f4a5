"""Sub-phase timing: argsort / pack / cull kernel / list lax.sort / traversal,
isolated, on real bounce-1 rays from bunny_field (the worst case)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel.pallas_blocked import (
    TILE, build_blocked, intersect_blocked,
    _coherence_order, _pack_rays, _cull, _visit_lists,
)
from mcrt_tpu.config import IntegratorConfig, RenderConfig
from mcrt_tpu.scene.builders import bunny_field
from tools.profile_phases import collect, timed


def main():
    scene, camera = bunny_field()
    geom = scene.geometry
    acc = build_blocked(geom)
    print(f"blocks={acc.num_blocks} nbpad={acc.aabb.shape[0]}")

    cfg = RenderConfig(width=512, height=512, spp=1,
                       integrator=IntegratorConfig(max_depth=8))
    from mcrt_tpu.accel import build_intersector
    intersector = build_intersector(scene, cfg)
    brays, srays = collect(scene, camera, cfg, intersector)

    for b in (0, 1, 2):
        r = jax.tree.map(jnp.asarray, brays[b])
        coh = jax.jit(lambda rr: _coherence_order(rr, acc.bounds))
        t_coh = timed(coh, r)

        @jax.jit
        def packed_fn(rr):
            order = _coherence_order(rr, acc.bounds)
            rq = jax.tree.map(lambda a: jnp.take(a, order, axis=0), rr)
            return _pack_rays(rq)

        packed = packed_fn(r)
        t_pack = timed(packed_fn, r) - t_coh

        cull_fn = jax.jit(lambda p: _cull(p, acc.chunk_aabb, acc.aabb, False))
        t_cull = timed(cull_fn, packed)

        lists_fn = jax.jit(
            lambda p: _visit_lists(p, acc.chunk_aabb, acc.aabb, False))
        t_lists = timed(lists_fn, packed)
        t_sort = t_lists - t_cull

        isect = jax.jit(lambda rr: intersect_blocked(geom, acc, rr))
        t_tot = timed(isect, r, n=3)
        t_trav = t_tot - t_lists - t_pack - t_coh
        print(f"b{b}: argsort {t_coh*1e3:6.2f}  pack {t_pack*1e3:6.2f}  "
              f"cull {t_cull*1e3:6.2f}  listsort {t_sort*1e3:6.2f}  "
              f"traverse+resolve {t_trav*1e3:6.2f}  total {t_tot*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
