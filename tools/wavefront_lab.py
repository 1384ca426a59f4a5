"""Experiment harness for incoherent-bounce query optimization (VERDICT r4
item 2): captures the integrator's real bounce wavefronts once, then times
query variants (phase decomposition, sort-key layouts, GROUP/TILE settings)
on the SAME rays on the real chip.

Usage: python tools/wavefront_lab.py phases|keys [bounce]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.accel.pallas_blocked import (
    _coherence_order, _cull, _pack_table, _ray_table, _visit_lists,
)
from mcrt_tpu.config import IntegratorConfig, RenderConfig, SamplerConfig, SamplerType
from mcrt_tpu.core.types import Rays
from mcrt_tpu.scene.builders import bunny_field
from tools.bounce_breakdown import collect_wavefronts


def timed(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def setup(width=512, depth=8):
    scene, camera = bunny_field()
    cfg = RenderConfig(
        width=width, height=width, spp=1,
        sampler=SamplerConfig(type=SamplerType.SOBOL),
        integrator=IntegratorConfig(max_depth=depth),
    )
    intersector = build_intersector(scene, cfg)
    closest, shadows = collect_wavefronts(scene, camera, cfg, intersector)
    return scene, intersector, closest, shadows


def phases(bounces=(0, 1, 3)):
    scene, intersector, closest, shadows = setup()
    acc = intersector.accel
    for b in bounces:
        rays = jax.tree.map(jnp.asarray, closest[b])

        coh = jax.jit(lambda r: _coherence_order(r, acc.bounds))
        t_coh = timed(coh, rays)

        @jax.jit
        def packed_fn(r):
            order = _coherence_order(r, acc.bounds)
            return _pack_table(jnp.take(_ray_table(r), order, axis=0))

        packed = jax.block_until_ready(packed_fn(rays))
        t_pack = max(timed(packed_fn, rays) - t_coh, 0.0)
        cull_fn = jax.jit(lambda p: _cull(p, acc.chunk_aabb, acc.aabb, False))
        t_cull = timed(cull_fn, packed)
        lists_fn = jax.jit(
            lambda p: _visit_lists(p, acc.chunk_aabb, acc.aabb, False))
        t_sort = max(timed(lists_fn, packed) - t_cull, 0.0)
        isect = jax.jit(lambda r: intersector.intersect(scene, r).t)
        t_tot = timed(isect, rays)
        t_trav = max(t_tot - t_coh - t_pack - t_cull - t_sort, 0.0)
        # visit-list stats
        counts = np.asarray(lists_fn(packed)[0])
        print(f"bounce {b}: argsort {t_coh*1e3:6.1f}  pack {t_pack*1e3:6.1f}"
              f"  cull {t_cull*1e3:6.1f}  sort {t_sort*1e3:6.1f}"
              f"  traverse {t_trav*1e3:6.1f}  -> total {t_tot*1e3:6.1f} ms"
              f"   visits/tile mean {counts.mean():.0f} max {counts.max()}",
              flush=True)


def keys(bounce=1):
    """Compare coherence-key layouts on one bounce wavefront: the packed
    u32 single-operand sort (current) vs a full (key, iota) pair sort vs
    re-balanced position/direction bit splits."""
    import mcrt_tpu.accel.pallas_blocked as pb

    scene, intersector, closest, _ = setup()
    acc = intersector.accel
    rays = jax.tree.map(jnp.asarray, closest[bounce])
    isect = jax.jit(lambda r: intersector.intersect(scene, r).t)
    base = timed(isect, rays)
    print(f"current packed-u32: {base*1e3:.1f} ms", flush=True)

    orig = pb._coherence_order

    def pair_sort(r, bounds):
        lo, hi = bounds[0], bounds[1]
        p01 = (r.o - lo) / jnp.maximum(hi - lo, 1e-12)
        q = jnp.clip((p01 * 64.0).astype(jnp.int32), 0, 63)
        dq = jnp.clip(((r.d * 0.5 + 0.5) * 8.0).astype(jnp.int32), 0, 7)
        code = (pb._expand10(q[:, 0]) << 2) | (pb._expand10(q[:, 1]) << 1) | pb._expand10(q[:, 2])
        dcode = (pb._expand10(dq[:, 0]) << 2) | (pb._expand10(dq[:, 1]) << 1) | pb._expand10(dq[:, 2])
        key = ((code << 9) | dcode)
        key = jnp.where(r.active, key, jnp.uint32(0xFFFFFFFF))
        n = key.shape[0]
        _, order = jax.lax.sort(
            (key, jnp.arange(n, dtype=jnp.int32)), dimension=0, num_keys=1)
        return order

    def split_key(pos_bits, dir_bits):
        def f(r, bounds):
            lo, hi = bounds[0], bounds[1]
            p01 = (r.o - lo) / jnp.maximum(hi - lo, 1e-12)
            q = jnp.clip((p01 * 64.0).astype(jnp.int32), 0, 63)
            dq = jnp.clip(((r.d * 0.5 + 0.5) * 8.0).astype(jnp.int32), 0, 7)
            code = (pb._expand10(q[:, 0]) << 2) | (pb._expand10(q[:, 1]) << 1) | pb._expand10(q[:, 2])
            dcode = (pb._expand10(dq[:, 0]) << 2) | (pb._expand10(dq[:, 1]) << 1) | pb._expand10(dq[:, 2])
            # take the TOP pos_bits of the 18-bit position morton and the
            # TOP dir_bits of the 9-bit direction morton
            key = ((code >> (18 - pos_bits)) << dir_bits) \
                | (dcode >> (9 - dir_bits))
            key = key.astype(jnp.uint32)
            key = jnp.where(r.active, key, jnp.uint32(0xFFFFFFFF))
            n = key.shape[0]
            idx_bits = max(1, (n - 1).bit_length())
            key = key << idx_bits
            packed = key | jnp.arange(n, dtype=jnp.uint32)
            mask = jnp.uint32((1 << idx_bits) - 1)
            return (jnp.sort(packed) & mask).astype(jnp.int32)
        return f

    variants = {
        "pair-sort full key": pair_sort,
        "split p14/d0": split_key(14, 0),
        "split p10/d4": split_key(10, 4),
        "split p8/d6": split_key(8, 6),
        "split p6/d8": split_key(6, 8),
    }
    for name, fn in variants.items():
        pb._coherence_order = fn
        isect_v = jax.jit(lambda r: intersector.intersect(scene, r).t)
        t = timed(isect_v, rays)
        print(f"{name}: {t*1e3:.1f} ms", flush=True)
    pb._coherence_order = orig


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    if mode == "phases":
        phases()
    else:
        keys(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
