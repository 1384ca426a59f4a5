"""Sharded-scene intersection with ray ring exchange.

New capability (SURVEY §2e "scene/BVH sharding — the model axis"): the
reference holds the whole scene in one device's memory (its GUI merely
*reports* allocation totals, ``PathTracingGUI.cpp:110-114``); at
San-Miguel scale one TPU's HBM may not.  Here the per-face tables (the
memory-dominant triangle/BVH data) are partitioned into one shard per
device on the ``rays`` mesh axis, and **rays travel to the data**: each
ring step intersects the resident ray block against the local shard, then
rotates the (rays + running-best-hit) state to the next device with
``jax.lax.ppermute`` over ICI.  After ``n_shards`` steps every ray has
visited every shard and is back home carrying the global closest hit —
the renderer's ring-attention analogue (blockwise KV rotation with a
running reduction).

Vertex attribute arrays (positions/normals/uvs) stay replicated for
shading — the same split the reference's device scene makes between the
intersection-owned geometry inside Radeon Rays and the shading attribute
buffers bound to the shade kernels (``RTScene.cpp:178-197``).

Pure GSPMD-compatible: the ring function is a ``shard_map`` region, so it
composes with the (spp, rays) sharded renderer in one jitted program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.types import Hit, Rays
from ..scene.scene import Geometry
from .mesh import RAYS_AXIS

F32_MAX = float(jnp.finfo(jnp.float32).max)


def shard_faces(geom: Geometry, n_shards: int) -> Geometry:
    """Partition per-face tables into `n_shards` equal blocks (Morton order
    over centroids so shards are spatially compact, like the blocked accel's
    block decomposition), padded to a common size; vertex arrays replicated.

    Returns a Geometry whose face tables have leading dim (n_shards * Fpad)
    — shard i owns rows [i*Fpad, (i+1)*Fpad).  ``face_valid`` is False on
    padding.  Prim ids returned by the ring intersector index these stacked
    tables directly, so downstream interaction code works unchanged.
    """
    idx = np.asarray(geom.indices)
    valid = np.asarray(geom.face_valid)
    pos = np.asarray(geom.positions)
    real = np.nonzero(valid)[0]
    tri = idx[real]
    cent = (pos[tri[:, 0]] + pos[tri[:, 1]] + pos[tri[:, 2]]) / 3.0
    lo = cent.min(0)
    span = np.maximum(cent.max(0) - lo, 1e-12)
    c01 = (cent - lo) / span
    # Morton order (reuses the accel build's key)
    from ..accel.pallas_blocked import _morton_u32

    order = real[np.argsort(_morton_u32(c01), kind="stable")]

    n = len(order)
    fpad = -(-n // n_shards)
    fpad = max(1, fpad)
    total = n_shards * fpad
    sel = np.full((total,), 0, np.int64)
    ok = np.zeros((total,), bool)
    sel[:n] = order
    ok[:n] = True
    # NOTE: contiguous fill: shard i gets Morton range [i*fpad, (i+1)*fpad)
    new_indices = idx[sel]
    new_shape = np.asarray(geom.face_shape)[sel]
    return geom.replace(
        indices=jnp.asarray(new_indices),
        face_shape=jnp.asarray(np.where(ok, new_shape, -1).astype(np.int32)),
        face_valid=jnp.asarray(ok),
    )


def _local_intersect(geom_shard: Geometry, rays: Rays, base_prim: jax.Array,
                     best: Hit) -> Hit:
    """Brute-force the local face shard, merging into the running best.
    (On-TPU production path can swap in the Pallas blocked kernel here; the
    ring logic is identical.)"""
    from ..accel.brute import intersect_brute

    h = intersect_brute(geom_shard, rays)
    better = h.valid & (h.t < best.t)
    return Hit(
        t=jnp.where(better, h.t, best.t),
        prim=jnp.where(better, h.prim + base_prim, best.prim),
        shape=jnp.where(better, h.shape, best.shape),
        u=jnp.where(better, h.u, best.u),
        v=jnp.where(better, h.v, best.v),
        valid=best.valid | better,
    )


def make_ring_intersector(mesh: Mesh, n_shards: int, fpad: int):
    """Build (intersect, occluded) closures running the ray ring over the
    ``rays`` mesh axis.  `fpad` is the per-shard face count (static)."""
    axis = RAYS_AXIS

    def ring_intersect(geom: Geometry, rays: Rays) -> Hit:
        def spmd(indices, face_shape, face_valid, positions, normals, uvs,
                 rays_local: Rays) -> Hit:
            me = jax.lax.axis_index(axis)
            nd = jax.lax.axis_size(axis)
            local_geom = Geometry(
                positions=positions, normals=normals, uvs=uvs,
                indices=indices, face_shape=face_shape, face_valid=face_valid,
            )
            n = rays_local.o.shape[0]
            best0 = Hit(
                t=jnp.full((n,), F32_MAX),
                prim=jnp.full((n,), -1, jnp.int32),
                shape=jnp.full((n,), -1, jnp.int32),
                u=jnp.zeros((n,)),
                v=jnp.zeros((n,)),
                valid=jnp.zeros((n,), bool),
            )
            perm = [(i, (i + 1) % nd) for i in range(nd)]

            def step(k, carry):
                rays_c, best = carry
                # the ray block currently resident here started at
                # device (me - k); its prim ids must index the shard
                # tables of THIS device
                base = me * fpad
                best = _local_intersect(local_geom, rays_c, base, best)
                moved = jax.lax.ppermute((rays_c, best), axis, perm)
                return moved

            rays_f, best_f = jax.lax.fori_loop(0, nd, step, (rays_local, best0))
            # nd permutes = full cycle: every block is home again
            return best_f

        fn = shard_map(
            spmd,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis), P(axis),  # face tables: sharded
                P(), P(), P(),  # vertex attribute arrays: replicated
                jax.tree.map(lambda _: P(axis), Rays(o=0, d=0, tmin=0, tmax=0, active=0)),
            ),
            out_specs=jax.tree.map(
                lambda _: P(axis),
                Hit(t=0, prim=0, shape=0, u=0, v=0, valid=0),
            ),
            check_rep=False,
        )
        return fn(geom.indices, geom.face_shape, geom.face_valid,
                  geom.positions, geom.normals, geom.uvs, rays)

    def ring_occluded(geom: Geometry, rays: Rays) -> jax.Array:
        def spmd(indices, face_shape, face_valid, positions, normals, uvs,
                 rays_local: Rays) -> jax.Array:
            from ..accel.brute import occluded_brute

            local_geom = Geometry(
                positions=positions, normals=normals, uvs=uvs,
                indices=indices, face_shape=face_shape, face_valid=face_valid,
            )
            nd = jax.lax.axis_size(axis)
            perm = [(i, (i + 1) % nd) for i in range(nd)]

            def step(k, carry):
                rays_c, blocked = carry
                blocked = blocked | occluded_brute(local_geom, rays_c)
                return jax.lax.ppermute((rays_c, blocked), axis, perm)

            n = rays_local.o.shape[0]
            _, blocked = jax.lax.fori_loop(
                0, nd, step, (rays_local, jnp.zeros((n,), bool))
            )
            return blocked

        fn = shard_map(
            spmd,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis), P(axis),
                P(), P(), P(),
                jax.tree.map(lambda _: P(axis), Rays(o=0, d=0, tmin=0, tmax=0, active=0)),
            ),
            out_specs=P(axis),
            check_rep=False,
        )
        return fn(geom.indices, geom.face_shape, geom.face_valid,
                  geom.positions, geom.normals, geom.uvs, rays)

    return ring_intersect, ring_occluded


def build_sharded_scene(scene, mesh: Mesh):
    """Shard a scene's face tables over the mesh's rays axis and return
    (sharded_scene, ring_intersector) — the San-Miguel-scale path
    (BASELINE config 4)."""
    n_shards = mesh.shape[RAYS_AXIS]
    geom = shard_faces(scene.geometry, n_shards)
    fpad = geom.indices.shape[0] // n_shards
    scene = scene.replace(geometry=geom)
    intersect, occluded = make_ring_intersector(mesh, n_shards, fpad)

    from ..accel import Intersector

    return scene, Intersector(
        intersect=lambda s, r: intersect(s.geometry, r),
        occluded=lambda s, r: occluded(s.geometry, r),
        accel=None,
    )
