"""Two-level (instanced) intersection: shared object-space BLAS + per-
instance transforms.

Role of the reference's two-level intersector
(``src/intersector/intersector_2level.cpp``; instances created via
``IntersectionApi::CreateInstance``, ``radeon_rays.h:214-227``): N instances
of a mesh share ONE geometry/BVH allocation; traversal transforms each ray
into instance object space and intersects the shared structure, returning
(shape id, prim id) like the flat path.  This is the memory-scalable
alternative to ``SceneBuffers.add_instance``'s world-space bake-out, which
costs a full vertex+face copy per instance (measured: bunny_field at
grid=7 bakes 49 x 5,002 faces = 245k face records ~ 31 MB of face_attrs +
accel tables vs 640 KB shared here — a ~49x memory ratio, linear in the
instance count).

TPU-native shape: the instance loop is a ``lax.fori_loop`` whose body is
the (single, shared) Pallas blocked query on transformed rays — one traced
query regardless of instance count, executed I times with different
transforms; the per-instance running best is merged exactly like the
sharded ring's.  Instance-level culling happens inside the shared query's
own per-tile AABB cull (rays that miss the instance's bounds produce empty
visit lists), so a miss costs only the cull phase.

Integration contract (mirrors the reference): the query returns the
instance's SHAPE id; shading resolves per-shape transforms/materials from
the shape table (``RTShape`` carries the world transform,
``kernel_data.h:36-52``).  t values are reported in WORLD units (affine
transforms supported; directions are not re-normalized in object space, so
t is preserved under the instance map exactly like
``intersector_2level.cpp`` does it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.types import Hit, Rays
from ..scene.scene import Geometry
from .pallas_blocked import BlockedAccel, build_blocked, intersect_blocked

F32_MAX = float(jnp.finfo(jnp.float32).max)


class TwoLevelAccel(struct.PyTreeNode):
    """Shared BLAS + instance table."""

    blas: BlockedAccel  # object-space blocked accel of the shared mesh
    world_to_object: jax.Array  # (I, 4, 4)
    shape_id: jax.Array  # (I,) i32 shape id reported for hits
    num_instances: int = struct.field(pytree_node=False)


def build_two_level(source: Geometry, to_world: np.ndarray,
                    shape_ids: np.ndarray, cfg=None) -> TwoLevelAccel:
    """Build from one object-space source mesh + (I, 4, 4) instance
    transforms (``CreateInstance`` + ``Commit``)."""
    blas = build_blocked(source, cfg)
    tw = np.asarray(to_world, np.float32)
    w2o = np.linalg.inv(tw).astype(np.float32)
    return TwoLevelAccel(
        blas=blas,
        world_to_object=jnp.asarray(w2o),
        shape_id=jnp.asarray(np.asarray(shape_ids, np.int32)),
        num_instances=tw.shape[0],
    )


def _transform_rays(rays: Rays, m: jax.Array) -> Rays:
    """Affine ray transform into object space.  Directions are NOT
    normalized, so the object-space t equals the world-space t."""
    o = rays.o @ m[:3, :3].T + m[:3, 3]
    d = rays.d @ m[:3, :3].T
    return rays.replace(o=o, d=d)


def intersect_two_level(source: Geometry, accel: TwoLevelAccel,
                        rays: Rays) -> Hit:
    """Closest hit over all instances; ``shape`` is the instance's shape id,
    ``prim`` indexes the SHARED source mesh faces."""
    n = rays.n
    best = Hit(
        t=jnp.full((n,), F32_MAX),
        prim=jnp.full((n,), -1, jnp.int32),
        shape=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,)),
        v=jnp.zeros((n,)),
        valid=jnp.zeros((n,), bool),
    )

    def body(i, best):
        m = accel.world_to_object[i]
        r_obj = _transform_rays(rays, m)
        # clip tmax to the current best so already-beaten instances
        # terminate their traversal early
        r_obj = r_obj.replace(tmax=jnp.minimum(r_obj.tmax, best.t))
        h = intersect_blocked(source, accel.blas, r_obj)
        better = h.valid & (h.t < best.t)
        sid = accel.shape_id[i]
        return Hit(
            t=jnp.where(better, h.t, best.t),
            prim=jnp.where(better, h.prim, best.prim),
            shape=jnp.where(better, sid, best.shape),
            u=jnp.where(better, h.u, best.u),
            v=jnp.where(better, h.v, best.v),
            valid=best.valid | better,
        )

    return jax.lax.fori_loop(0, accel.num_instances, body, best)


def occluded_two_level(source: Geometry, accel: TwoLevelAccel,
                       rays: Rays) -> jax.Array:
    from .pallas_blocked import occluded_blocked

    def body(i, carry):
        rays_c, blocked = carry
        m = accel.world_to_object[i]
        r_obj = _transform_rays(rays_c, m)
        b = occluded_blocked(source, accel.blas, r_obj)
        # deactivate blocked lanes for the remaining instances
        return rays_c.replace(active=rays_c.active & ~b), blocked | b

    n = rays.n
    _, blocked = jax.lax.fori_loop(
        0, accel.num_instances, body, (rays, jnp.zeros((n,), bool))
    )
    return blocked
