"""Acceleration-structure registry.

Role of the reference's strategy selection (``calc_intersection_device.cpp``
mapping ``acc.type`` options to intersector instances, :73-150): a config
enum picks the builder + traversal pair; every pair exposes the same
(closest-hit, any-hit) query API as ``IntersectionApi``
(``radeon_rays.h:267-277``).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax

from ..config import AccelType, BVHConfig, RenderConfig
from ..core.types import Hit, Rays
from ..scene.scene import Scene
from .brute import intersect_brute, occluded_brute


class Intersector(NamedTuple):
    """Bound query functions: (scene, rays) -> Hit / blocked mask."""

    intersect: Callable[[Scene, Rays], Hit]
    occluded: Callable[[Scene, Rays], jax.Array]
    accel: object  # accel pytree (donated into jit along with the scene)


def build_intersector(scene: Scene, cfg: RenderConfig) -> Intersector:
    """Build the accel for `scene` and bind query closures — the analogue of
    ``IntersectionApi::Commit`` (``radeon_rays.h:231-241``)."""
    if cfg.accel == AccelType.BRUTE:
        return Intersector(
            intersect=lambda s, r: intersect_brute(s.geometry, r),
            occluded=lambda s, r: occluded_brute(s.geometry, r),
            accel=None,
        )
    if cfg.accel in (AccelType.LBVH, AccelType.LBVH_PALLAS):
        from .lbvh import build_lbvh
        from .traverse import intersect_bvh, occluded_bvh

        bvh = build_lbvh(scene.geometry, cfg.bvh)
        if cfg.accel == AccelType.LBVH_PALLAS:
            from .pallas_traverse import intersect_bvh_pallas, occluded_bvh_pallas

            return Intersector(
                intersect=lambda s, r: intersect_bvh_pallas(s.geometry, bvh, r),
                occluded=lambda s, r: occluded_bvh_pallas(s.geometry, bvh, r),
                accel=bvh,
            )
        return Intersector(
            intersect=lambda s, r: intersect_bvh(s.geometry, bvh, r, cfg.bvh),
            occluded=lambda s, r: occluded_bvh(s.geometry, bvh, r, cfg.bvh),
            accel=bvh,
        )
    raise ValueError(f"unknown accel {cfg.accel}")
