"""Shared config for the golden-image regression suite.

The render setup mirrors the reference's conformance-test pattern: load the
cornell-box OBJ fixtures with a fixed seed and compare against pinned
results (``radeon_rays_conformance_test_cl.h:78-150`` seeds ``srand`` and
checks hit parity against a brute-force oracle; here the pinned artifact is
the converged image itself, per BASELINE config 1).

The five fixtures cover the uber-material lobes end-to-end: Original
(Lambertian), Glossy (Ns-driven microfacet), Mirror (illum 5 -> kr),
Sphere (mirror sphere), Water (illum 7 -> kr+kt refraction).
"""
from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = "/root/reference/assets/meshes/cornell-box"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# name -> (spp, max_depth): transmissive scenes need more depth
SCENES = {
    "CornellBox-Original": (32, 3),
    "CornellBox-Glossy": (32, 3),
    "CornellBox-Mirror": (32, 4),
    "CornellBox-Sphere": (32, 4),
    "CornellBox-Water": (32, 5),
}

CAMERA = dict(eye=(0.0, 1.0, 3.2), target=(0.0, 1.0, 0.0), fov_deg=40.0)
SIZE = 32


def render_fixture(name: str, accel=None, integrator=None,
                   spp=None, depth=None, size=None) -> np.ndarray:
    from mcrt_tpu import RenderConfig, Renderer
    from mcrt_tpu.config import AccelType, IntegratorConfig, IntegratorType
    from mcrt_tpu.scene.builders import scene_from_obj

    d_spp, d_depth = SCENES[name]
    spp = spp if spp is not None else d_spp
    depth = depth if depth is not None else d_depth
    scene, camera = scene_from_obj(
        os.path.join(FIXTURE_DIR, f"{name}.obj"), camera_kw=CAMERA
    )
    size = size if size is not None else SIZE
    cfg = RenderConfig(
        width=size, height=size, spp=spp, samples_per_pass=spp,
        accel=accel if accel is not None else AccelType.BRUTE,
        integrator=IntegratorConfig(
            type=(integrator if integrator is not None
                  else IntegratorType.PATH),
            max_depth=depth,
        ),
    )
    return np.asarray(Renderer(scene, camera, cfg).render())
