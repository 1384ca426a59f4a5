"""Demo scene descriptors (PathTracingApp.cpp:348-407 analogue): each
BASELINE-config stand-in builds and renders finite, non-black images."""
import numpy as np
import pytest

from mcrt_tpu import RenderConfig, Renderer
from mcrt_tpu.config import (
    AccelType, IntegratorConfig, SamplerConfig, SamplerType,
)
from mcrt_tpu.scene.builders import glass_gallery, icosphere, textured_hall


def test_icosphere_geometry():
    p, idx, n = icosphere((1.0, 2.0, 3.0), 0.5, subdiv=2)
    r = np.linalg.norm(p - np.asarray([1.0, 2.0, 3.0]), axis=1)
    np.testing.assert_allclose(r, 0.5, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    assert idx.shape == (20 * 4 ** 2, 3)


@pytest.mark.parametrize("build,sampler", [
    (glass_gallery, SamplerType.RANDOM),
    (textured_hall, SamplerType.SOBOL),
])
def test_demo_scene_renders(build, sampler):
    scene, camera = build()
    cfg = RenderConfig(width=32, height=32, spp=4, samples_per_pass=4,
                       accel=AccelType.LBVH,
                       sampler=SamplerConfig(type=sampler),
                       integrator=IntegratorConfig(max_depth=3))
    img = np.asarray(Renderer(scene, camera, cfg).render())
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_textured_hall_has_textures_and_lights():
    scene, _ = textured_hall()
    assert scene.textures.num == 3
    assert int(scene.lights.num) == 2
