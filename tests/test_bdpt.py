"""BDPT correctness vs the unidirectional path tracer.

Validation strategy mirrors the reference's own cross-check: restricting
BDPT to s=1 strategies must reproduce the forward PT
(``SHOW_REGULAR_PATH_TRACER_RESULTS``, ``BDPT.cl:18``); the full estimator
must agree with PT on converged jittered renders (both unbiased).
"""
import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu.accel.brute import intersect_brute, occluded_brute
from mcrt_tpu.camera.pinhole import pixel_uv
from mcrt_tpu.config import (
    AccelType,
    IntegratorConfig,
    IntegratorType,
    RenderConfig,
    SamplerConfig,
)
from mcrt_tpu.core.types import Rays
from mcrt_tpu.integrators import bdpt, path as pt
from mcrt_tpu.sampling import rng
from mcrt_tpu.scene.builders import cornell_box

W = 16
N = W * W
ISECT = lambda s, r: intersect_brute(s.geometry, r)
OCCL = lambda s, r: occluded_brute(s.geometry, r)


def _converged(scene, camera, cfg, use_bdpt, spp=1024, s1_only=False, seed=0,
               jitter=True):
    def make_rays(key):
        if jitter:
            jit = jax.random.uniform(key, (N, 2)) - 0.5
            uv = pixel_uv(W, W, jitter=jit)
        else:
            uv = pixel_uv(W, W)
        o, d = camera.generate_rays(uv)
        return Rays.make(o, d)

    @jax.jit
    def run(s0):
        def body(i, acc):
            st = rng.make_stream(SamplerConfig(), s0 + i, jnp.arange(N))
            rays = make_rays(jax.random.fold_in(jax.random.PRNGKey(99), s0 + i))
            if use_bdpt:
                r = bdpt.trace(scene, camera, rays, st, cfg, ISECT, OCCL,
                               s1_only=s1_only)
            else:
                r = pt.trace(scene, rays, st, cfg, ISECT, OCCL)
            return acc + r

        return lax.fori_loop(0, spp, body, jnp.zeros((N, 3)))

    return np.asarray(run(jnp.asarray(seed))) / spp


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


def test_bdpt_finite(cornell):
    scene, camera = cornell
    cfg = IntegratorConfig(max_depth=2)
    uv = pixel_uv(W, W)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    st = rng.make_stream(SamplerConfig(), jnp.asarray(0), jnp.arange(N))
    L = bdpt.trace(scene, camera, rays, st, cfg, ISECT, OCCL)
    assert bool(jnp.isfinite(L).all())
    assert float(L.mean()) > 0.01


def test_s1_only_matches_forward_pt(cornell):
    """The reference's PT cross-check: s=1-restricted BDPT = NEE-only PT on
    non-emitter pixels."""
    scene, camera = cornell
    cfg = IntegratorConfig(max_depth=2)
    # unjittered center rays: emitter pixels are cleanly identifiable, so
    # the s=0-less restriction can be masked out exactly
    a = _converged(scene, camera, cfg, use_bdpt=False, spp=512, jitter=False)
    b = _converged(scene, camera, cfg, use_bdpt=True, s1_only=True, spp=512,
                   jitter=False)
    mask = a.max(-1) < 5.0  # exclude directly-visible emitter (s=0 skipped)
    rel = np.abs(a - b)[mask].mean() / a[mask].mean()
    assert rel < 0.06, rel


def test_full_bdpt_matches_pt_converged(cornell):
    """Both estimators are unbiased: converged jittered renders agree."""
    scene, camera = cornell
    cfg = IntegratorConfig(max_depth=2)
    a = _converged(scene, camera, cfg, use_bdpt=False, spp=1024)
    b = _converged(scene, camera, cfg, use_bdpt=True, spp=1024)
    mask = a.max(-1) < 5.0
    rel = np.abs(a - b)[mask].mean() / a[mask].mean()
    assert rel < 0.04, rel
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02


def test_bdpt_through_renderer(cornell):
    """End-to-end: IntegratorType.BDPT through the Renderer facade."""
    from mcrt_tpu.renderer import Renderer

    scene, camera = cornell
    cfg = RenderConfig(
        width=16, height=16, spp=8, samples_per_pass=8, accel=AccelType.BRUTE,
        integrator=IntegratorConfig(type=IntegratorType.BDPT, max_depth=2),
    )
    img = np.asarray(Renderer(scene, camera, cfg).render())
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_bdpt_nonsquare_film_matches_pt(cornell):
    """t=1 splats must address the true (W, H) film — not a sqrt(n) square —
    and must be routed through the renderer's Morton ray ordering.  A
    converged non-square BDPT render through the Renderer agrees with PT
    per-pixel (both unbiased)."""
    from mcrt_tpu.renderer import Renderer

    scene, camera = cornell
    w, h, spp = 32, 16, 512
    imgs = {}
    for ityp in (IntegratorType.PATH, IntegratorType.BDPT):
        cfg = RenderConfig(
            width=w, height=h, spp=spp, samples_per_pass=64,
            accel=AccelType.BRUTE,
            integrator=IntegratorConfig(type=ityp, max_depth=2),
        )
        imgs[ityp] = np.asarray(Renderer(scene, camera, cfg).render())
    a, b = imgs[IntegratorType.PATH], imgs[IntegratorType.BDPT]
    assert a.shape == b.shape == (h, w, 3)
    mask = a.max(-1) < 5.0  # exclude the directly visible emitter
    rel = np.abs(a - b)[mask].mean() / a[mask].mean()
    # a square-film (or unrouted) splat would scramble whole rows: rel > 0.5
    assert rel < 0.08, rel


def _directional_scene():
    """Open box lit ONLY by a directional light: light subpaths (s>=2) carry
    indirect bounce light that s=1/NEE alone cannot, so PT/BDPT agreement
    exercises the directional sample_le/pdf_le walk (``lights.cl:148-224``)."""
    from mcrt_tpu.scene.builders import SceneBuffers, box, quad
    from mcrt_tpu.scene.scene import (
        LIGHT_DIRECTIONAL, UberMaterial, build_scene, make_lights,
    )
    from mcrt_tpu.camera.pinhole import PinholeCamera

    sb = SceneBuffers()
    s = 1.0
    pos, idx = quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s])
    sb.add_mesh(pos, idx, 0)  # floor
    pos, idx = quad([-s, 0, -s], [s, 0, -s], [s, 2 * s, -s], [-s, 2 * s, -s])
    sb.add_mesh(pos, idx, 1)  # back wall (red)
    pos, idx = box([-0.5, 0.0, -0.5], [0.0, 0.8, 0.0])
    sb.add_mesh(pos, idx, 0)
    positions, normals, uvs, indices, face_shape, shape_mat, shape_light = sb.concat()
    materials = [
        UberMaterial(diffuse=(0.73, 0.73, 0.73)),
        UberMaterial(diffuse=(0.63, 0.065, 0.05)),
    ]
    lights = make_lights(
        [{"type": LIGHT_DIRECTIONAL, "direction": (0.3, -1.0, -0.4),
          "intensity": (3.0, 2.8, 2.5)}],
        positions, indices, face_shape,
    )
    scene = build_scene(
        positions, normals, uvs, indices, face_shape, shape_mat, materials,
        lights=lights, shape_light=shape_light,
    )
    camera = PinholeCamera.look_at(
        eye=(0.0, 1.2, 3.2), target=(0.0, 0.6, 0.0), fov_deg=40.0, aspect=1.0
    )
    return scene, camera


def test_bdpt_directional_light_subpaths():
    """Full BDPT on a directional-only scene stays unbiased: the s>=2 light
    subpaths started on the scene-radius disk must MIS-combine with s=1
    into the same converged image PT produces."""
    scene, camera = _directional_scene()
    cfg = IntegratorConfig(max_depth=3)
    a = _converged(scene, camera, cfg, use_bdpt=False, spp=768)
    b = _converged(scene, camera, cfg, use_bdpt=True, spp=768)
    rel = np.abs(a - b).mean() / max(a.mean(), 1e-9)
    assert np.isfinite(b).all()
    assert rel < 0.05, rel
    assert abs(a.mean() - b.mean()) / a.mean() < 0.03


def test_bdpt_occlusion_chunking_equivalence(cornell, monkeypatch):
    """The chunked batched-visibility path (ADVICE r4: cap rays per
    occlusion query) must be bit-equivalent to the single-batch path."""
    scene, camera = cornell
    cfg = IntegratorConfig(max_depth=3)
    uv = pixel_uv(W, W)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    st = rng.make_stream(SamplerConfig(), jnp.asarray(0), jnp.arange(N))
    one = jax.jit(lambda s: bdpt.trace(s, camera, rays, st, cfg, ISECT, OCCL))(scene)
    monkeypatch.setattr(bdpt, "OCC_CHUNK_RAYS", 2 * N)  # ~2 strategies/chunk
    many = jax.jit(lambda s: bdpt.trace(s, camera, rays, st, cfg, ISECT, OCCL))(scene)
    np.testing.assert_allclose(np.asarray(one), np.asarray(many), atol=1e-6)
