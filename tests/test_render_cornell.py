"""End-to-end Cornell-box render checks (BASELINE config 1, CPU-runnable).

The minimum slice from SURVEY §7 phase 2: everything later must keep this
image fixed — treat these expectations as the regression anchor."""
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu.config import AccelType, IntegratorConfig, RenderConfig
from mcrt_tpu.renderer import Renderer
from mcrt_tpu.scene.builders import cornell_box


@pytest.fixture(scope="module")
def cornell_image():
    scene, camera = cornell_box()
    cfg = RenderConfig(
        width=64, height=64, spp=32, samples_per_pass=8,
        accel=AccelType.BRUTE, integrator=IntegratorConfig(max_depth=3),
    )
    r = Renderer(scene, camera, cfg)
    img = np.asarray(r.render())
    return img


def test_image_finite_nonzero(cornell_image):
    assert cornell_image.shape == (64, 64, 3)
    assert np.isfinite(cornell_image).all()
    assert cornell_image.mean() > 0.05


def test_wall_colors(cornell_image):
    img = cornell_image
    # rows are bottom-to-top; left wall red-dominant, right wall green-dominant
    left = img[28:36, 2:6].mean((0, 1))
    right = img[28:36, 58:62].mean((0, 1))
    assert left[0] > 2.0 * left[1], f"left wall not red: {left}"
    assert right[1] > 2.0 * right[0], f"right wall not green: {right}"


def test_light_visible_and_bright(cornell_image):
    img = cornell_image
    top_center = img[60:64, 28:36].mean((0, 1))
    rest = img.mean((0, 1))
    assert top_center[0] > 5 * rest[0]


def test_energy_grows_with_depth():
    """More bounces → more (indirect) energy, never less."""
    scene, camera = cornell_box()
    means = []
    for depth in (1, 3):
        cfg = RenderConfig(
            width=32, height=32, spp=16, samples_per_pass=16,
            accel=AccelType.BRUTE, integrator=IntegratorConfig(max_depth=depth),
        )
        r = Renderer(scene, camera, cfg)
        means.append(float(np.asarray(r.render()).mean()))
    assert means[1] > means[0] * 1.05, means


def test_deterministic():
    scene, camera = cornell_box()
    cfg = RenderConfig(width=16, height=16, spp=4, samples_per_pass=4,
                       accel=AccelType.BRUTE)
    img1 = np.asarray(Renderer(scene, camera, cfg).render())
    img2 = np.asarray(Renderer(scene, camera, cfg).render())
    np.testing.assert_array_equal(img1, img2)


def test_mis_unbiased_vs_plain():
    """MIS-weighted NEE must converge to the same image as plain NEE."""
    scene, camera = cornell_box()
    imgs = []
    for use_mis in (False, True):
        cfg = RenderConfig(
            width=24, height=24, spp=256, samples_per_pass=64,
            accel=AccelType.BRUTE,
            integrator=IntegratorConfig(max_depth=2, use_mis=use_mis),
        )
        imgs.append(np.asarray(Renderer(scene, camera, cfg).render()))
    a, b = imgs
    # agree within MC noise on smooth regions (exclude the emitter itself)
    mask = a.max(-1) < 5.0
    diff = np.abs(a - b)[mask].mean()
    scale = a[mask].mean()
    assert diff < 0.1 * scale + 0.02, (diff, scale)


def test_no_lights_renders_black():
    """A scene without lights must render black, not crash (empty Lights
    table guards in lights.py)."""
    from mcrt_tpu.camera.pinhole import PinholeCamera
    from mcrt_tpu.scene.builders import SceneBuffers, quad
    from mcrt_tpu.scene.scene import UberMaterial, build_scene

    sb = SceneBuffers()
    pos, idx = quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1])
    sb.add_mesh(pos, idx, 0)
    p, nrm, uv, i, fs, sm, sl = sb.concat()
    scene = build_scene(p, nrm, uv, i, fs, sm, [UberMaterial(diffuse=(0.5, 0.5, 0.5))])
    cam = PinholeCamera.look_at((0, 2, 3), (0, 0, 0))
    cfg = RenderConfig(width=16, height=16, spp=2, samples_per_pass=2,
                       accel=AccelType.BRUTE)
    img = np.asarray(Renderer(scene, cam, cfg).render())
    assert (img == 0).all()


def test_russian_roulette_unbiased():
    """RR-terminated rendering converges to the same image as fixed-depth
    termination (improvement over the reference; PBRT-style 1/q reweight)."""
    import jax
    import jax.lax as lax

    from mcrt_tpu.accel.brute import intersect_brute, occluded_brute
    from mcrt_tpu.camera.pinhole import pixel_uv
    from mcrt_tpu.config import IntegratorConfig, SamplerConfig
    from mcrt_tpu.core.types import Rays
    from mcrt_tpu.integrators import path as pt
    from mcrt_tpu.sampling import rng as rng_mod
    from mcrt_tpu.scene.builders import cornell_box

    scene, camera = cornell_box()
    w = 16
    n = w * w
    uv = pixel_uv(w, w)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    isect = lambda s, r: intersect_brute(s.geometry, r)
    occl = lambda s, r: occluded_brute(s.geometry, r)

    def converged(cfg, spp=1024):
        @jax.jit
        def run(s0):
            def body(i, acc):
                st = rng_mod.make_stream(SamplerConfig(), s0 + i,
                                         jnp.arange(n))
                return acc + pt.trace(scene, rays, st, cfg, isect, occl)
            return lax.fori_loop(0, spp, body, jnp.zeros((n, 3)))
        return np.asarray(run(jnp.asarray(0))) / spp

    a = converged(IntegratorConfig(max_depth=5))
    b = converged(IntegratorConfig(max_depth=5, rr_start_depth=2))
    mask = a.max(-1) < 5.0  # exclude the emitter pixels
    rel = np.abs(a - b)[mask].mean() / a[mask].mean()
    assert rel < 0.05, rel
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02
