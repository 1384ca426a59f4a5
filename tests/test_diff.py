"""Differentiability: gradients vs finite differences (BASELINE config 5
target: pixel-gradient allclose), plus end-to-end inverse rendering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.config import AccelType, IntegratorConfig, RenderConfig
from mcrt_tpu.diff.estimators import (
    InverseRenderer,
    full_params,
    light_geometry_params,
    light_params,
    material_params,
    render_loss_fn,
    texture_params,
    with_float_texels,
)
from mcrt_tpu.parallel.render import render_spp_batch
from mcrt_tpu.scene.builders import cornell_box


def _point_light_scene(light_pos=(0.3, 1.5, 0.2)):
    """Open floor + box lit by one point light: every NEE path is smooth in
    the light position (no silhouettes), so FD matches AD tightly."""
    from mcrt_tpu.camera.pinhole import PinholeCamera
    from mcrt_tpu.scene.builders import SceneBuffers, box, quad
    from mcrt_tpu.scene.scene import (
        LIGHT_POINT, UberMaterial, build_scene, make_lights,
    )

    sb = SceneBuffers()
    pos, idx = quad([-2, 0, 2], [2, 0, 2], [2, 0, -2], [-2, 0, -2])
    sb.add_mesh(pos, idx, 0)
    pos, idx = box([-0.4, 0.0, -0.4], [0.1, 0.6, 0.1])
    sb.add_mesh(pos, idx, 1)
    positions, normals, uvs, indices, face_shape, shape_mat, shape_light = sb.concat()
    materials = [
        UberMaterial(diffuse=(0.7, 0.7, 0.7)),
        UberMaterial(diffuse=(0.2, 0.4, 0.6)),
    ]
    lights = make_lights(
        [{"type": LIGHT_POINT, "position": light_pos,
          "intensity": (6.0, 5.0, 4.0)}],
        positions, indices, face_shape,
    )
    scene = build_scene(
        positions, normals, uvs, indices, face_shape, shape_mat, materials,
        lights=lights, shape_light=shape_light,
    )
    camera = PinholeCamera.look_at(
        eye=(0.0, 2.0, 3.0), target=(0.0, 0.3, 0.0), fov_deg=45.0, aspect=1.0
    )
    return scene, camera


def _setup(spp=16, size=16, depth=2):
    scene, camera = cornell_box()
    cfg = RenderConfig(width=size, height=size, spp=spp, accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=depth))
    intersector = build_intersector(scene, cfg)
    frames = jnp.arange(spp, dtype=jnp.int32)
    return scene, camera, cfg, intersector, frames


def _image_sum_fn(scene, camera, cfg, intersector, frames, view):
    """Scalar functional of the image (sum) as a function of params.
    Same fixed RNG streams for every evaluation -> finite differences are
    exact up to float precision, not MC noise."""

    def f(params):
        s = view.set(scene, params)
        img = render_spp_batch(s, camera, frames, cfg, intersector)
        return jnp.sum(img)

    return f


@pytest.mark.parametrize("pname,eps", [("diffuse", 1e-3), ("roughness", 1e-3)])
def test_material_grad_matches_fd(pname, eps):
    scene, camera, cfg, intersector, frames = _setup()
    view = material_params()
    f = jax.jit(_image_sum_fn(scene, camera, cfg, intersector, frames, view))
    params = view.get(scene)
    g = jax.jit(jax.grad(lambda p: f(p)))(params)

    # probe a handful of coordinates with central differences
    rng = np.random.default_rng(0)
    arr = np.asarray(params[pname])
    flat = arr.reshape(-1)
    picks = rng.choice(len(flat), size=min(4, len(flat)), replace=False)
    for k in picks:
        pp = {kk: jnp.asarray(np.asarray(v)) for kk, v in params.items()}
        plus = np.array(flat, np.float64); plus[k] += eps
        minus = np.array(flat, np.float64); minus[k] -= eps
        fp = float(f({**pp, pname: jnp.asarray(plus.reshape(arr.shape), jnp.float32)}))
        fm = float(f({**pp, pname: jnp.asarray(minus.reshape(arr.shape), jnp.float32)}))
        fd = (fp - fm) / (2 * eps)
        ad = float(np.asarray(g[pname]).reshape(-1)[k])
        # MC estimator is deterministic here; tolerance covers f32 roundoff
        assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad), 1.0), (
            pname, k, fd, ad
        )


def test_light_intensity_grad_matches_fd():
    scene, camera, cfg, intersector, frames = _setup()
    view = light_params()
    f = jax.jit(_image_sum_fn(scene, camera, cfg, intersector, frames, view))
    params = view.get(scene)
    g = jax.jit(jax.grad(lambda p: f(p)))(params)
    # radiance is linear in intensity -> FD must match tightly
    eps = 1e-2
    arr = np.asarray(params["intensity"])
    for k in range(3):
        plus = np.array(arr, np.float64); plus.reshape(-1)[k] += eps
        minus = np.array(arr, np.float64); minus.reshape(-1)[k] -= eps
        fp = float(f({"intensity": jnp.asarray(plus, jnp.float32)}))
        fm = float(f({"intensity": jnp.asarray(minus, jnp.float32)}))
        fd = (fp - fm) / (2 * eps)
        ad = float(np.asarray(g["intensity"]).reshape(-1)[k])
        assert abs(fd - ad) <= 0.02 * max(abs(fd), 1.0), (k, fd, ad)


def test_grads_finite_and_nonzero_with_lbvh():
    """Gradients also flow through the LBVH traversal path."""
    scene, camera = cornell_box()
    cfg = RenderConfig(width=12, height=12, spp=4, accel=AccelType.LBVH,
                       integrator=IntegratorConfig(max_depth=2))
    intersector = build_intersector(scene, cfg)
    view = material_params()

    def f(params):
        s = view.set(scene, params)
        img = render_spp_batch(s, camera, jnp.arange(4, dtype=jnp.int32), cfg, intersector)
        return jnp.sum(img)

    g = jax.jit(jax.grad(f))(view.get(scene))
    for k, v in g.items():
        assert bool(jnp.isfinite(v).all()), k
    assert float(jnp.abs(g["diffuse"]).sum()) > 0


def test_light_position_grad_matches_fd():
    """Point-light position gradients (reparameterized NEE) vs central
    differences — round-3 widened differentiability."""
    scene, camera = _point_light_scene()
    cfg = RenderConfig(width=16, height=16, spp=8, accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=2))
    intersector = build_intersector(scene, cfg)
    frames = jnp.arange(8, dtype=jnp.int32)
    view = light_geometry_params()
    f = jax.jit(_image_sum_fn(scene, camera, cfg, intersector, frames, view))
    params = view.get(scene)
    g = jax.jit(jax.grad(lambda p: f(p)))(params)
    eps = 1e-3
    base = np.asarray(params["position"], np.float64)
    for k in range(3):
        plus = base.copy(); plus.reshape(-1)[k] += eps
        minus = base.copy(); minus.reshape(-1)[k] -= eps
        fp = float(f({**params, "position": jnp.asarray(plus, jnp.float32)}))
        fm = float(f({**params, "position": jnp.asarray(minus, jnp.float32)}))
        fd = (fp - fm) / (2 * eps)
        ad = float(np.asarray(g["position"]).reshape(-1)[k])
        assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad), 1.0), (k, fd, ad)
    assert float(np.abs(np.asarray(g["position"])).sum()) > 0


def test_texture_texel_grads_match_fd():
    """Per-texel atlas gradients (bilinear weights) vs central differences."""
    from mcrt_tpu.scene.builders import textured_hall

    scene, camera = textured_hall()
    scene = with_float_texels(scene)
    cfg = RenderConfig(width=12, height=12, spp=4, accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=2))
    intersector = build_intersector(scene, cfg)
    frames = jnp.arange(4, dtype=jnp.int32)
    view = texture_params()
    f = jax.jit(_image_sum_fn(scene, camera, cfg, intersector, frames, view))
    params = view.get(scene)
    g = jax.jit(jax.grad(lambda p: f(p)))(params)
    gt = np.asarray(g["texels"])
    assert np.isfinite(gt).all()
    nz = np.nonzero(np.abs(gt.reshape(-1)) > 1e-4)[0]
    assert len(nz) > 0  # texels under the camera's footprint get gradient
    rng = np.random.default_rng(3)
    base = np.asarray(params["texels"], np.float64)
    eps = 1e-2
    for k in rng.choice(nz, size=min(3, len(nz)), replace=False):
        plus = base.copy(); plus.reshape(-1)[k] += eps
        minus = base.copy(); minus.reshape(-1)[k] -= eps
        fp = float(f({"texels": jnp.asarray(plus, jnp.float32)}))
        fm = float(f({"texels": jnp.asarray(minus, jnp.float32)}))
        fd = (fp - fm) / (2 * eps)
        ad = float(gt.reshape(-1)[k])
        assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad), 1.0), (k, fd, ad)


def test_inverse_rendering_recovers_light_position():
    """Optimize a point light's position from a target image — the
    light-geometry leg of BASELINE config 5."""
    true_pos = (0.3, 1.5, 0.2)
    scene, camera = _point_light_scene(true_pos)
    cfg = RenderConfig(width=16, height=16, spp=8, accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=2))
    intersector = build_intersector(scene, cfg)
    target = render_spp_batch(
        scene, camera, jnp.arange(8, dtype=jnp.int32), cfg, intersector
    )
    wrong, _ = _point_light_scene((-0.2, 1.2, -0.2))
    inv = InverseRenderer(wrong, camera, cfg, light_geometry_params(),
                          learning_rate=0.05)
    recovered, params, losses = inv.run(
        target, steps=80, spp_per_step=8, seed=0, advance_frames=False
    )
    got = np.asarray(recovered.lights.position[0])
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    np.testing.assert_allclose(got, np.asarray(true_pos), atol=0.1)


def test_inverse_rendering_recovers_albedo():
    """Optimize the left-wall albedo from a target image (config 5 slice)."""
    scene, camera = cornell_box()
    cfg = RenderConfig(width=16, height=16, spp=8, accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=2))
    intersector = build_intersector(scene, cfg)
    target_frames = jnp.arange(8, dtype=jnp.int32)
    target = render_spp_batch(scene, camera, target_frames, cfg, intersector)

    # corrupt the red wall's albedo and recover it
    wrong = scene.replace(
        materials=scene.materials.replace(
            diffuse=scene.materials.diffuse.at[1].set(jnp.asarray([0.3, 0.3, 0.3]))
        )
    )
    inv = InverseRenderer(wrong, camera, cfg, material_params(), learning_rate=0.1)
    # same streams as the target render -> deterministic optimization
    recovered, params, losses = inv.run(
        target, steps=60, spp_per_step=8, seed=0, advance_frames=False
    )
    true_albedo = np.asarray(scene.materials.diffuse[1])
    # compare the *applied* (clipped) scene values — raw params may drift
    # outside [0,1] where the clip zeroes their gradient
    got = np.asarray(recovered.materials.diffuse[1])
    assert losses[-1] < losses[0] * 0.1, losses[:3] + losses[-3:]
    np.testing.assert_allclose(got, true_albedo, atol=0.15)
