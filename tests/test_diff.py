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
    light_params,
    material_params,
    render_loss_fn,
)
from mcrt_tpu.parallel.render import render_spp_batch
from mcrt_tpu.scene.builders import cornell_box


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
