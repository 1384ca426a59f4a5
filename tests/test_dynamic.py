"""Dynamic scene updates + instancing (SURVEY §3.4:
``RTScene::updateDynamicEntities`` → ``SetTransform`` + ``Commit`` + reset)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu import RenderConfig, Renderer
from mcrt_tpu.config import AccelType, IntegratorConfig
from mcrt_tpu.scene.builders import SceneBuffers, box, cornell_box
from mcrt_tpu.scene.dynamic import (
    SceneAnimator, rotation_y, scale, translation, vertex_shape_ids,
)
from mcrt_tpu.scene.scene import LIGHT_MESH

TALL_BOX = 5  # cornell_box shape ids: 0-4 walls, 5-6 boxes, 7 light
LIGHT_SHAPE = 7


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


def test_identity_transform_is_noop(cornell):
    scene, _ = cornell
    anim = SceneAnimator.create(scene)
    out = anim.transformed(jnp.asarray(anim.identity_transforms()))
    np.testing.assert_allclose(
        np.asarray(out.geometry.positions),
        np.asarray(scene.geometry.positions), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.geometry.normals),
        np.asarray(scene.geometry.normals), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.lights.tri_cdf),
        np.asarray(scene.lights.tri_cdf), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.lights.area), np.asarray(scene.lights.area), rtol=1e-5)


def test_translate_moves_only_target_shape(cornell):
    scene, _ = cornell
    anim = SceneAnimator.create(scene)
    out = anim.set_transform(TALL_BOX, translation((0.25, 0.0, 0.0)))
    vs = np.asarray(vertex_shape_ids(scene))
    p0 = np.asarray(scene.geometry.positions)
    p1 = np.asarray(out.geometry.positions)
    moved = vs == TALL_BOX
    np.testing.assert_allclose(p1[moved] - p0[moved],
                               np.broadcast_to([0.25, 0, 0], (moved.sum(), 3)),
                               atol=1e-6)
    np.testing.assert_allclose(p1[~moved], p0[~moved], atol=1e-6)
    # rigid translation keeps normals
    np.testing.assert_allclose(np.asarray(out.geometry.normals),
                               np.asarray(scene.geometry.normals), atol=1e-5)


def test_scaled_light_refreshes_area_and_pdf(cornell):
    scene, _ = cornell
    anim = SceneAnimator.create(scene)
    out = anim.set_transform(LIGHT_SHAPE, scale(2.0))
    a0 = float(scene.lights.area[0])
    a1 = float(out.lights.area[0])
    assert a1 == pytest.approx(4.0 * a0, rel=1e-4)
    cdf = np.asarray(out.lights.tri_cdf)
    assert cdf[-1] == pytest.approx(1.0, abs=1e-5)
    assert np.all(np.diff(cdf) >= -1e-6)


def test_render_after_transform_changes_image(cornell):
    scene, camera = cornell
    cfg = RenderConfig(width=32, height=32, spp=4, samples_per_pass=4,
                       accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=2))
    r = Renderer(scene, camera, cfg)
    img0 = np.asarray(r.render())
    anim = SceneAnimator.create(scene)
    moved = anim.set_transform(TALL_BOX, translation((0.4, 0.0, 0.2)))
    r.update_scene(moved)
    assert int(r.accum.frame) == 0  # accumulation reset (RTScene.cpp:356-391)
    img1 = np.asarray(r.render())
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0).max() > 1e-3


def test_rotation_preserves_mesh_light_area(cornell):
    scene, _ = cornell
    anim = SceneAnimator.create(scene)
    out = anim.set_transform(LIGHT_SHAPE, rotation_y(0.7))
    assert float(out.lights.area[0]) == pytest.approx(
        float(scene.lights.area[0]), rel=1e-4)


def test_add_instance_duplicates_geometry():
    sb = SceneBuffers()
    pos, idx = box([0, 0, 0], [1, 1, 1])
    src = sb.add_mesh(pos, idx, material_id=0)
    inst = sb.add_instance(src, material_id=0,
                           to_world=translation((3.0, 0.0, 0.0)))
    assert inst == src + 1
    positions, normals, uvs, indices, face_shape, *_ = sb.concat()
    n = len(pos)
    np.testing.assert_allclose(positions[n:] - positions[:n],
                               np.broadcast_to([3, 0, 0], (n, 3)), atol=1e-6)
    np.testing.assert_allclose(normals[n:], normals[:n], atol=1e-6)
    # instance faces index into the instance's own vertex block
    inst_faces = indices[face_shape == inst]
    assert inst_faces.min() >= n


def test_stop_at_spp(cornell):
    scene, camera = cornell
    cfg = RenderConfig(width=16, height=16, spp=8, samples_per_pass=1,
                       accel=AccelType.BRUTE, stop_at_spp=3,
                       integrator=IntegratorConfig(max_depth=1))
    r = Renderer(scene, camera, cfg)
    r.render()
    assert int(r.accum.frame) == 3  # paused at stopAtFrame
    r.reset()
    assert int(r.accum.frame) == 0


def test_refit_matches_rebuild_conformance(cornell):
    """refit_blocked (in-jit, keeps the build-time decomposition) must
    return the same closest hits as a from-scratch rebuild on the
    transformed geometry (VERDICT r3 item 6)."""
    import jax

    from mcrt_tpu.accel.pallas_blocked import (
        build_blocked, intersect_blocked, refit_blocked,
    )

    scene, _ = cornell
    anim = SceneAnimator.create(scene)
    t = anim.identity_transforms()
    t[TALL_BOX] = translation((0.3, 0.1, -0.2)) @ rotation_y(0.7)
    moved = anim.transformed(jnp.asarray(t))

    base_acc = build_blocked(scene.geometry)
    refit = jax.jit(lambda g: refit_blocked(base_acc, g))(moved.geometry)
    rebuilt = build_blocked(moved.geometry)

    rng = np.random.RandomState(3)
    n = 512
    pos = np.asarray(moved.geometry.positions)
    lo, hi = pos.min(0), pos.max(0)
    o = rng.uniform(-1, 1, (n, 3)) * (hi - lo) * 0.7 + (lo + hi) / 2
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    from mcrt_tpu.core.types import Rays

    rays = Rays.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    h_refit = intersect_blocked(moved.geometry, refit, rays)
    h_build = intersect_blocked(moved.geometry, rebuilt, rays)
    assert bool((h_refit.valid == h_build.valid).all())
    tr = jnp.where(h_refit.valid, h_refit.t, 0.0)
    tb = jnp.where(h_build.valid, h_build.t, 0.0)
    np.testing.assert_allclose(np.asarray(tr), np.asarray(tb),
                               rtol=1e-5, atol=1e-6)


def test_animated_frames_fused_refit_match_host_rebuild(cornell):
    """N animated frames through make_animated_frame (transform + refit +
    render fused, no host rebuild) must match full host rebuilds."""
    import jax

    from mcrt_tpu.film.accumulate import Accumulator
    from mcrt_tpu.scene.dynamic import make_animated_frame

    scene, camera = cornell
    cfg = RenderConfig(width=16, height=16, spp=1, samples_per_pass=1,
                       accel=AccelType.BLOCKED,
                       integrator=IntegratorConfig(max_depth=2))
    anim = SceneAnimator.create(scene)
    frame_fn = jax.jit(make_animated_frame(anim, camera, cfg))

    for k in range(3):
        t = anim.identity_transforms()
        t[TALL_BOX] = rotation_y(0.4 * k)
        accum = Accumulator.zeros(cfg.width, cfg.height)
        _, accum = frame_fn(jnp.asarray(t), accum, accum.frame)
        img_fused = np.asarray(accum.image)

        moved = anim.transformed(jnp.asarray(t))
        ref = Renderer(moved, camera, cfg)  # host rebuild per frame
        img_ref = np.asarray(ref.render(spp=1))
        np.testing.assert_allclose(img_fused, img_ref, rtol=1e-4, atol=1e-5)


def test_renderer_update_scene_refits_without_rebuild(cornell, monkeypatch):
    """Transform-only edits through ``Renderer.update_scene`` must take the
    in-jit refit path — no host ``build_blocked`` call — and produce the
    same image as a full rebuild (VERDICT r4 item 5; the reference's
    refit-via-Commit from the same entry point, RTScene.cpp:317-391)."""
    scene, camera = cornell
    cfg = RenderConfig(width=16, height=16, spp=2, samples_per_pass=2,
                       accel=AccelType.BLOCKED,
                       integrator=IntegratorConfig(max_depth=2))
    r = Renderer(scene, camera, cfg)
    anim = SceneAnimator.create(scene)
    moved = anim.set_transform(TALL_BOX, translation((0.2, 0.0, 0.1)))

    # any host rebuild after this point is a test failure
    from mcrt_tpu.accel import pallas_blocked

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("build_blocked called on a transform-only edit")

    monkeypatch.setattr(pallas_blocked, "build_blocked", _boom)
    r.update_scene(moved)  # same indices/face_valid leaves -> refit
    img_refit = np.asarray(r.render())

    monkeypatch.undo()
    img_rebuild = np.asarray(Renderer(moved, camera, cfg).render())
    np.testing.assert_allclose(img_refit, img_rebuild, atol=1e-5)
    # and the edit actually changed the image vs the original scene
    img_orig = np.asarray(Renderer(scene, camera, cfg).render())
    assert np.abs(img_refit - img_orig).max() > 1e-3
