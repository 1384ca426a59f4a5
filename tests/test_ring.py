"""Sharded-scene ray-ring intersection tests (8-device CPU mesh).

BASELINE config 4 pattern: face tables sharded across devices on the rays
axis, rays ring-exchanged with ppermute; results must match the replicated
brute-force oracle (ties at equal t may pick either coplanar triangle).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu.accel.brute import intersect_brute, occluded_brute
from mcrt_tpu.camera.pinhole import pixel_uv
from mcrt_tpu.core.types import Rays
from mcrt_tpu.parallel.mesh import make_mesh
from mcrt_tpu.parallel.ring import build_sharded_scene, shard_faces
from mcrt_tpu.scene.builders import cornell_box


@pytest.fixture(scope="module", params=[True, False],
                ids=["blocked", "brute"])
def ring_setup(request):
    """Both ring variants: the production per-shard Pallas blocked accel
    (interpret mode on CPU) and the O(N) brute oracle."""
    scene, camera = cornell_box()
    mesh = make_mesh(n_spp=1, n_rays=len(jax.devices()))
    sscene, inter = build_sharded_scene(scene, mesh,
                                        use_blocked=request.param)
    return scene, camera, mesh, sscene, inter


def test_shard_faces_partitions_all_real_faces():
    scene, _ = cornell_box()
    n_shards = 8
    geom = shard_faces(scene.geometry, n_shards)
    assert geom.indices.shape[0] % n_shards == 0
    n_real_before = int(np.asarray(scene.geometry.face_valid).sum())
    assert int(np.asarray(geom.face_valid).sum()) == n_real_before
    # every real triangle appears exactly once (as a vertex-id multiset)
    before = np.sort(
        np.sort(np.asarray(scene.geometry.indices)[
            np.asarray(scene.geometry.face_valid)], axis=1), axis=0
    )
    after = np.sort(
        np.sort(np.asarray(geom.indices)[np.asarray(geom.face_valid)],
                axis=1), axis=0
    )
    np.testing.assert_array_equal(before, after)


def test_ring_closest_hit_matches_brute(ring_setup):
    scene, camera, mesh, sscene, inter = ring_setup
    uv = pixel_uv(32, 32)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    h_ring = jax.jit(lambda s, r: inter.intersect(s, r))(sscene, rays)
    h_ref = intersect_brute(scene.geometry, rays)
    assert bool((h_ring.valid == h_ref.valid).all())
    t_ring = jnp.where(h_ring.valid, h_ring.t, 0.0)
    t_ref = jnp.where(h_ref.valid, h_ref.t, 0.0)
    assert bool(jnp.allclose(t_ring, t_ref, rtol=1e-5, atol=1e-6))
    # hit identity: the ring's prim indexes the sharded tables; compare the
    # actual triangle geometry (allowing equal-t coplanar ties via t check)
    pr = jnp.maximum(h_ring.prim, 0)
    p0r, p1r, p2r = sscene.geometry.face_vertices(pr)
    # recompute t from ring hit: bary point must lie on the ray
    w = 1.0 - h_ring.u - h_ring.v
    hit_p = w[:, None] * p0r + h_ring.u[:, None] * p1r + h_ring.v[:, None] * p2r
    t_re = jnp.linalg.norm(hit_p - rays.o, axis=-1)
    ok = ~h_ring.valid | jnp.isclose(t_re, h_ring.t, rtol=1e-3, atol=1e-3)
    assert bool(ok.all())


def test_ring_occlusion_matches_brute(ring_setup):
    scene, camera, mesh, sscene, inter = ring_setup
    rng = np.random.RandomState(11)
    n = 512
    pos = np.asarray(scene.geometry.positions)
    lo, hi = pos.min(0), pos.max(0)
    o = rng.uniform(-1, 1, (n, 3)) * (hi - lo) * 0.8 + (lo + hi) / 2
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    ob = occluded_brute(scene.geometry, rays)
    og = jax.jit(lambda s, r: inter.occluded(s, r))(sscene, rays)
    assert bool((ob == og).all())


def test_ring_renders_cornell(ring_setup):
    """End-to-end: full path-traced sample through the ring intersector."""
    scene, camera, mesh, sscene, inter = ring_setup
    from mcrt_tpu.config import IntegratorConfig, RenderConfig
    from mcrt_tpu.renderer import render_sample

    cfg = RenderConfig(width=32, height=32, spp=1,
                       integrator=IntegratorConfig(max_depth=2))
    radiance, _ = jax.jit(
        lambda s, f: render_sample(s, camera, f, cfg, inter)
    )(sscene, jnp.asarray(0))
    assert bool(jnp.isfinite(radiance).all())
    assert float(radiance.mean()) > 0.0
    # and it must MATCH the replicated-scene render (same RNG streams):
    # catches face-indexed side tables not being remapped to shard order
    from mcrt_tpu.accel import build_intersector
    from mcrt_tpu.config import AccelType

    import dataclasses

    rep = build_intersector(scene, dataclasses.replace(cfg,
                                                       accel=AccelType.BRUTE))
    ref, _ = jax.jit(
        lambda s, f: render_sample(s, camera, f, cfg, rep)
    )(scene, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(radiance), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_bdpt_through_ring(ring_setup):
    """BDPT through the sharded-scene ray ring (VERDICT r3 item 3c): the
    batched connection-visibility query and both subpath walks must run on
    the ring intersector and match the replicated-scene BDPT render."""
    scene, camera, mesh, sscene, inter = ring_setup
    from mcrt_tpu.accel import build_intersector
    from mcrt_tpu.config import (
        AccelType, IntegratorConfig, IntegratorType, RenderConfig,
    )
    from mcrt_tpu.renderer import render_sample

    cfg = RenderConfig(
        width=16, height=16, spp=1, accel=AccelType.BRUTE,
        integrator=IntegratorConfig(type=IntegratorType.BDPT, max_depth=2),
    )
    ring_img, _ = jax.jit(
        lambda s, f: render_sample(s, camera, f, cfg, inter)
    )(sscene, jnp.asarray(0))
    rep = build_intersector(scene, cfg)
    ref_img, _ = jax.jit(
        lambda s, f: render_sample(s, camera, f, cfg, rep)
    )(scene, jnp.asarray(0))
    assert bool(jnp.isfinite(ring_img).all())
    np.testing.assert_allclose(np.asarray(ring_img), np.asarray(ref_img),
                               rtol=1e-4, atol=1e-5)
