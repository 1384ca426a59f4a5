"""Ray differentials: camera generation, plane transfer, texture LOD.

Covers the reference's differential pipeline: camera differentials
(``PathTracing.cl:22-35``, ``kernel_data.h:266-272``), plane-intersection
transfer + 2x2 solve (``geometry.cl:92-175``), and LOD-driven trilinear
filtering (``textures.cl:127-202``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.accel import build_intersector
from mcrt_tpu.camera.pinhole import PinholeCamera, pixel_uv
from mcrt_tpu.config import AccelType, IntegratorConfig, RenderConfig
from mcrt_tpu.core.types import Rays
from mcrt_tpu.integrators import path as path_integrator
from mcrt_tpu.sampling import rng
from mcrt_tpu.scene.builders import textured_hall
from mcrt_tpu.scene.interaction import compute_interaction
from mcrt_tpu.scene.scene import TEX_DIFFUSE
from mcrt_tpu.scene.textures import compute_lod


def _quad_scene():
    """Unit-uv quad spanning [-1,1]^2 at z=0, camera on +z axis."""
    from mcrt_tpu.scene.builders import SceneBuffers, quad
    from mcrt_tpu.scene.scene import UberMaterial
    from mcrt_tpu.scene.builders import build_scene

    sb = SceneBuffers()
    pos, idx = quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    sb.add_mesh(pos, idx, 0, uvs=uvs)
    positions, normals, uvs_a, indices, face_shape, shape_mat, shape_light = sb.concat()
    scene = build_scene(positions, normals, uvs_a, indices, face_shape,
                        shape_mat, [UberMaterial(diffuse=(1, 1, 1))],
                        shape_light=shape_light)
    camera = PinholeCamera.look_at(eye=(0.0, 0.0, 5.0), target=(0.0, 0.0, 0.0),
                                   fov_deg=45.0, aspect=1.0)
    return scene, camera


def test_transfer_matches_analytic_footprint():
    """Central pixel's duvdx on a fronto-parallel quad equals the analytic
    pixel footprint: (2*dist*tan(fov/2)/W world units) * (0.5 uv per world
    unit)."""
    scene, camera = _quad_scene()
    w = h = 64
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    diff = camera.generate_ray_differentials(uv, w, h)
    cfg = RenderConfig(width=w, height=h, accel=AccelType.BRUTE)
    inter = build_intersector(scene, cfg)
    hit = inter.intersect(scene, rays)
    it = compute_interaction(scene, rays, hit, diff=diff)

    center = (h // 2) * w + (w // 2)
    duvdx = np.asarray(it.duvdx)[center]
    duvdy = np.asarray(it.duvdy)[center]
    film_world = 2.0 * 5.0 * np.tan(np.deg2rad(22.5))  # film width at z=0
    expected = film_world / w * 0.5  # quad maps 2 world units -> 1 uv unit
    assert abs(abs(duvdx[0]) - expected) < 0.15 * expected
    assert abs(duvdx[1]) < 1e-4  # x-step moves u only
    assert abs(abs(duvdy[1]) - expected) < 0.15 * expected
    assert abs(duvdy[0]) < 1e-4
    # misses carry zero footprint
    missed = ~np.asarray(hit.valid)
    assert missed.any()
    assert np.all(np.asarray(it.duvdx)[missed] == 0.0)


def test_textured_hall_selects_lod_above_zero():
    """Grazing floor view in textured_hall must select mip LOD > 1 at far
    distances (the round-2 VERDICT's 'done' gate)."""
    scene, camera = textured_hall()
    w = h = 128
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    diff = camera.generate_ray_differentials(uv, w, h)
    cfg = RenderConfig(width=w, height=h, accel=AccelType.BRUTE)
    inter = build_intersector(scene, cfg)
    hit = inter.intersect(scene, rays)
    it = compute_interaction(scene, rays, hit, diff=diff)

    tex = jnp.take(scene.materials.tex[:, TEX_DIFFUSE],
                   jnp.maximum(it.material, 0))
    lod = np.asarray(compute_lod(scene.textures, tex, it.duvdx, it.duvdy))
    floor_hits = np.asarray(hit.valid & (it.material == 0))
    assert floor_hits.sum() > 100
    assert lod[floor_hits].max() > 1.0  # far floor minifies
    assert lod[floor_hits].min() < lod[floor_hits].max() - 1.0  # varies w/ dist


def _checker_floor_scene():
    """Single directional light over a finely-checkered floor: the render is
    pure texture signal (deterministic NEE), isolating minification."""
    from mcrt_tpu.scene.builders import (
        SceneBuffers, _checkerboard, build_scene, make_lights, quad,
    )
    from mcrt_tpu.scene.scene import (
        LIGHT_DIRECTIONAL, N_TEX_SLOTS, UberMaterial,
    )
    from mcrt_tpu.scene.textures import AtlasBuilder

    atlas_b = AtlasBuilder()
    tid = atlas_b.add(_checkerboard(tiles=64, c0=(0.9, 0.9, 0.9),
                                    c1=(0.1, 0.1, 0.1)))
    tex = np.full((N_TEX_SLOTS,), -1, np.int32)
    tex[0] = tid  # TEX_DIFFUSE
    sb = SceneBuffers()
    pos, idx = quad([-20, 0, 20], [20, 0, 20], [20, 0, -20], [-20, 0, -20])
    uvs = np.asarray([[0, 0], [8, 0], [8, 8], [0, 8]], np.float32)
    sb.add_mesh(pos, idx, 0, uvs=uvs)
    positions, normals, uvs_a, indices, face_shape, shape_mat, shape_light = sb.concat()
    lights = make_lights(
        [{"type": LIGHT_DIRECTIONAL, "direction": (0.0, -1.0, 0.0),
          "intensity": (3.0, 3.0, 3.0)}],
        positions, indices, face_shape,
    )
    scene = build_scene(positions, normals, uvs_a, indices, face_shape,
                        shape_mat, [UberMaterial(diffuse=(1, 1, 1), tex=tex)],
                        lights=lights, shape_light=shape_light,
                        textures=atlas_b.build())
    camera = PinholeCamera.look_at(eye=(0.0, 1.0, 18.0), target=(0.0, 0.5, 0.0),
                                   fov_deg=50.0, aspect=1.0)
    return scene, camera


def test_differentials_reduce_minification_aliasing():
    """Far-field checker floor: with mips fed by real differentials, the
    pixel-to-pixel gradient in the distant strip drops vs the LOD-0 render
    (the minification-aliasing gate from the round-2 VERDICT)."""
    scene, camera = _checker_floor_scene()
    w = h = 96
    uv = pixel_uv(w, h)
    o, d = camera.generate_rays(uv)
    rays = Rays.make(o, d)
    diff = camera.generate_ray_differentials(uv, w, h)
    cfg = RenderConfig(width=w, height=h, accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=1,
                                                   enable_shadows=False))
    inter = build_intersector(scene, cfg)
    stream = rng.make_stream(cfg.sampler, jnp.asarray(0), jnp.arange(w * h))

    kw = dict(cfg=cfg.integrator, intersect=inter.intersect,
              occluded=inter.occluded)
    img_flat = path_integrator.trace(scene, rays, stream, diff=diff, **kw)
    img_aliased = path_integrator.trace(scene, rays, stream, diff=None, **kw)
    img = np.asarray(img_flat).reshape(h, w, 3)
    img0 = np.asarray(img_aliased).reshape(h, w, 3)

    # select strongly-minified floor pixels by their actual LOD
    hit = inter.intersect(scene, rays)
    it = compute_interaction(scene, rays, hit, diff=diff)
    tex = jnp.take(scene.materials.tex[:, TEX_DIFFUSE],
                   jnp.maximum(it.material, 0))
    lod = np.asarray(compute_lod(scene.textures, tex, it.duvdx, it.duvdy))
    far = (np.asarray(hit.valid & (it.material == 0))
           & (lod > 2.0)).reshape(h, w)
    pair = far[:, :-1] & far[:, 1:]  # adjacent-pixel pairs, both far floor
    assert pair.sum() > 200
    grad = np.abs(np.diff(img, axis=1)).mean(-1)[pair].mean()
    grad0 = np.abs(np.diff(img0, axis=1)).mean(-1)[pair].mean()
    assert grad < 0.5 * grad0, (grad, grad0)
