"""Sobol sampler: sequence properties, stratification, integration error."""
import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.config import SamplerConfig, SamplerType
from mcrt_tpu.sampling import rng
from mcrt_tpu.sampling.sobol import sobol_matrices, sobol_sample_scrambled


def _samples(n_frames, n_pixels=4, dims=2, seed=0):
    """(frames, pixels, dims) scrambled sobol samples as the renderer draws
    them: one index per frame, fixed pixel scramble."""
    out = []
    for f in range(n_frames):
        s = rng.make_stream(
            SamplerConfig(type=SamplerType.SOBOL, seed=seed),
            jnp.asarray(f), jnp.arange(n_pixels),
        )
        u, _ = rng.next_2d(s)
        out.append(np.asarray(u))
    return np.stack(out)  # (F, N, 2)


def test_range_and_determinism():
    a = _samples(8)
    b = _samples(8)
    assert (a >= 0).all() and (a < 1).all()
    np.testing.assert_array_equal(a, b)


def test_base2_stratification():
    """First 2^m samples of a (0,1)-sequence: exactly one per 1/2^m bin in
    each dimension (digit XOR scrambling preserves this)."""
    pts = _samples(16)[:, 0, :]  # one pixel, 16 frames, 2 dims
    for d in range(2):
        bins = np.floor(pts[:, d] * 16).astype(int)
        assert sorted(bins) == list(range(16)), bins


def test_pixels_decorrelated():
    pts = _samples(16, n_pixels=2)
    assert not np.allclose(pts[:, 0, :], pts[:, 1, :])


def test_integration_beats_random():
    """QMC error on a smooth integrand should beat pseudo-random MC."""
    n = 256
    mats = sobol_matrices()
    dims = jnp.asarray([0, 1], jnp.int32)
    pix = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(np.uint32(7))
    qmc_pts = np.stack([
        np.asarray(sobol_sample_scrambled(mats, jnp.asarray(i), dims, pix, seed))[0]
        for i in range(n)
    ])
    rnd_pts = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (n, 2)))

    f = lambda p: np.cos(2 * np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p.sum(1)
    exact = 1.0  # ∫ = 0 + 1/2 + 1/2
    err_qmc = abs(f(qmc_pts).mean() - exact)
    err_rnd = abs(f(rnd_pts).mean() - exact)
    assert err_qmc < err_rnd, (err_qmc, err_rnd)
    assert err_qmc < 0.01, err_qmc


def test_sobol_render_converges():
    """Cornell render with the Sobol sampler converges to the random-sampler
    image (same scene, enough spp)."""
    from mcrt_tpu.config import AccelType, IntegratorConfig, RenderConfig
    from mcrt_tpu.renderer import Renderer
    from mcrt_tpu.scene.builders import cornell_box

    scene, camera = cornell_box()
    imgs = {}
    for st in (SamplerType.RANDOM, SamplerType.SOBOL):
        cfg = RenderConfig(
            width=24, height=24, spp=128, samples_per_pass=64,
            accel=AccelType.BRUTE,
            integrator=IntegratorConfig(max_depth=2),
            sampler=SamplerConfig(type=st),
        )
        imgs[st] = np.asarray(Renderer(scene, camera, cfg).render())
    a, b = imgs[SamplerType.RANDOM], imgs[SamplerType.SOBOL]
    mask = a.max(-1) < 5.0
    diff = np.abs(a - b)[mask].mean()
    assert diff < 0.1 * a[mask].mean() + 0.02, diff
