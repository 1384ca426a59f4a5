import jax
import jax.numpy as jnp
import numpy as np

from mcrt_tpu.core import math as m
from mcrt_tpu.sampling import samplers as smp


def _u2(n, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 2))


def test_cosine_hemisphere_distribution():
    u = _u2(200_000)
    d = smp.cosine_hemisphere(u)
    assert float(jnp.min(d[:, 1])) >= 0.0
    np.testing.assert_allclose(np.asarray(m.length(d)), 1.0, atol=1e-4)
    # E[cosθ] under cos-weighted pdf = ∫ cos·(cos/π) dω = 2/3
    assert abs(float(jnp.mean(d[:, 1])) - 2.0 / 3.0) < 5e-3


def test_uniform_hemisphere_mean_cos():
    u = _u2(200_000, 1)
    d = smp.uniform_hemisphere(u)
    # E[cosθ] = 1/2 under uniform hemisphere
    assert abs(float(jnp.mean(d[:, 1])) - 0.5) < 5e-3


def test_concentric_disk_in_unit_disk():
    u = _u2(100_000, 2)
    d = smp.concentric_disk(u)
    r2 = np.asarray(d[:, 0] ** 2 + d[:, 1] ** 2)
    assert r2.max() <= 1.0 + 1e-5
    # uniform over disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3


def test_uniform_triangle_barycentric():
    u = _u2(100_000, 3)
    b = np.asarray(smp.uniform_triangle(u))
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
    # uniform barycentric: E[b0] = E[b1] = 1/3
    np.testing.assert_allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)


def test_mis_heuristics():
    w = smp.power_heuristic(1.0, jnp.asarray(1.0), 1.0, jnp.asarray(1.0))
    assert abs(float(w) - 0.5) < 1e-6
    wb = smp.balance_heuristic(1.0, jnp.asarray(2.0), 1.0, jnp.asarray(0.0))
    assert abs(float(wb) - 1.0) < 1e-6


def test_stream_determinism_and_advance():
    from mcrt_tpu.config import SamplerConfig
    from mcrt_tpu.sampling import rng

    s0 = rng.make_stream(SamplerConfig(seed=7), jnp.asarray(3), jnp.arange(64))
    u1, s1 = rng.next_2d(s0)
    u2, s2 = rng.next_2d(s1)
    assert not np.allclose(np.asarray(u1), np.asarray(u2))
    # same construction → same values (deterministic)
    s0b = rng.make_stream(SamplerConfig(seed=7), jnp.asarray(3), jnp.arange(64))
    u1b, _ = rng.next_2d(s0b)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u1b))
    # different frame → different values
    s0c = rng.make_stream(SamplerConfig(seed=7), jnp.asarray(4), jnp.arange(64))
    u1c, _ = rng.next_2d(s0c)
    assert not np.allclose(np.asarray(u1), np.asarray(u1c))
