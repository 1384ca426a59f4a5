import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu.core import math as m


def test_normalize_safe():
    v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = m.normalize(v)
    np.testing.assert_allclose(n[0], [0.6, 0.0, 0.8], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(n[1])))


def test_onb_orthonormal():
    key = jax.random.PRNGKey(0)
    n = m.normalize(jax.random.normal(key, (128, 3)))
    t, b = m.build_orthonormal_basis(n)
    np.testing.assert_allclose(m.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(b, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.length(t), 1.0, atol=1e-5)
    np.testing.assert_allclose(m.length(b), 1.0, atol=1e-5)


def test_local_world_roundtrip():
    key = jax.random.PRNGKey(1)
    n = m.normalize(jax.random.normal(key, (64, 3)))
    t, b = m.build_orthonormal_basis(n)
    v = m.normalize(jax.random.normal(jax.random.PRNGKey(2), (64, 3)))
    v_local = m.to_local(t, b, n, v)
    v_back = m.to_world(t, b, n, v_local)
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(v), atol=1e-5)
    # y component of local == cos to normal
    np.testing.assert_allclose(
        np.asarray(v_local[..., 1]), np.asarray(m.dot(v, n)), atol=1e-5
    )


def test_reflect():
    wo = jnp.asarray([[0.0, 1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(m.reflect(wo, n), wo, atol=1e-6)


def test_solve_2x2():
    x0, x1, ok = m.solve_2x2(
        jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(3.0),
        jnp.asarray(5.0), jnp.asarray(10.0),
    )
    assert bool(ok)
    np.testing.assert_allclose([float(x0), float(x1)], [1.0, 3.0], atol=1e-5)


def test_lerp_direction_corners():
    c00 = jnp.asarray([0.0, 0.0, -1.0])
    c10 = jnp.asarray([1.0, 0.0, -1.0])
    c01 = jnp.asarray([0.0, 1.0, -1.0])
    c11 = jnp.asarray([1.0, 1.0, -1.0])
    uv = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    d = m.lerp_direction(c00, c10, c01, c11, uv)
    np.testing.assert_allclose(np.asarray(d[0]), np.asarray(c00 / m.length(c00)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d[1]), np.asarray(c11 / jnp.linalg.norm(c11)), atol=1e-6
    )
