"""Unit oracles for ops/linalg vs the reference formulas.

Oracle sources: reflect/refract/Schlick ``material/mod.rs:150-169``,
OrthNormBasis ``vec3.rs:55-73``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.ops import linalg as la


def rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_dot_cross_length():
    a, b = rand((64, 3), 0), rand((64, 3), 1)
    np.testing.assert_allclose(la.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(la.cross(a, b), np.cross(a, b), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(la.length(a), np.linalg.norm(a, axis=-1),
                               rtol=1e-4)


def test_normalize_zero_safe():
    v = np.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]], np.float32)
    out = np.asarray(la.normalize(v))
    np.testing.assert_allclose(out[0], [0.6, 0.0, 0.8], rtol=1e-5)
    assert np.all(out[1] == 0.0)          # no NaN for zero vector


def test_safe_sqrt_grad_finite():
    import jax
    g = jax.grad(lambda x: la.safe_sqrt(x))(jnp.float32(-1.0))
    assert np.isfinite(np.asarray(g))
    np.testing.assert_allclose(la.safe_sqrt(jnp.float32(4.0)), 2.0,
                               rtol=1e-6)
    assert float(la.safe_sqrt(jnp.float32(-4.0))) == 0.0


def test_reflect_oracle():
    # v - 2*dot(v,n)*n (material/mod.rs:150-152)
    v, n = rand((32, 3), 2), rand((32, 3), 3)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    expect = v - 2.0 * np.sum(v * n, -1, keepdims=True) * n
    np.testing.assert_allclose(la.reflect(v, n), expect, rtol=1e-4,
                               atol=1e-5)


def test_refract_snell():
    # straight-on ray passes through undeviated; oblique ray obeys Snell
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    uv = np.array([[0.0, -1.0, 0.0]], np.float32)
    out, tir = la.refract(uv, n, jnp.asarray([1.0 / 1.5], jnp.float32))
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(out)[0], [0.0, -1.0, 0.0],
                               atol=1e-5)

    theta_i = 0.3
    uv = np.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], np.float32)
    ratio = 1.0 / 1.5
    out, tir = la.refract(uv, n, jnp.asarray([ratio], jnp.float32))
    sin_t = np.asarray(out)[0, 0]
    np.testing.assert_allclose(sin_t, ratio * np.sin(theta_i), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out)[0]), 1.0,
                               atol=1e-4)


def test_refract_tir():
    # from glass to air beyond the critical angle
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    theta_i = 0.9  # sin > 1/1.5 critical
    uv = np.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], np.float32)
    _out, tir = la.refract(uv, n, jnp.asarray([1.5], jnp.float32))
    assert bool(tir[0])


@pytest.mark.parametrize("cosine,ir", [(1.0, 1.5), (0.5, 1.5), (0.0, 2.4),
                                       (0.2, 1.33)])
def test_schlick_oracle(cosine, ir):
    r0 = ((1 - ir) / (1 + ir)) ** 2
    expect = r0 + (1 - r0) * (1 - cosine) ** 5
    np.testing.assert_allclose(
        float(la.schlick(jnp.float32(cosine), jnp.float32(ir))), expect,
        rtol=1e-5)


def test_orthonormal_basis():
    w = rand((128, 3), 4)
    u, v, w_hat = la.orthonormal_basis(w)
    u, v, w_hat = map(np.asarray, (u, v, w_hat))
    for a, b in [(u, v), (u, w_hat), (v, w_hat)]:
        np.testing.assert_allclose(np.sum(a * b, -1), 0.0, atol=1e-5)
    for a in (u, v, w_hat):
        np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0,
                                   atol=1e-5)
    # right-handed: u x v == w_hat
    np.testing.assert_allclose(np.cross(u, v), w_hat, atol=1e-5)


def test_basis_local():
    w = np.array([[0.0, 0.0, 1.0]], np.float32)
    u, v, w_hat = la.orthonormal_basis(w)
    a = np.array([[1.0, 2.0, 3.0]], np.float32)
    out = np.asarray(la.basis_local(u, v, w_hat, a))
    expect = (a[:, 0:1] * np.asarray(u) + a[:, 1:2] * np.asarray(v)
              + a[:, 2:3] * np.asarray(w_hat))
    np.testing.assert_allclose(out, expect, rtol=1e-5)
