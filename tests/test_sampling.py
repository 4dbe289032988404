"""Sampling / PDF oracles (pdf.rs, sphere.rs:101-119, aarect.rs:123-143)."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import sampling
from rust_ray_tracer_tpu.ops.camera import make_camera


def make(world, lights):
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 30.0, 1.0)
    return compile_scene(S.Scene(cam, list(world), list(lights), (0, 0, 0)))


def test_cosine_pdf_matches_density():
    """Histogram of cosine samples ~ cos(theta)/pi density."""
    n = 200_000
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n, 2))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    dirs = np.asarray(sampling.cosine_sample(normal, u[:, 0], u[:, 1]))
    cos_t = dirs[:, 2]
    assert np.all(cos_t >= -1e-6)
    # E[cos] under cos-weighted hemisphere = 2/3
    np.testing.assert_allclose(cos_t.mean(), 2.0 / 3.0, atol=5e-3)
    # pdf value agrees with density formula
    pdf = np.asarray(sampling.cosine_pdf_value(normal, jnp.asarray(dirs)))
    np.testing.assert_allclose(pdf, np.maximum(cos_t, 0) / np.pi, atol=1e-4)


def test_cosine_pdf_integrates_to_one():
    """Monte-Carlo over the uniform sphere: E[pdf * 4pi] == 1."""
    n = 400_000
    g = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    dirs = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    pdf = np.asarray(sampling.cosine_pdf_value(normal, dirs))
    np.testing.assert_allclose(pdf.mean() * 4 * np.pi, 1.0, atol=2e-2)


def test_uniform_in_ball_distribution():
    """Closed-form ball sampling == the rejection loop's distribution
    (vec3.rs:18-25): uniform density in the unit ball."""
    n = 200_000
    k = jax.random.PRNGKey(2)
    g = jax.random.normal(k, (n, 3))
    u = jax.random.uniform(jax.random.fold_in(k, 1), (n,))
    v = np.asarray(sampling.uniform_in_ball(g, u))
    r = np.linalg.norm(v, axis=-1)
    assert np.all(r <= 1.0 + 1e-5)
    # P(r < s) = s^3 for uniform ball
    for s in (0.3, 0.6, 0.9):
        np.testing.assert_allclose((r < s).mean(), s ** 3, atol=5e-3)
    np.testing.assert_allclose(v.mean(0), 0.0, atol=5e-3)


def test_sphere_light_pdf_integrates_to_one():
    """Solid-angle pdf over its cone: E_uniform[pdf] * 4pi == 1."""
    light = S.Sphere((0, 0, -10), 2.0, S.DiffuseLight.from_color((1, 1, 1)))
    sc = make([light], [light])
    n = 400_000
    g = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    dirs = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    origin = jnp.zeros((n, 3))
    pdf = np.asarray(sampling.lights_pdf_value(sc, origin, dirs))
    np.testing.assert_allclose(pdf.mean() * 4 * np.pi, 1.0, atol=2e-2)


def test_sphere_light_sample_hits_sphere():
    light = S.Sphere((0, 0, -10), 2.0, S.DiffuseLight.from_color((1, 1, 1)))
    sc = make([light], [light])
    n = 10_000
    k = jax.random.PRNGKey(4)
    u = jax.random.uniform(k, (n, 3))
    dirs = np.asarray(sampling.lights_sample(
        sc, jnp.zeros((n, 3)), u[:, 0], u[:, 1], u[:, 2]))
    # every sampled direction must intersect the sphere
    oc = np.array([0, 0, -10.0])
    b = dirs @ oc
    disc = b ** 2 - np.sum(dirs * dirs, -1) * (np.dot(oc, oc) - 4.0)
    assert np.all(disc >= -1e-3)


def test_quad_light_pdf_integrates_to_one():
    lamp = S.XZRect(213.0, 343.0, 227.0, 332.0, 554.0,
                    S.DiffuseLight.from_color((15, 15, 15)))
    sc = make([lamp], [lamp])
    n = 800_000
    g = jax.random.normal(jax.random.PRNGKey(5), (n, 3))
    dirs = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    origin = jnp.broadcast_to(jnp.asarray([278.0, 278.0, 278.0]), (n, 3))
    pdf = np.asarray(sampling.lights_pdf_value(sc, origin, dirs))
    np.testing.assert_allclose(pdf.mean() * 4 * np.pi, 1.0, rtol=5e-2)


def test_quad_light_sample_on_rect():
    lamp = S.XZRect(213.0, 343.0, 227.0, 332.0, 554.0,
                    S.DiffuseLight.from_color((15, 15, 15)))
    sc = make([lamp], [lamp])
    n = 1000
    k = jax.random.PRNGKey(6)
    u = jax.random.uniform(k, (n, 3))
    origin = np.array([278.0, 100.0, 278.0], np.float32)
    dirs = np.asarray(sampling.lights_sample(
        sc, jnp.broadcast_to(origin, (n, 3)), u[:, 0], u[:, 1], u[:, 2]))
    # intersect y=554 plane: points must lie in the rect
    t = (554.0 - origin[1]) / dirs[:, 1]
    p = origin[None] + t[:, None] * dirs
    assert np.all((p[:, 0] >= 213 - 1e-2) & (p[:, 0] <= 343 + 1e-2))
    assert np.all((p[:, 2] >= 227 - 1e-2) & (p[:, 2] <= 332 + 1e-2))


def test_null_light_defaults():
    """FlipFace-wrapped light -> pdf 0, dir (1,0,0)
    (geometry/mod.rs:56-61)."""
    lamp = S.FlipFace(S.XZRect(0.0, 1.0, 0.0, 1.0, 5.0,
                               S.DiffuseLight.from_color((1, 1, 1))))
    sc = make([lamp], [lamp])
    o = jnp.zeros((4, 3))
    d = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)),
                    jnp.float32)
    pdf = np.asarray(sampling.lights_pdf_value(sc, o, d))
    np.testing.assert_array_equal(pdf, 0.0)
    dirs = np.asarray(sampling.lights_sample(
        sc, o, jnp.zeros(4), jnp.zeros(4), jnp.zeros(4)))
    np.testing.assert_allclose(dirs, np.tile([1.0, 0, 0], (4, 1)))


def test_mixture_pdf_average():
    """Light list averages member pdfs (geometry/mod.rs:111-120)."""
    l1 = S.Sphere((0, 0, -10), 2.0, S.DiffuseLight.from_color((1, 1, 1)))
    l2 = S.FlipFace(S.XZRect(0.0, 1.0, 0.0, 1.0, 5.0,
                             S.DiffuseLight.from_color((1, 1, 1))))
    sc_both = make([l1], [l1, l2])
    sc_one = make([l1], [l1])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    o = jnp.zeros((1, 3))
    p_both = float(sampling.lights_pdf_value(sc_both, o, d)[0])
    p_one = float(sampling.lights_pdf_value(sc_one, o, d)[0])
    np.testing.assert_allclose(p_both, p_one / 2.0, rtol=1e-5)


def test_random_to_sphere_oracle():
    """Cone sample z in [cos_max, 1] (sphere.rs:217-228)."""
    r, dsq = 2.0, 100.0
    u1 = jnp.asarray(np.random.default_rng(1).random(1000), jnp.float32)
    u2 = jnp.asarray(np.random.default_rng(2).random(1000), jnp.float32)
    v = np.asarray(sampling.random_to_sphere(
        jnp.float32(r), jnp.float32(dsq), u1, u2))
    cos_max = np.sqrt(1 - r * r / dsq)
    assert np.all(v[:, 2] >= cos_max - 1e-5)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)
