"""Wavefront integrator vs analytic oracles of the reference estimator.

The reference estimator (``ray.rs:78-127``): emitted + importance-sampled
scatter, depth-4, specular short-circuit, miss -> background. Cases below are
constructed so the Monte-Carlo weight is *deterministic* (cosine sampling of
a Lambertian makes spdf/pdf == 1), giving exact expectations.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.integrator import render_image, trace_rays


def make(world, lights=(), background=(0, 0, 0)):
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 30.0, 1.0)
    return compile_scene(S.Scene(cam, list(world), list(lights), background))


def trace1(sc, o, d, depth=4, seed=0, n=64):
    """Trace n copies of one ray (distinct RNG streams); returns [n,3]."""
    o = jnp.broadcast_to(jnp.asarray(o, jnp.float32), (n, 3))
    d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (n, 3))
    t = jnp.zeros(n)
    return np.asarray(trace_rays(sc, o, d, t, jax.random.PRNGKey(seed),
                                 depth))


def test_miss_returns_background():
    sc = make([S.Sphere((0, 0, -5), 1.0, S.Lambertian.from_rgb(1, 0, 0))],
              background=(0.2, 0.4, 0.6))
    L = trace1(sc, [0, 0, 0], [0, 1, 0])
    np.testing.assert_allclose(L, np.tile([0.2, 0.4, 0.6], (64, 1)),
                               atol=1e-6)


def test_depth_zero_black():
    sc = make([S.Sphere((0, 0, -5), 1.0, S.Lambertian.from_rgb(1, 0, 0))],
              background=(1, 1, 1))
    L = trace1(sc, [0, 0, 0], [0, 0, -1], depth=0)
    np.testing.assert_array_equal(L, 0.0)


def test_emissive_front_face():
    sc = make([S.XYRect(-1.0, 1.0, -1.0, 1.0, -3.0,
                        S.DiffuseLight.from_color((2, 3, 4)))],
              background=(0, 0, 0))
    L = trace1(sc, [0, 0, 0], [0, 0, -1])
    np.testing.assert_allclose(L, np.tile([2, 3, 4], (64, 1)), atol=1e-5)


def test_emissive_back_face_dark():
    """DiffuseLight emits only when dot(d, n) < 0 (material/mod.rs:188-193).

    For an XYRect the reference normal faces the ray (aarect.rs:50), so a
    same-side view always emits; a *sphere* seen from inside has
    dot(d,n)>0 -> no emission."""
    sc = make([S.Sphere((0, 0, 0), 2.0,
                        S.DiffuseLight.from_color((5, 5, 5)))],
              background=(0, 0, 0))
    L = trace1(sc, [0, 0, 0], [0, 0, -1])  # inside the emissive sphere
    np.testing.assert_allclose(L, 0.0, atol=1e-6)


def test_lambertian_single_bounce_exact():
    """Convex Lambertian sphere under constant background, no lights:
    weight = albedo * (spdf/pdf) = albedo exactly -> L = albedo * bg."""
    albedo = np.array([0.8, 0.5, 0.2], np.float32)
    bg = np.array([0.6, 0.7, 0.9], np.float32)
    sc = make([S.Sphere((0, 0, -5), 1.0, S.Lambertian.from_color(albedo))],
              background=bg)
    L = trace1(sc, [0, 0, 0], [0, 0, -1], depth=4, n=256)
    np.testing.assert_allclose(L, np.tile(albedo * bg, (256, 1)), rtol=1e-4,
                               atol=1e-5)


def test_mirror_metal_reflection_exact():
    """fuzz=0 metal plane reflecting into the background:
    L = metal_albedo * bg (specular branch, ray.rs:93-98)."""
    alb = np.array([0.9, 0.8, 0.7], np.float32)
    bg = np.array([0.25, 0.5, 0.75], np.float32)
    sc = make([S.XYRect(-10.0, 10.0, -10.0, 10.0, -5.0, S.Metal(alb, 0.0))],
              background=bg)
    L = trace1(sc, [0, 0, 0], [0, 0, -1], n=32)
    np.testing.assert_allclose(L, np.tile(alb * bg, (32, 1)), rtol=1e-5)


def test_double_mirror_two_bounces():
    """Two parallel mirrors: 3 reflections then depth runs out -> 0 for
    depth=3... actually rays bounce forever; with depth=4 the contribution
    is 0 because the path never escapes (ray.rs:85-87)."""
    m = S.Metal((1.0, 1.0, 1.0), 0.0)
    sc = make([S.XYRect(-10.0, 10.0, -10.0, 10.0, -5.0, m),
               S.XYRect(-10.0, 10.0, -10.0, 10.0, 5.0, m)],
              background=(1, 1, 1))
    L = trace1(sc, [0, 0, 0], [0, 0, -1], depth=4, n=8)
    np.testing.assert_allclose(L, 0.0, atol=1e-6)


def test_dielectric_mostly_transmits_head_on():
    """Head-on glass sphere: Schlick r0 = 0.04 -> ~96% of paths pass
    through to the background with weight 1."""
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    sc = make([S.Sphere((0, 0, -5), 1.0, S.Dielectric(1.5))], background=bg)
    L = trace1(sc, [0, 0, 0], [0, 0, -1], n=4096)
    # transmitted and reflected paths both end in the background here, but
    # double-reflected ones may not; just require close to bg
    assert abs(L.mean() - 1.0) < 0.05


def test_light_sampling_unbiased():
    """Importance sampling must not change the estimator's mean: render a
    lit floor with and without the light list; means agree within noise."""
    lamp = S.XZRect(-1.0, 1.0, -1.0, 1.0, 4.0,
                    S.DiffuseLight.from_color((10, 10, 10)))
    floor = S.XZRect(-8.0, 8.0, -8.0, 8.0, -1.0,
                     S.Lambertian.from_rgb(0.7, 0.7, 0.7))
    w = [floor, lamp]
    sc_is = make(w, lights=[lamp])
    sc_no = make(w, lights=[])
    o, d = [0, 3, 6], [0, -0.45, -0.8]
    L_is = trace1(sc_is, o, d, n=8192, seed=1).mean(0)
    L_no = trace1(sc_no, o, d, n=8192, seed=2).mean(0)
    np.testing.assert_allclose(L_is, L_no, rtol=0.15, atol=5e-3)
    assert L_is.mean() > 0.01


def test_isotropic_medium_scatters():
    """Dense medium: all head-on rays scatter; with black background and
    no lights, a white isotropic medium keeps beta=albedo until depth runs
    out or the ray escapes to the background."""
    med = S.ConstantMedium.from_color(
        S.Sphere((0, 0, -5), 1.0, S.Dielectric(1.5)), 1.0, (1.0, 1.0, 1.0))
    sc = make([med], background=(0.5, 0.5, 0.5))
    L = trace1(sc, [0, 0, 0], [0, 0, -1], depth=8, n=2048)
    # with albedo 1 every escaping path contributes exactly bg
    escaped = L[:, 0] > 0
    assert escaped.mean() > 0.3
    np.testing.assert_allclose(L[escaped], 0.5, atol=1e-5)


class TestReproducibility:
    def scene(self):
        return make([S.Sphere((0, 0, -5), 1.0,
                              S.Lambertian.from_rgb(0.5, 0.6, 0.7))],
                    background=(0.7, 0.8, 1.0))

    def test_same_key_bitwise_identical(self):
        sc = self.scene()
        k = jax.random.PRNGKey(42)
        a = np.asarray(render_image(sc, 16, 16, 2, k, chunk_size=256))
        b = np.asarray(render_image(sc, 16, 16, 2, k, chunk_size=256))
        np.testing.assert_array_equal(a, b)

    def test_wave_partition_invariance(self):
        """Checkpoint/resume is bitwise exact: continuing from a saved
        accumulator reproduces the monolithic run's float-add order."""
        from rust_ray_tracer_tpu.ops.integrator import render_waves
        sc = self.scene()
        k = jax.random.PRNGKey(7)
        whole = np.asarray(render_waves(sc, 8, 8, k, 0, 4, chunk_size=64))
        acc = render_waves(sc, 8, 8, k, 0, 1, chunk_size=64)
        acc = render_waves(sc, 8, 8, k, 1, 2, chunk_size=64, acc0=acc)
        acc = render_waves(sc, 8, 8, k, 3, 1, chunk_size=64, acc0=acc)
        np.testing.assert_array_equal(whole, np.asarray(acc))

    def test_different_seed_differs(self):
        sc = self.scene()
        a = np.asarray(render_image(sc, 16, 16, 1, jax.random.PRNGKey(0),
                                    chunk_size=256))
        b = np.asarray(render_image(sc, 16, 16, 1, jax.random.PRNGKey(1),
                                    chunk_size=256))
        assert np.abs(a - b).max() > 0


def test_render_image_no_nans_and_flip_convention():
    """Emissive rect in the upper half of camera space lands in the upper
    rows of the (pre-flip) image array."""
    lamp = S.XYRect(-5.0, 5.0, 1.0, 5.0, -8.0,
                    S.DiffuseLight.from_color((5, 5, 5)))
    sc = make([lamp], background=(0, 0, 0))
    img = np.asarray(render_image(sc, 32, 32, 1, jax.random.PRNGKey(0),
                                  chunk_size=512))
    assert np.isfinite(img).all()
    top = img[20:, :, :].sum()     # y grows upward pre-flip
    bottom = img[:12, :, :].sum()
    assert top > bottom * 5
