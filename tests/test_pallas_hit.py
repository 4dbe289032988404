"""Fused hit-attributes kernel vs hit_attrs_core (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pim
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.intersect import intersect


@pytest.fixture(autouse=True)
def interpret_mode():
    pim.INTERPRET = True
    yield
    pim.INTERPRET = False


def mixed_scene():
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 45.0, 1.0)
    return compile_scene(S.Scene(cam, [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.4, 0.3)),
        S.MovingSphere((2, 0, -5), (2.5, 0, -5), 0.0, 1.0, 0.8,
                       S.Metal((0.9, 0.9, 0.9), 0.1)),
        S.Triangle((-3, -1, -3), (-1, -1, -3), (-2, 1, -3),
                   S.Lambertian.from_rgb(0.2, 0.7, 0.2),
                   double_sided=True),
        S.FlipFace(S.XZRect(-2.0, 2.0, -6.0, -2.0, 2.0,
                            S.DiffuseLight.from_color((4, 4, 4)))),
        S.ConstantMedium.from_color(
            S.Sphere((0, 3, -4), 1.0, S.Dielectric(1.5)), 2.0, (1, 0, 0)),
    ], [], (0.1, 0.1, 0.1)))


def test_fused_hit_matches_core_through_intersect():
    """intersect() with the kernel path (interpret) vs pure-XLA path."""
    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    sd = mixed_scene()
    rng = np.random.default_rng(0)
    C = 512
    o = jnp.asarray(rng.uniform(-3, 3, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.asarray(rng.random(C), jnp.float32)
    med_u = jnp.asarray(rng.random((C, sd.n_media)), jnp.float32)

    ref = intersect(sd, o, d, tt, med_u)
    real = pkm.on_tpu
    pkm.on_tpu = lambda: True
    try:
        got = intersect(sd, o, d, tt, med_u)
    finally:
        pkm.on_tpu = real

    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    m = np.asarray(ref.hit)
    for name in ("t", "u", "v"):
        np.testing.assert_allclose(np.asarray(getattr(got, name))[m],
                                   np.asarray(getattr(ref, name))[m],
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    for name in ("p", "normal"):
        np.testing.assert_allclose(np.asarray(getattr(got, name))[m],
                                   np.asarray(getattr(ref, name))[m],
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(ref.mat)[m],
                                  np.asarray(got.mat)[m])
    # miss lanes stay finite in p/normal (gradient hygiene)
    assert np.isfinite(np.asarray(got.p)).all()
    assert np.isfinite(np.asarray(got.normal)).all()


@pytest.mark.slow
def test_fused_hit_grads_match():
    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    sd = mixed_scene()
    rng = np.random.default_rng(1)
    C = 256
    o = jnp.asarray(rng.uniform(-3, 3, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.asarray(rng.random(C), jnp.float32)
    med_u = jnp.asarray(rng.random((C, sd.n_media)), jnp.float32)

    def loss(sd2):
        h = intersect(sd2, o, d, tt, med_u)
        w = jnp.where(h.hit, 1.0, 0.0)
        return (jnp.sum(w * jnp.where(jnp.isfinite(h.t), h.t, 0.0))
                + jnp.sum(h.p * w[:, None]) + jnp.sum(h.normal)
                + jnp.sum(h.u + h.v)) * 1e-3

    g_ref = jax.grad(lambda v: loss(sd._replace(sph_r=v)))(sd.sph_r)
    real = pkm.on_tpu
    pkm.on_tpu = lambda: True
    try:
        g_got = jax.grad(lambda v: loss(sd._replace(sph_r=v)))(sd.sph_r)
    finally:
        pkm.on_tpu = real
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(g_ref) != 0).any()


@pytest.mark.slow
def test_fused_hit_grads_rays_and_tables():
    """Backward-kernel parity for ray inputs (o, d, time) and the
    triangle/quad scene tables (the gather-transpose scatter-adds)."""
    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    sd = mixed_scene()
    rng = np.random.default_rng(5)
    C = 256
    o = jnp.asarray(rng.uniform(-3, 3, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.asarray(rng.random(C), jnp.float32)
    med_u = jnp.asarray(rng.random((C, sd.n_media)), jnp.float32)

    def loss(sd2, o2, d2, t2):
        h = intersect(sd2, o2, d2, t2, med_u)
        w = jnp.where(h.hit, 1.0, 0.0)
        return (jnp.sum(w * jnp.where(jnp.isfinite(h.t), h.t, 0.0))
                + jnp.sum(h.p * w[:, None]) + jnp.sum(h.normal)
                + jnp.sum(h.u * h.v)) * 1e-3

    def grads(sd2, o2, d2, t2):
        g_sd, g_o, g_d, g_t = jax.grad(loss, argnums=(0, 1, 2, 3),
                                       allow_int=True)(sd2, o2, d2, t2)
        return (g_sd.tri_v0, g_sd.tri_e1, g_sd.quad_q, g_sd.sph_c0,
                g_o, g_d, g_t)

    g_ref = grads(sd, o, d, tt)
    real = pkm.on_tpu
    pkm.on_tpu = lambda: True
    try:
        g_got = grads(sd, o, d, tt)
    finally:
        pkm.on_tpu = real
    names = ("tri_v0", "tri_e1", "quad_q", "sph_c0", "o", "d", "time")
    some_nonzero = False
    for a, b, name in zip(g_ref, g_got, names):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5, err_msg=name)
        some_nonzero |= bool((np.asarray(a) != 0).any())
    assert some_nonzero
