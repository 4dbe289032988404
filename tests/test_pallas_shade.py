"""Fused shading kernel vs shade_core (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pim
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.pallas_shade import (
    _shade_pallas, shade_fused)
from rust_ray_tracer_tpu.ops.shade import shade_core


@pytest.fixture(autouse=True)
def interpret_mode():
    pim.INTERPRET = True
    yield
    pim.INTERPRET = False


def scene_with_lights():
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)
    lamp_q = S.XZRect(-1.0, 1.0, -4.0, -2.0, 3.0,
                      S.DiffuseLight.from_color((5, 5, 5)))
    lamp_s = S.Sphere((2, 4, -3), 0.5, S.DiffuseLight.from_color((9, 9, 9)))
    return compile_scene(S.Scene(cam, [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.4, 0.3)),
        lamp_q, lamp_s,
    ], [lamp_q, lamp_s], (0, 0, 0)))


def rand_inputs(c, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.standard_normal((c, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(-3, 3, (c, 3)), jnp.float32)
    n = rng.standard_normal((c, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    albedo = jnp.asarray(rng.uniform(0, 1, (c, 3)), jnp.float32)
    kind = jnp.asarray(rng.integers(0, 5, c), jnp.int32)
    fuzz = jnp.asarray(rng.uniform(0, 0.5, c), jnp.float32)
    ior = jnp.asarray(rng.uniform(1.1, 2.0, c), jnp.float32)
    ub = jnp.asarray(rng.random((c, 9)), jnp.float32)
    gb = jnp.asarray(rng.standard_normal((c, 6)), jnp.float32)
    return d, p, n, albedo, kind, fuzz, ior, ub, gb


@pytest.mark.parametrize("n_lights", [0, 2])
def test_fused_matches_core(n_lights):
    if n_lights:
        sd = scene_with_lights()
    else:
        cam = make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)
        sd = compile_scene(S.Scene(cam, [
            S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.4, 0.3)),
        ], [], (0, 0, 0)))
    args = rand_inputs(300)
    ref = shade_core(sd, *args)
    got = _shade_pallas(sd, *args[:7], args[7], args[8])
    np.testing.assert_array_equal(np.asarray(ref.alive),
                                  np.asarray(got.alive))
    for name in ("emitted", "weight", "direction"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.slow
def test_fused_grad_matches_core_grad():
    sd = scene_with_lights()
    args = rand_inputs(256, seed=3)

    ub, gb = args[7], args[8]

    def loss_core(albedo, fuzz, ior):
        sc = shade_core(sd, args[0], args[1], args[2], albedo, args[4],
                        fuzz, ior, ub, gb)
        return (jnp.sum(sc.weight) + jnp.sum(sc.emitted)
                + jnp.sum(sc.direction ** 2))

    def loss_fused(albedo, fuzz, ior):
        sc = shade_fused(sd, args[0], args[1], args[2], albedo, args[4],
                         fuzz, ior, ub, gb)
        return (jnp.sum(sc.weight) + jnp.sum(sc.emitted)
                + jnp.sum(sc.direction ** 2))

    g_ref = jax.grad(loss_core, argnums=(0, 1, 2))(args[3], args[5],
                                                   args[6])
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(args[3], args[5],
                                                    args[6])
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_grad_scene_and_geometry():
    """The fused backward kernel must reproduce vjp(shade_core) for the
    light-table (scene) gradients — reduced in-kernel to scalars — and
    for the geometric inputs d_in/p/normal."""
    sd = scene_with_lights()
    args = rand_inputs(256, seed=11)
    ub, gb = args[7], args[8]

    def loss_core(sd_, d, p, n):
        sc = shade_core(sd_, d, p, n, args[3], args[4], args[5], args[6],
                        ub, gb)
        return (jnp.sum(sc.weight * jnp.arange(3.0))
                + jnp.sum(sc.emitted) + jnp.sum(sc.direction ** 2))

    def loss_fused(sd_, d, p, n):
        sc = shade_fused(sd_, d, p, n, args[3], args[4], args[5], args[6],
                         ub, gb)
        return (jnp.sum(sc.weight * jnp.arange(3.0))
                + jnp.sum(sc.emitted) + jnp.sum(sc.direction ** 2))

    g_ref = jax.grad(loss_core, argnums=(0, 1, 2, 3), allow_int=True)(
        sd, *args[:3])
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3), allow_int=True)(
        sd, *args[:3])
    for leaf in ("light_c", "light_r", "light_q", "light_u", "light_v"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_got[0], leaf)),
            np.asarray(getattr(g_ref[0], leaf)),
            rtol=2e-4, atol=1e-4, err_msg=leaf)
    # every other scene float leaf must be exactly zero in both
    for i, (a, b) in enumerate(zip(jax.tree.leaves(g_ref[0]),
                                   jax.tree.leaves(g_got[0]))):
        if a.dtype == jnp.float32 and a.size:
            assert np.isfinite(np.asarray(b)).all()
    for a, b, name in zip(g_ref[1:], g_got[1:], ("d_in", "p", "normal")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-4, err_msg=name)
