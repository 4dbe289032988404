"""Differentiability: autodiff pixel gradients vs finite differences.

The reference has no gradients at all; BASELINE.json demands material /
camera / vertex grads via detached sampling ("pixel-grad allclose").
Finite differences use a FIXED rng key so the sampled paths are common
random numbers — the detached-sampling estimator is then smooth in the
parameters and FD converges to the autodiff value.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.camera import CameraData, make_camera
from rust_ray_tracer_tpu.ops.integrator import render_image


def cam():
    return make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)


def render_loss(sd, key, w=8, h=8, spp=2, depth=3):
    img = render_image(sd, w, h, spp, key, depth=depth, chunk_size=64)
    return jnp.mean(img)


def fd_check(loss_of_theta, theta0, eps, rtol=5e-2, atol=1e-5):
    g = jax.grad(loss_of_theta)(jnp.float32(theta0))
    lp = float(loss_of_theta(jnp.float32(theta0 + eps)))
    lm = float(loss_of_theta(jnp.float32(theta0 - eps)))
    fd = (lp - lm) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), fd, rtol=rtol, atol=atol)
    return float(g)


class TestMaterialGrads:
    def test_albedo_grad(self):
        key = jax.random.PRNGKey(0)
        base = compile_scene(S.Scene(cam(), [
            S.Sphere((0, 0, -4), 1.5, S.Lambertian.from_rgb(0.5, 0.5, 0.5)),
        ], [], (0.8, 0.8, 0.8)))

        def loss(a):
            sd = base._replace(tex_color=base.tex_color.at[..., :].set(a))
            return render_loss(sd, key)

        g = fd_check(loss, 0.5, 1e-3)
        assert g > 0  # brighter albedo -> brighter image

    def test_emission_grad(self):
        key = jax.random.PRNGKey(1)
        base = compile_scene(S.Scene(cam(), [
            S.XYRect(-2.0, 2.0, -2.0, 2.0, -4.0,
                     S.DiffuseLight.from_color((3, 3, 3))),
        ], [], (0, 0, 0)))
        tid = int(np.asarray(base.mat_tex)[
            int(np.asarray(base.quad_mat)[0])])

        def loss(e):
            sd = base._replace(
                tex_color=base.tex_color.at[tid].set(jnp.full(3, e)))
            return render_loss(sd, key)

        g = fd_check(loss, 3.0, 1e-2)
        # d mean / d emit: every pixel sees the emitter head-on
        assert g > 0

    def test_metal_albedo_grad(self):
        key = jax.random.PRNGKey(2)

        def loss(a):
            base = compile_scene(S.Scene(cam(), [
                S.XYRect(-4.0, 4.0, -4.0, 4.0, -4.0, S.Metal((0.5, 0.5, 0.5), 0.0)),
            ], [], (0.9, 0.9, 0.9)))
            tid = int(np.asarray(base.mat_tex)[0])
            sd = base._replace(
                tex_color=base.tex_color.at[:].set(
                    jnp.broadcast_to(a, base.tex_color.shape)))
            return render_loss(sd, key)

        fd_check(loss, 0.5, 1e-3)


class TestGeometryGrads:
    def test_vertex_grad(self):
        """Gradient w.r.t. a triangle vertex position (shadow-free interior
        derivative through t/normal, not edge discontinuities)."""
        key = jax.random.PRNGKey(3)
        base = compile_scene(S.Scene(cam(), [
            S.Triangle((-2, -2, -4), (2, -2, -4), (0, 2, -4),
                       S.DiffuseLight.from_color((2, 2, 2))),
        ], [], (0.1, 0.1, 0.1)))

        def loss(z):
            v0 = jnp.asarray([-2.0, -2.0, 0.0]) + jnp.array([0, 0, 1.0]) * z
            sd = base._replace(tri_v0=base.tri_v0.at[0].set(v0))
            return render_loss(sd, key, depth=1)

        g = jax.grad(loss)(jnp.float32(-4.0))
        assert np.isfinite(float(g))

    def test_sphere_radius_grad_smooth_region(self):
        """Radius affects hit point / normal of interior rays."""
        key = jax.random.PRNGKey(4)
        base = compile_scene(S.Scene(cam(), [
            S.Sphere((0, 0, -4), 1.5, S.Lambertian.from_rgb(0.6, 0.3, 0.2)),
            S.XYRect(-9.0, 9.0, -9.0, 9.0, -9.0,
                     S.DiffuseLight.from_color((1, 1, 1))),
        ], [], (0, 0, 0)))

        def loss(r):
            sd = base._replace(sph_r=base.sph_r.at[0].set(r))
            return render_loss(sd, key)

        g = jax.grad(loss)(jnp.float32(1.5))
        assert np.isfinite(float(g))


class TestCameraGrads:
    def test_fov_grad(self):
        key = jax.random.PRNGKey(5)
        world = [S.Sphere((0, 0, -4), 1.0,
                          S.Lambertian.from_rgb(0.9, 0.1, 0.1))]

        def loss(scale):
            c = CameraData(jnp.eye(3, 4), scale, jnp.float32(1.0),
                           jnp.float32(0.0), jnp.float32(1.0))
            sd = compile_scene(S.Scene(c, world, [], (0.0, 0.0, 0.0)))
            sd = sd._replace(camera=sd.camera._replace(scale=scale))
            return render_loss(sd, key)

        fd_check(loss, 0.4, 1e-3, rtol=0.1, atol=1e-4)

    def test_translation_grad(self):
        key = jax.random.PRNGKey(6)
        world = [S.XYRect(-1.0, 3.0, -2.0, 2.0, -4.0,
                          S.DiffuseLight.from_color((1, 1, 1)))]
        base = compile_scene(S.Scene(cam(), world, [], (0, 0, 0)))

        def loss(tx):
            c2w = jnp.eye(3, 4).at[0, 3].set(tx)
            sd = base._replace(camera=base.camera._replace(c2w=c2w))
            return render_loss(sd, key, depth=1)

        g = jax.grad(loss)(jnp.float32(0.0))
        assert np.isfinite(float(g))


def test_partition_combine_roundtrip():
    sd = compile_scene(S.Scene(cam(), [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.5, 0.5)),
    ], [], (0.5, 0.5, 0.5)))
    diff, static = partition(sd)
    back = combine(diff, static)
    for a, b in zip(jax.tree.leaves(sd), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # every float leaf is in diff, every int/bool leaf in static
    assert all(jnp.issubdtype(x.dtype, jnp.floating)
               for x in jax.tree.leaves(diff))


def test_grad_through_full_scene_pytree():
    """jax.grad over the whole differentiable partition at once — the
    training-style entry: grads for every float leaf are finite."""
    key = jax.random.PRNGKey(8)
    sd = compile_scene(S.Scene(cam(), [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.4, 0.5, 0.6)),
        S.XYRect(-3.0, 3.0, -3.0, 3.0, 4.0,
                 S.DiffuseLight.from_color((4, 4, 4))),
    ], [S.XZRect(-1.0, 1.0, -1.0, 1.0, 3.9,
                 S.DiffuseLight.from_color((4, 4, 4)))], (0.05, 0.05, 0.05)))
    diff, static = partition(sd)

    def loss(d):
        return render_loss(combine(d, static), key)

    grads = jax.grad(loss)(diff)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
