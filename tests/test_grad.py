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


class TestMetalRoughSpheres:
    """BASELINE config 4: per-sphere roughness/metallic grads on the
    MetalRoughSpheres glTF grid (path replay with detached sampling).

    The asset's own camera/framing is unusable (the grid spans ~6mm at
    the origin with no camera node; the reference importer couldn't load
    the file at all — external .bin + u32 indices), so the test frames
    it explicitly, subsamples the 1M-triangle mesh to keep the CPU
    brute-force path tractable, and adds a lamp so roughness has a
    direction-dependent signal to differentiate against."""

    def test_roughness_and_basecolor_grads(self):
        import os
        path = ("/root/reference/assets/MetalRoughSpheres/"
                "MetalRoughSpheres.gltf")
        if not os.path.exists(path):
            pytest.skip("MetalRoughSpheres not present")
        from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
        sc = load_gltf_scene(path, 1.0)
        # the asset is authored at sub-mm scale, where the reference's own
        # det epsilon (1e-5, triangle.rs:42) rejects every triangle;
        # scale a two-sphere slice up to unit size for the gradient check
        SCALE = 1000.0
        sub = [S.Triangle(np.asarray(t.v0) * SCALE,
                          np.asarray(t.v1) * SCALE,
                          np.asarray(t.v2) * SCALE, t.material)
               for t in (sc.world[:12000] + sc.world[74200:86200])]
        vs = np.array([t.v0 for t in sub], np.float32)
        mn, mx = vs.min(0), vs.max(0)
        ctr, ext = (mn + mx) / 2, float((mx - mn).max())
        lamp = S.XZRect(ctr[0] - ext, ctr[0] + ext, ctr[2] - ext,
                        ctr[2] + ext, mx[1] + ext,
                        S.DiffuseLight.from_color((6, 6, 6)))
        world = sub + [lamp]
        camera = make_camera(
            np.array([[1, 0, 0, ctr[0]], [0, 1, 0, ctr[1]],
                      [0, 0, 1, mx[2] + ext * 1.5]], np.float32),
            45.0, 1.0)
        base = compile_scene(S.Scene(camera, world, [lamp],
                             (0.05,) * 3))
        key = jax.random.PRNGKey(0)

        def render(sd):
            return render_image(sd, 16, 16, 2, key, depth=3,
                                chunk_size=256)

        img = np.asarray(render(base))
        hit_frac = (np.abs(img - 0.05).max(-1) > 1e-3).mean()
        assert hit_frac > 0.08, f"grid not visible ({hit_frac})"

        g_fuzz = np.asarray(jax.grad(
            lambda f: jnp.mean(render(base._replace(mat_fuzz=f))))(
                base.mat_fuzz))
        assert np.isfinite(g_fuzz).all()
        # roughness reaches the estimator only through metal->diffuse->
        # light-branch chains (see test_fuzz_grad_mechanism), which this
        # sparse sampling may not hit — finiteness is the contract here

        g_alb = np.asarray(jax.grad(
            lambda t: jnp.mean(render(base._replace(tex_color=t))))(
                base.tex_color))
        assert np.isfinite(g_alb).all()
        assert (np.abs(g_alb).sum(1) != 0).sum() >= 2  # per-material


def test_fuzz_grad_mechanism():
    """Roughness gradients flow through metal -> diffuse -> light-mixture
    chains: the mixture pdf/lights-sample depend smoothly on the hit
    point, which depends on fuzz through the perturbed reflection."""
    from rust_ray_tracer_tpu.ops.integrator import trace_rays

    lamp = S.Sphere((0, 2.0, -4), 0.6, S.DiffuseLight.from_color((10,) * 3))
    base = compile_scene(S.Scene(cam(), [
        S.XZRect(-4.0, 4.0, -9.0, -0.5, -1.0, S.Metal((0.9,) * 3, 0.3)),
        S.XZRect(-4.0, 4.0, -9.0, -0.5, 3.0,
                 S.Lambertian.from_rgb(0.6, 0.6, 0.6)),
        lamp], [lamp], (0.1, 0.1, 0.1)))
    key = jax.random.PRNGKey(0)
    n = 256
    o = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.8, -0.9, -1.0]), (n, 3))
    t = jnp.zeros(n)

    def loss(v):
        sd = base._replace(mat_fuzz=base.mat_fuzz.at[0].set(v))
        return jnp.mean(trace_rays(sd, o, d, t, key, 3))

    g = float(jax.grad(loss)(jnp.float32(0.3)))
    assert np.isfinite(g) and g != 0.0
    # same sign and order as the common-random-numbers secant
    fd = (float(loss(jnp.float32(0.4))) - float(loss(jnp.float32(0.3)))) / 0.1
    assert np.sign(g) == np.sign(fd)


def test_sphere_pole_uv_grads_finite():
    """Regression: a ray hitting a sphere's pole saturates the UV
    arccos/arctan2 inputs exactly; their infinite/NaN derivatives times a
    zero cotangent used to poison every upstream gradient (found when an
    inverse-rendering run NaN'd on TPU)."""
    from rust_ray_tracer_tpu.ops.integrator import trace_rays

    base = compile_scene(S.Scene(cam(), [
        S.Sphere((0, -3, -4), 1.0, S.Lambertian.from_rgb(0.6, 0.5, 0.4)),
    ], [], (0.4, 0.4, 0.4)))
    # straight down onto the north pole: hit normal == (0,1,0) exactly
    o = jnp.asarray([[0.0, 0.0, -4.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])

    def loss(dd):
        L = trace_rays(combine(dd, partition(base)[1]), o, d,
                       jnp.zeros(1), jax.random.PRNGKey(0), 2)
        return jnp.sum(L)

    g = jax.grad(loss)(partition(base)[0])
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
