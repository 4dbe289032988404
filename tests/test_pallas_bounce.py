"""Fused bounce megakernel vs the split XLA pipeline (interpret mode).

The megakernel shares the split path's threefry streams, so both
backends follow identical sampled trajectories and the comparison is
direct (fp-reassociation-level tolerances only) — same contract as
tools/verify_pallas_parity.py on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene, partition, combine
from rust_ray_tracer_tpu.ops import pallas_bounce as pb
from rust_ray_tracer_tpu.ops import pallas_intersect as pim
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.integrator import render_waves


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # RRT_NO_UBER pins these tests to the split-megakernel path (the
    # uber bounce would otherwise take over on eligible scenes; it has
    # its own parity suite, tests/test_uber.py)
    monkeypatch.setenv("RRT_NO_UBER", "1")
    pim.INTERPRET = True
    yield
    pim.INTERPRET = False


def solid_scene(with_medium=False):
    """All-solid-texture scene: triangles + spheres + quads + a light
    (+ optionally a cuboid-boundary medium) — megakernel-eligible."""
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    world = [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.4, 0.3)),
        S.Sphere((-2.2, 0, -4), 1.0, S.Dielectric(1.5)),
        S.Sphere((2.2, 0, -4), 1.0, S.Metal((0.9, 0.8, 0.7), 0.2)),
        S.Triangle((-3, -1.2, -2), (3, -1.2, -2), (0, -1.2, -8),
                   S.Lambertian.from_rgb(0.7, 0.7, 0.7),
                   double_sided=True),
        S.XZRect(-1.0, 1.0, -5.0, -3.0, 3.0,
                 S.DiffuseLight.from_color((5, 5, 5))),
    ]
    lights = [world[-1]]
    if with_medium:
        world.append(S.ConstantMedium.from_color(
            S.Cuboid((-0.5, -0.5, -2.5), (0.5, 0.5, -1.5),
                     S.Dielectric(1.5)), 0.7, (0.9, 0.9, 0.9)))
    return compile_scene(S.Scene(cam, world, lights, (0.2, 0.3, 0.5)))


def _render(sd, key, mega: bool, w=32, h=24, spp=2):
    real_on_tpu = pim.on_tpu
    if mega:
        pim.on_tpu = lambda: True
    try:
        assert pb.eligible(sd) or pb.su_eligible(sd)
        return render_waves(sd, w, h, key, 0, spp, chunk_size=256)
    finally:
        pim.on_tpu = real_on_tpu


def test_megakernel_forward_matches_split():
    sd = solid_scene()
    key = jax.random.PRNGKey(7)
    ref = np.asarray(_render(sd, key, mega=False))
    got = np.asarray(_render(sd, key, mega=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)


def test_megakernel_forward_with_medium():
    sd = solid_scene(with_medium=True)
    key = jax.random.PRNGKey(3)
    ref = np.asarray(_render(sd, key, mega=False))
    got = np.asarray(_render(sd, key, mega=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)


def test_megakernel_grads_match():
    """Scene-parameter gradients through the fused bounce backward kernel
    equal the split pipeline's (same sampled paths, same detached-
    sampling discipline)."""
    sd = solid_scene()
    key = jax.random.PRNGKey(11)
    diff, static = partition(sd)

    def loss(diff):
        img = render_waves(combine(diff, static), 16, 12, key, 0, 1,
                           chunk_size=192)
        return jnp.mean(img)

    real_on_tpu = pim.on_tpu
    g_ref = jax.grad(loss)(diff)
    pim.on_tpu = lambda: True
    try:
        g_got = jax.grad(loss)(diff)
    finally:
        pim.on_tpu = real_on_tpu

    checked = nonzero = 0
    for name in ("tex_color", "sph_c0", "sph_r", "tri_v0", "quad_q",
                 "mat_fuzz", "mat_ior", "background", "light_q",
                 "light_u", "light_v"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_got, name))
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=1e-6,
                                   err_msg=name)
        checked += 1
        nonzero += bool((a != 0).any())
    assert checked and nonzero >= 4


def checker_scene():
    """random-scene shape: checker ground + solid spheres, no lights."""
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    return compile_scene(S.Scene(cam, [
        S.Sphere((0, -101, -4), 100.0,
                 S.Lambertian(S.Checker.from_colors((0.9, 0.1, 0.1),
                                                    (0.1, 0.9, 0.1)))),
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.4, 0.3)),
        S.Sphere((-2.2, 0, -4), 1.0, S.Metal((0.8, 0.8, 0.9), 0.1)),
        S.MovingSphere((2.2, 0, -4), (2.4, 0.2, -4), 0.0, 1.0, 1.0,
                       S.Dielectric(1.5)),
    ], [], (0.7, 0.8, 1.0)))


def test_megakernel_checker_forward_and_grads():
    """In-kernel checker select (random-scene eligibility) matches the
    XLA texture_value path, values and gradients."""
    sd = checker_scene()
    assert pb.eligible(sd)
    key = jax.random.PRNGKey(5)
    ref = np.asarray(_render(sd, key, mega=False))
    got = np.asarray(_render(sd, key, mega=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)

    diff, static = partition(sd)

    def loss(diff):
        img = render_waves(combine(diff, static), 16, 12, key, 0, 1,
                           chunk_size=192)
        return jnp.mean(img)

    real_on_tpu = pim.on_tpu
    g_ref = jax.grad(loss)(diff)
    pim.on_tpu = lambda: True
    try:
        g_got = jax.grad(loss)(diff)
    finally:
        pim.on_tpu = real_on_tpu
    for name in ("tex_color", "sph_c0", "sph_r", "background"):
        np.testing.assert_allclose(np.asarray(getattr(g_got, name)),
                                   np.asarray(getattr(g_ref, name)),
                                   rtol=5e-4, atol=1e-6, err_msg=name)
    assert (np.asarray(g_ref.tex_color) != 0).any()


def test_eligibility_gate():
    # noise texture -> ineligible (albedo needs the perlin tables)
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    sd = compile_scene(S.Scene(cam, [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian(S.Noise(4.0))),
    ], [], (0.1, 0.1, 0.1)))
    assert not pb.eligible(sd)
    assert pb.eligible(solid_scene())
    assert pb.eligible(checker_scene())


def noise_scene():
    """final_scene shape: noise + image textures -> full megakernel
    ineligible, shade+update fusion eligible."""
    img = np.zeros((8, 8, 3), np.float32)
    img[:4] = (0.9, 0.2, 0.1)
    img[4:] = (0.1, 0.2, 0.9)
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    world = [
        S.Sphere((0, -101, -4), 100.0, S.Lambertian(S.Noise(2.0))),
        S.Sphere((-1.5, 0, -4), 1.0,
                 S.Lambertian(S.ImageTexture(data=img))),
        S.Sphere((1.5, 0, -4), 1.0, S.Metal((0.9, 0.8, 0.7), 0.15)),
        S.XZRect(-1.0, 1.0, -5.0, -3.0, 3.0,
                 S.DiffuseLight.from_color((5, 5, 5))),
    ]
    return compile_scene(S.Scene(cam, world, [world[-1]], (0.4, 0.5, 0.7)))


def test_shade_update_fused_forward_and_grads():
    """Partial megakernel (XLA albedo + fused shade/update) matches the
    split pipeline on a noise/image scene — values and gradients."""
    sd = noise_scene()
    assert not pb.eligible(sd) and pb.su_eligible(sd)
    key = jax.random.PRNGKey(23)
    ref = np.asarray(_render(sd, key, mega=False))
    got = np.asarray(_render(sd, key, mega=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)

    diff, static = partition(sd)

    def loss(diff):
        img = render_waves(combine(diff, static), 16, 12, key, 0, 1,
                           chunk_size=192)
        return jnp.mean(img)

    import rust_ray_tracer_tpu.ops.pallas_intersect as pim
    real_on_tpu = pim.on_tpu
    g_ref = jax.grad(loss)(diff)
    pim.on_tpu = lambda: True
    try:
        g_got = jax.grad(loss)(diff)
    finally:
        pim.on_tpu = real_on_tpu
    nonzero = 0
    # rtol 2e-3: the fused vjp reassociates the perlin-albedo recompute
    # differently from the split pipeline (values only, same paths)
    for name in ("tex_color", "sph_c0", "sph_r", "mat_fuzz",
                 "background", "light_q", "img_data"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_got, name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6,
                                   err_msg=name)
        nonzero += bool((a != 0).any())
    assert nonzero >= 4
