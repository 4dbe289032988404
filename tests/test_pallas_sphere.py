"""Sphere Pallas kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pim
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.intersect import _sph_candidates
from rust_ray_tracer_tpu.ops.pallas_sphere import sph_search


@pytest.fixture(autouse=True)
def interpret_mode():
    pim.INTERPRET = True
    yield
    pim.INTERPRET = False


def scene_of_spheres(n, seed=0, moving_frac=0.3):
    rng = np.random.default_rng(seed)
    world = []
    mat = S.Lambertian.from_rgb(0.5, 0.5, 0.5)
    for i in range(n):
        c = rng.uniform(-8, 8, 3).astype(np.float32)
        r = float(rng.uniform(0.2, 1.0))
        if rng.random() < moving_frac:
            c1 = c + rng.uniform(-0.5, 0.5, 3).astype(np.float32)
            world.append(S.MovingSphere(c, c1, 0.0, 1.0, r, mat))
        else:
            world.append(S.Sphere(c, r, mat))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)
    return compile_scene(S.Scene(cam, world, [], (0, 0, 0)))


@pytest.mark.parametrize("n_spheres,n_rays", [(5, 100), (200, 300)])
def test_sphere_kernel_matches_xla(n_spheres, n_rays):
    sd = scene_of_spheres(n_spheres)
    rng = np.random.default_rng(1)
    o = np.asarray(rng.uniform(-10, 10, (n_rays, 3)), np.float32)
    d = np.asarray(rng.standard_normal((n_rays, 3)), np.float32)
    # aim half the rays at random sphere centers so hits are guaranteed
    targets = np.asarray(sd.sph_c0)[
        rng.integers(0, n_spheres, n_rays // 2)]
    d[: n_rays // 2] = targets - o[: n_rays // 2]
    o, d = jnp.asarray(o), jnp.asarray(d)
    time = jnp.asarray(rng.random(n_rays), jnp.float32)
    t_min = jnp.full(n_rays, 1e-4)
    t_max = jnp.full(n_rays, jnp.inf)

    ref_t, ref_i = _sph_candidates(sd, o, d, time, t_min, t_max)
    got_t, got_i = sph_search(sd, o, d, time, t_min, t_max)
    ref_t, got_t = np.asarray(ref_t), np.asarray(got_t)

    hit_ref, hit_got = np.isfinite(ref_t), np.isfinite(got_t)
    np.testing.assert_array_equal(hit_ref, hit_got)
    np.testing.assert_allclose(got_t[hit_got], ref_t[hit_ref], rtol=1e-4)
    # ties (overlapping spheres) can legitimately differ by index;
    # require t-agreement and expect the vast majority of indices equal
    same = (np.asarray(got_i) == np.asarray(ref_i))[hit_got]
    assert same.mean() > 0.99


def test_dead_rays_cull():
    sd = scene_of_spheres(10)
    n = 16
    o = jnp.zeros((n, 3))
    d = jnp.asarray(np.tile([0, 0, -1.0], (n, 1)), jnp.float32)
    t, i = sph_search(sd, o, d, jnp.zeros(n), jnp.full(n, 1e-4),
                      jnp.full(n, -1.0))
    assert not np.isfinite(np.asarray(t)).any()
