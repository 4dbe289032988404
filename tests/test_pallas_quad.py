"""Quad Pallas kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pim
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.intersect import _quad_candidates
from rust_ray_tracer_tpu.ops.pallas_quad import quad_search


@pytest.fixture(autouse=True)
def interpret_mode():
    pim.INTERPRET = True
    yield
    pim.INTERPRET = False


def quad_scene(n, seed=0):
    rng = np.random.default_rng(seed)
    mat = S.Lambertian.from_rgb(0.5, 0.5, 0.5)
    world = []
    for _ in range(n):
        q = rng.uniform(-8, 8, 3).astype(np.float32)
        u = rng.uniform(-2, 2, 3).astype(np.float32)
        v = rng.uniform(-2, 2, 3).astype(np.float32)
        world.append(S.Quad(q, u, v, mat))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)
    return compile_scene(S.Scene(cam, world, [], (0, 0, 0)))


@pytest.mark.parametrize("n_quads,n_rays", [(6, 128), (300, 256)])
def test_quad_kernel_matches_xla(n_quads, n_rays):
    sd = quad_scene(n_quads)
    rng = np.random.default_rng(1)
    o = np.asarray(rng.uniform(-10, 10, (n_rays, 3)), np.float32)
    d = np.asarray(rng.standard_normal((n_rays, 3)), np.float32)
    targets = np.asarray(sd.quad_q)[rng.integers(0, n_quads, n_rays // 2)]
    d[: n_rays // 2] = (targets + 0.3) - o[: n_rays // 2]
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_min = jnp.full(n_rays, 1e-4)
    t_max = jnp.full(n_rays, jnp.inf)

    ref_t, ref_i = _quad_candidates(sd, o, d, t_min, t_max)
    got_t, got_i = quad_search(sd, o, d, t_min, t_max)
    ref_t, got_t = np.asarray(ref_t), np.asarray(got_t)
    hit_ref, hit_got = np.isfinite(ref_t), np.isfinite(got_t)
    np.testing.assert_array_equal(hit_ref, hit_got)
    assert hit_got.any()
    np.testing.assert_allclose(got_t[hit_got], ref_t[hit_ref], rtol=1e-4)
    same = (np.asarray(got_i) == np.asarray(ref_i))[hit_got]
    assert same.mean() > 0.99


def test_cornell_quads_through_integrator():
    """Cornell box rendered with the kernel path (interpret) matches the
    XLA path per-pixel."""
    import jax

    from rust_ray_tracer_tpu.models import builders
    from rust_ray_tracer_tpu.ops.integrator import render_waves
    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    sd = compile_scene(builders.get_scene("cornell_box", 1.0))
    key = jax.random.PRNGKey(0)
    a = np.asarray(render_waves(sd, 12, 12, key, 0, 1, chunk_size=144))
    real = pkm.on_tpu
    pkm.on_tpu = lambda: True
    try:
        b = np.asarray(render_waves(sd, 12, 12, key, 0, 1, chunk_size=144))
    finally:
        pkm.on_tpu = real
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
