"""Wavefront occupancy metrics."""

import numpy as np
import jax

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.utils.metrics import RenderStats, occupancy_probe


def test_occupancy_empty_scene_dies_at_bounce_one():
    """All rays miss -> alive drops to 0 after bounce 0."""
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)
    sd = compile_scene(S.Scene(cam, [
        S.Sphere((100, 100, 100), 0.1, S.Lambertian.from_rgb(1, 1, 1)),
    ], [], (0.5, 0.5, 0.5)))
    st = occupancy_probe(sd, 16, 16, jax.random.PRNGKey(0), depth=3,
                         chunk_size=256)
    np.testing.assert_allclose(st.occupancy[0], 1.0)
    np.testing.assert_allclose(st.occupancy[1:], 0.0, atol=1e-6)
    np.testing.assert_allclose(st.depth_histogram[0], 1.0)
    assert "occupancy" in st.report()


def test_occupancy_enclosed_scene_stays_alive():
    """Rays inside a diffuse box stay alive through every bounce."""
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 40.0, 1.0)
    white = S.Lambertian.from_rgb(0.8, 0.8, 0.8)
    sd = compile_scene(S.Scene(
        cam, [S.Cuboid((-5, -5, -5), (5, 5, 5), white)], [], (0, 0, 0)))
    st = occupancy_probe(sd, 8, 8, jax.random.PRNGKey(1), depth=3,
                         chunk_size=64)
    np.testing.assert_allclose(st.occupancy, 1.0, atol=1e-6)
    assert st.mrays_per_s > 0
    assert st.lane_rays == 8 * 8 * 1 * 3
