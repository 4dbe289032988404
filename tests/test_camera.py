"""Camera ray generation vs the reference formulas (camera.rs:18-69)."""

import numpy as np
import jax.numpy as jnp

from rust_ray_tracer_tpu.ops.camera import (
    CameraData, generate_rays, look_at_rh, make_camera)


def oracle_get_ray(c2w, vfov_deg, aspect, x, y, w, h):
    """Reference get_ray (camera.rs:56-69): ndc through z=-1 plane."""
    scale = np.tan(np.deg2rad(vfov_deg) / 2)
    px = (2.0 * (x + 0.5) / w - 1.0) * scale * aspect
    py = (2.0 * (y + 0.5) / h - 1.0) * scale
    origin = c2w[:, :3] @ np.zeros(3) + c2w[:, 3]
    point = c2w[:, :3] @ np.array([px, py, -1.0]) + c2w[:, 3]
    return origin, point - origin


def test_identity_camera_rays():
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 90.0, 2.0)
    xs = jnp.asarray([0.0, 99.5, 199.0])
    ys = jnp.asarray([0.0, 49.5, 99.0])
    o, d, t = generate_rays(cam, xs, ys, 200, 100, jnp.zeros(3))
    c2w = np.eye(3, 4, dtype=np.float32)
    for i, (x, y) in enumerate(zip([0.0, 99.5, 199.0], [0.0, 49.5, 99.0])):
        eo, ed = oracle_get_ray(c2w, 90.0, 2.0, x, y, 200, 100)
        np.testing.assert_allclose(np.asarray(o[i]), eo, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d[i]), ed, atol=1e-5)


def test_center_ray_points_down_negz():
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    o, d, _ = generate_rays(cam, jnp.asarray([49.5]), jnp.asarray([49.5]),
                            100, 100, jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-5)


def test_direction_unnormalized():
    # corner ray direction length > 1 (the reference never normalizes)
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 90.0, 1.0)
    _, d, _ = generate_rays(cam, jnp.asarray([0.0]), jnp.asarray([0.0]),
                            10, 10, jnp.zeros(1))
    assert float(jnp.linalg.norm(d[0])) > 1.0


def test_shutter_time_mapping():
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 30.0, 1.0,
                      time0=2.0, time1=6.0)
    _, _, t = generate_rays(cam, jnp.zeros(3), jnp.zeros(3), 8, 8,
                            jnp.asarray([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(t), [2.0, 4.0, 6.0], atol=1e-6)


def test_look_at_rh_matches_glam():
    """glam Affine3A::look_at_rh oracle: rows (s, u, -f), trans -R@eye."""
    eye = np.array([13.0, -2.0, 3.0], np.float32)
    center = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    m = np.asarray(look_at_rh(eye, center, up))
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    rot = np.stack([s, u, -f])
    np.testing.assert_allclose(m[:, :3], rot, atol=1e-6)
    np.testing.assert_allclose(m[:, 3], -rot @ eye, atol=1e-5)
    # world->view property: transforms eye to origin, center to -z axis
    np.testing.assert_allclose(m[:, :3] @ eye + m[:, 3], 0.0, atol=1e-5)
    cv = m[:, :3] @ center + m[:, 3]
    assert cv[2] < 0 and abs(cv[0]) < 1e-5 and abs(cv[1]) < 1e-5


def test_camera_pytree_differentiable():
    import jax

    def f(scale):
        cam = CameraData(jnp.eye(3, 4), scale, jnp.float32(1.0),
                         jnp.float32(0.0), jnp.float32(1.0))
        _, d, _ = generate_rays(cam, jnp.asarray([0.0]), jnp.asarray([0.0]),
                                10, 10, jnp.zeros(1))
        return jnp.sum(d ** 2)

    g = jax.grad(f)(jnp.float32(0.5))
    assert np.isfinite(float(g)) and float(g) != 0.0
