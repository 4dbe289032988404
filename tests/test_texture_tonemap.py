"""Texture evaluation, Perlin marble, and tonemap oracles."""

import numpy as np
import jax.numpy as jnp

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import perlin
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.texture import texture_value
from rust_ray_tracer_tpu.ops.tonemap import tonemap_mean, tonemap_sum


def make(world):
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 30.0, 1.0)
    return compile_scene(S.Scene(cam, list(world), [], (0, 0, 0)))


def eval_tex_of_first_material(sc, u, v, p):
    tid = sc.mat_tex[jnp.zeros(len(u), jnp.int32)]
    return np.asarray(texture_value(
        sc, tid, jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
        jnp.asarray(p, jnp.float32)))


def test_solid_color():
    sc = make([S.Sphere((0, 0, 0), 1.0,
                        S.Lambertian.from_rgb(0.1, 0.2, 0.7))])
    out = eval_tex_of_first_material(sc, [0.3], [0.4], [[1, 2, 3]])
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.7], rtol=1e-6)


def test_checker_sign_oracle():
    """sin(10x)sin(10y)sin(10z) < 0 -> odd (texture.rs:50-57)."""
    mat = S.Lambertian(S.Checker.from_colors((1, 0, 0), (0, 1, 0)))
    sc = make([S.Sphere((0, 0, 0), 1.0, mat)])
    pts = np.array([[0.05, 0.05, 0.05],     # product > 0 -> even (1,0,0)
                    [-0.05, 0.05, 0.05]])   # product < 0 -> odd (0,1,0)
    out = eval_tex_of_first_material(sc, [0, 0], [0, 0], pts)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)


def test_image_texture_nearest_and_vflip():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)   # row 0 = top; v flipped at lookup
    img[1, 1] = (0, 0, 1)
    mat = S.Lambertian(S.ImageTexture(data=img))
    sc = make([S.Sphere((0, 0, 0), 1.0, mat)])
    # v=0.9 -> cv=0.1 -> y=0 (top row); u=0.1 -> x=0
    out = eval_tex_of_first_material(sc, [0.1, 0.9], [0.9, 0.1],
                                     [[0, 0, 0], [0, 0, 0]])
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 1], atol=1e-6)


def test_missing_image_degrades_to_yellow():
    mat = S.Lambertian(S.ImageTexture(path="/nonexistent/earthmap.jpg"))
    sc = make([S.Sphere((0, 0, 0), 1.0, mat)])
    out = eval_tex_of_first_material(sc, [0.5], [0.5], [[0, 0, 0]])
    np.testing.assert_allclose(out[0], [1, 1, 0], atol=1e-6)  # texture.rs:129


def oracle_perlin_noise(vec, px, py, pz, p):
    """NumPy reimplementation of perlin.rs:33-56,86-105 for one point."""
    pf = np.floor(p)
    u, v, w = p - pf
    i, j, k = int(pf[0]), int(pf[1]), int(pf[2])
    uu = u * u * (3 - 2 * u)
    vv = v * v * (3 - 2 * v)
    ww = w * w * (3 - 2 * w)
    acc = 0.0
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                h = px[(i + di) & 255] ^ py[(j + dj) & 255] ^ pz[(k + dk) & 255]
                grad = vec[h]
                weight = np.array([u - di, v - dj, w - dk])
                acc += ((di * uu + (1 - di) * (1 - uu))
                        * (dj * vv + (1 - dj) * (1 - vv))
                        * (dk * ww + (1 - dk) * (1 - ww))
                        * np.dot(grad, weight))
    return acc


def test_perlin_noise_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    vec = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    perms = [rng.permutation(256).astype(np.int32) for _ in range(3)]
    pts = rng.uniform(-10, 10, (32, 3)).astype(np.float32)
    got = np.asarray(perlin.noise(jnp.asarray(vec), jnp.asarray(perms[0]),
                                  jnp.asarray(perms[1]), jnp.asarray(perms[2]),
                                  jnp.asarray(pts)))
    for idx in range(32):
        expect = oracle_perlin_noise(vec, *perms, pts[idx].astype(np.float64))
        np.testing.assert_allclose(got[idx], expect, rtol=1e-3, atol=1e-4)


def test_turb_is_abs_fractal_sum():
    rng = np.random.default_rng(8)
    vec = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    perms = [jnp.asarray(rng.permutation(256).astype(np.int32))
             for _ in range(3)]
    vecj = jnp.asarray(vec)
    p = jnp.asarray([[1.7, 2.3, -0.4]], jnp.float32)
    acc = jnp.zeros(1)
    tp, wgt = p, 1.0
    for _ in range(7):
        acc = acc + wgt * perlin.noise(vecj, *perms, tp)
        wgt *= 0.5
        tp = tp * 2
    np.testing.assert_allclose(
        np.asarray(perlin.turb(vecj, *perms, p)),
        np.abs(np.asarray(acc)), rtol=1e-5)


def test_marble_formula():
    """Noise texture = 0.5*(1+sin(scale*z + 10*turb)) (texture.rs:74-82)."""
    mat = S.Lambertian(S.Noise(4.0))
    sc = make([S.Sphere((0, 0, 0), 1.0, mat)])
    p = np.array([[0.3, -1.2, 2.5]], np.float32)
    out = eval_tex_of_first_material(sc, [0], [0], p)
    t = float(perlin.turb(sc.perlin_vec, sc.perlin_px, sc.perlin_py,
                          sc.perlin_pz, jnp.asarray(p))[0])
    expect = 0.5 * (1 + np.sin(4.0 * p[0, 2] + 10 * t))
    np.testing.assert_allclose(out[0], expect, rtol=1e-5)
    assert 0.0 <= out[0, 0] <= 1.0


class TestTonemap:
    def test_gamma_and_scale(self):
        """sqrt gamma, clamp 0.999, scale 256 truncate (vec3.rs:30-53)."""
        s = jnp.asarray([[0.25, 1.0, 4.0]])  # sums over 1 sample
        out = np.asarray(tonemap_sum(s, 1))
        assert out[0, 0] == int(256 * 0.5)
        assert out[0, 1] == int(256 * 0.999)
        assert out[0, 2] == int(256 * 0.999)

    def test_nan_to_zero(self):
        s = jnp.asarray([[jnp.nan, 0.25, jnp.nan]])
        out = np.asarray(tonemap_sum(s, 1))
        assert out[0, 0] == 0 and out[0, 2] == 0
        assert out[0, 1] == 128

    def test_sample_average(self):
        s = jnp.asarray([[1.0, 1.0, 1.0]])
        out4 = np.asarray(tonemap_sum(s, 4))   # mean 0.25 -> sqrt 0.5
        assert out4[0, 0] == 128

    def test_mean_equals_sum_path(self):
        m = jnp.asarray([[0.3, 0.6, 0.9]])
        np.testing.assert_array_equal(np.asarray(tonemap_mean(m, 16)),
                                      np.asarray(tonemap_sum(m * 16, 16)))

    def test_negative_clamped(self):
        out = np.asarray(tonemap_sum(jnp.asarray([[-0.5, 0.0, 0.1]]), 1))
        assert out[0, 0] == 0
