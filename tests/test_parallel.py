"""Sharded rendering on the 8-virtual-device CPU mesh (SURVEY.md §4):
bitwise parity with the sequential renderer, gradient psum correctness,
checkpoint/resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.integrator import render_waves
from rust_ray_tracer_tpu.parallel import (
    make_mesh, render_image_sharded, render_waves_sharded)
from rust_ray_tracer_tpu.parallel.checkpoint import (
    RenderState, load_state, render_with_checkpoints, save_state)


def scene():
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 45.0, 1.0)
    return compile_scene(S.Scene(cam, [
        S.Sphere((0, 0, -4), 1.2, S.Lambertian.from_rgb(0.6, 0.4, 0.3)),
        S.XYRect(-3.0, 3.0, -3.0, 3.0, 2.0,
                 S.DiffuseLight.from_color((4, 4, 4))),
    ], [S.XZRect(-1.0, 1.0, -1.0, 1.0, 1.9,
                 S.DiffuseLight.from_color((4, 4, 4)))], (0.2, 0.3, 0.4)))


W, H, CS = 24, 16, 64


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_equals_sequential_bitwise(n_dev):
    sd = scene()
    k = jax.random.PRNGKey(0)
    seq = np.asarray(render_waves(sd, W, H, k, 0, 2, chunk_size=CS))
    mesh = make_mesh(n_devices=n_dev)
    shd = np.asarray(render_waves_sharded(sd, W, H, k, 0, 2, mesh,
                                          chunk_size=CS))
    np.testing.assert_array_equal(seq, shd)


@pytest.mark.slow
def test_device_count_invariance():
    sd = scene()
    k = jax.random.PRNGKey(1)
    imgs = [np.asarray(render_waves_sharded(
        sd, W, H, k, 0, 1, make_mesh(n_devices=n), chunk_size=CS))
        for n in (1, 2, 4, 8)]
    for other in imgs[1:]:
        np.testing.assert_array_equal(imgs[0], other)


def test_sharded_render_image_mean():
    sd = scene()
    mesh = make_mesh(n_devices=8)
    img = np.asarray(render_image_sharded(sd, W, H, 4, jax.random.PRNGKey(2),
                                          mesh, chunk_size=CS))
    assert np.isfinite(img).all()
    assert img.shape == (H, W, 3)


@pytest.mark.slow
def test_sharded_grad_psum_matches_sequential():
    """Scene-parameter gradients through the sharded renderer equal the
    sequential ones: shard_map's transpose psums the replicated-scene
    cotangants over the mesh."""
    sd = scene()
    k = jax.random.PRNGKey(3)
    mesh = make_mesh(n_devices=8)

    def loss_seq(c):
        s = sd._replace(tex_color=sd.tex_color.at[..., :].mul(c))
        return jnp.mean(render_waves(s, W, H, k, 0, 1, chunk_size=CS))

    def loss_shd(c):
        s = sd._replace(tex_color=sd.tex_color.at[..., :].mul(c))
        return jnp.mean(render_waves_sharded(s, W, H, k, 0, 1, mesh,
                                             chunk_size=CS))

    g_seq = float(jax.grad(loss_seq)(jnp.float32(1.0)))
    g_shd = float(jax.grad(loss_shd)(jnp.float32(1.0)))
    assert np.isfinite(g_seq) and g_seq != 0.0
    np.testing.assert_allclose(g_shd, g_seq, rtol=1e-5)


def test_jit_sharded():
    sd = scene()
    mesh = make_mesh(n_devices=8)
    f = jax.jit(lambda s, k: render_waves_sharded(s, W, H, k, 0, 1, mesh,
                                                  chunk_size=CS))
    a = np.asarray(f(sd, jax.random.PRNGKey(4)))
    b = np.asarray(render_waves(sd, W, H, jax.random.PRNGKey(4), 0, 1,
                                chunk_size=CS))
    np.testing.assert_array_equal(a, b)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        st = RenderState(acc=np.random.default_rng(0)
                         .random((4, 6, 3)).astype(np.float32),
                         waves_done=3, seed=7, width=6, height=4,
                         chunk_size=64, depth=4)
        p = str(tmp_path / "r.ckpt")
        save_state(p, st)
        back = load_state(p)
        np.testing.assert_array_equal(back.acc, st.acc)
        assert (back.waves_done, back.seed, back.width, back.height,
                back.chunk_size, back.depth) == (3, 7, 6, 4, 64, 4)

    def test_resume_bitwise_exact(self, tmp_path):
        sd = scene()
        p = str(tmp_path / "r.ckpt")
        # uninterrupted
        whole = render_with_checkpoints(sd, W, H, 4, 5,
                                        str(tmp_path / "w.ckpt"),
                                        ckpt_every=99, chunk_size=CS)
        # interrupted after 2 waves: run to 2, then resume to 4
        render_with_checkpoints(sd, W, H, 2, 5, p, ckpt_every=1,
                                chunk_size=CS)
        assert load_state(p).waves_done == 2
        resumed = render_with_checkpoints(sd, W, H, 4, 5, p, ckpt_every=2,
                                          chunk_size=CS)
        np.testing.assert_array_equal(whole, resumed)

    def test_mismatched_settings_rejected(self, tmp_path):
        sd = scene()
        p = str(tmp_path / "r.ckpt")
        render_with_checkpoints(sd, W, H, 1, 5, p, ckpt_every=1,
                                chunk_size=CS)
        with pytest.raises(ValueError):
            render_with_checkpoints(sd, W, H, 2, 6, p, ckpt_every=1,
                                    chunk_size=CS)

    def test_sharded_resume_matches_sequential(self, tmp_path):
        sd = scene()
        mesh = make_mesh(n_devices=4)
        seq = render_with_checkpoints(sd, W, H, 3, 9,
                                      str(tmp_path / "a.ckpt"),
                                      ckpt_every=99, chunk_size=CS)
        shd = render_with_checkpoints(sd, W, H, 3, 9,
                                      str(tmp_path / "b.ckpt"),
                                      ckpt_every=1, chunk_size=CS,
                                      mesh=mesh)
        np.testing.assert_array_equal(seq, shd)


def test_make_mesh_validates():
    with pytest.raises(ValueError):
        make_mesh(n_devices=9)
    assert make_mesh(n_devices=3).devices.size == 3
