"""Config-5 composite scene (models/composite.py): multi-mesh + procedural
geometry, material+camera gradients, sharded parity on the 8-virtual-device
CPU mesh (BASELINE.json config 5 — the reference has no such scene; its
vocabulary comes from scene.rs:33-391)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves
from rust_ray_tracer_tpu.parallel import make_mesh, render_waves_sharded

ASSETS = "/root/reference/assets"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "MetalRoughSpheres",
                                    "MetalRoughSpheres.gltf")),
    reason="reference assets not present")

W, H, CS = 24, 16, 128


@pytest.fixture(scope="module")
def sd():
    from rust_ray_tracer_tpu.models.composite import composite_scene
    # 1 PBR sphere keeps the CPU matmul tractable (~11.6k tris)
    return compile_scene(composite_scene(16 / 9, seed=0, n_spheres=1))


def test_composition(sd):
    # suzanne (968) + one PBR sphere (10600) + dome-free world
    assert sd.n_tris >= 968 + 10600
    # ground + glass + fuzzy metal + perlin spheres
    assert sd.n_spheres >= 4
    # pedestal cuboid (6 rects) + lamp
    assert sd.n_quads >= 7
    assert sd.n_lights == 1


def test_builder_registry():
    from rust_ray_tracer_tpu.models import builders
    sc = builders.get_scene("composite", 16 / 9)
    assert len(sc.lights) == 1


def test_render_finite_and_lit(sd):
    img = np.asarray(render_waves(sd, W, H, jax.random.PRNGKey(0), 0, 2,
                                  chunk_size=CS))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01          # lamp + background actually light it
    assert img.max() > 0.5            # some path reaches the lamp


@pytest.mark.slow
def test_sharded_parity(sd):
    """Bitwise across device counts (same compiled chunk body); vs the
    sequential renderer only ~1e-5-close: XLA fuses the [C,10]@[10,4T]
    Plücker matmul differently inside shard_map than in the sequential
    program, reassociating the 10-term dot (parallel/render.py
    "Bitwise exactness")."""
    k = jax.random.PRNGKey(1)
    seq = np.asarray(render_waves(sd, W, H, k, 0, 1, chunk_size=CS))
    imgs = {n: np.asarray(render_waves_sharded(
        sd, W, H, k, 0, 1, make_mesh(n_devices=n), chunk_size=CS))
        for n in (2, 4, 8)}
    np.testing.assert_array_equal(imgs[2], imgs[8])
    np.testing.assert_array_equal(imgs[4], imgs[8])
    np.testing.assert_allclose(seq, imgs[8], atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_material_and_camera_grads(sd):
    """The config-5 gradient surface: every float leaf — materials,
    textures, vertices AND camera pose/fov — is differentiable."""
    diff, static = partition(sd)
    k = jax.random.PRNGKey(2)

    def loss(diff):
        return jnp.mean(render_waves(combine(diff, static), W, H, k, 0, 1,
                                     chunk_size=CS))

    g = jax.grad(loss)(diff)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    gc2w = np.asarray(g.camera.c2w)
    gscale = np.asarray(g.camera.scale)
    assert np.abs(gc2w).max() > 0     # camera pose grad is live
    assert np.abs(gscale) > 0         # vfov grad is live
    assert np.abs(np.asarray(g.tex_color)).max() > 0
