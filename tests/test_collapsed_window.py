"""Collapsed t-window invariant: a ray whose window is empty
(``t_max <= t_min``) must hit NOTHING, for every primitive kind, in
every search backend.

The wavefront integrator encodes dead lanes as ``t_max = -1`` and relies
on every kernel — the XLA candidate paths, the unified fused-search
kernel, the standalone sphere/quad kernels and the cluster mask pre-pass
— rejecting every primitive kind under that window (reference contract:
``geometry/mod.rs:137-153`` passes a shrinking ``t_max`` and
``constant_medium.rs:46-80`` clamps the exit by it). This file pins the
invariant per kind per backend, plus lane isolation: collapsing one
lane's window must not perturb any other lane's winner.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pim
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.intersect import intersect, intersect_select

MAT = S.Lambertian.from_rgb(0.5, 0.5, 0.5)


def make(world):
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 30.0, 1.0)
    return compile_scene(S.Scene(cam, list(world), [], (0, 0, 0)))


# one (scene, hitting ray) per primitive kind; every ray hits with an
# open window so the collapsed result is a real rejection, not a miss
KINDS = {
    "sphere": (lambda: make([S.Sphere((0, 0, -5), 1.0, MAT)]),
               [0, 0, 0], [0, 0, -1]),
    "moving_sphere": (
        lambda: make([S.MovingSphere((0, 0, -5), (0, 1, -5),
                                     0.0, 1.0, 1.0, MAT)]),
        [0, 0, 0], [0, 0, -1]),
    "triangle": (
        lambda: make([S.Triangle((-1, -1, -4), (1, -1, -4), (0, 1, -4),
                                 MAT, double_sided=True)]),
        [0, 0, 0], [0, 0, -1]),
    "quad": (lambda: make([S.XZRect(-1, 1, -5, -3, -0.5, MAT)]),
             [0, 0, 0], [0, -0.5, -4]),
    "cuboid": (lambda: make([S.Cuboid((-1, -1, -6), (1, 1, -4), MAT)]),
               [0, 0, 0], [0, 0, -1]),
}


def _med_scene():
    return make([S.ConstantMedium.from_color(
        S.Sphere((0, 0, -5), 1.5, MAT), 10.0, (1, 1, 1))])


@pytest.mark.parametrize("kind", sorted(KINDS))
def test_xla_collapsed_window_rejects(kind):
    mk, o, d = KINDS[kind]
    sc = mk()
    o = jnp.asarray(o, jnp.float32).reshape(1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(1, 3)
    t = jnp.zeros(1)
    h_open = intersect(sc, o, d, t)
    assert bool(h_open.hit[0]), f"{kind}: setup ray must hit when open"
    h_dead = intersect(sc, o, d, t, t_max=jnp.asarray([-1.0]))
    assert not bool(h_dead.hit[0]), f"{kind}: collapsed window must miss"
    assert not np.isfinite(float(h_dead.t[0]))


def test_xla_collapsed_window_rejects_medium():
    sc = _med_scene()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t = jnp.zeros(1)
    med_u = jnp.full((1, 1), 0.5)       # scatters well inside the chord
    h_open = intersect(sc, o, d, t, med_u=med_u)
    assert bool(h_open.hit[0]), "medium: setup ray must scatter when open"
    h_dead = intersect(sc, o, d, t, med_u=med_u,
                       t_max=jnp.asarray([-1.0]))
    assert not bool(h_dead.hit[0]), "medium: collapsed window must miss"


class TestFusedSearchKernel:
    """Unified Pallas search kernel (interpret mode): per-kind rejection
    + lane isolation under mixed alive/dead windows."""

    @pytest.fixture(autouse=True)
    def interpret(self):
        pim.INTERPRET = True
        yield
        pim.INTERPRET = False

    def _mixed_scene(self):
        # tri + sphere + quad in one scene -> unified kernel covers all
        # three kinds in a single launch
        return make([
            S.Triangle((-1, -1, -4), (1, -1, -4), (0, 1, -4), MAT,
                       double_sided=True),
            S.Sphere((3, 0, -5), 1.0, MAT),
            S.XZRect(2, 4, -6, -4, -0.5, MAT),
        ])

    def test_collapsed_rejects_and_lanes_isolated(self):
        sc = self._mixed_scene()
        # 4 lanes: hits tri, hits sphere, hits quad (from above), stray
        o = jnp.asarray([[0, 0, 0], [3, 0, 0], [3, 2, -5], [0, 5, 5]],
                        jnp.float32)
        d = jnp.asarray([[0, 0, -1], [0, 0, -1], [0, -1, 0], [0, 1, 0]],
                        jnp.float32)
        tm = jnp.zeros(4)
        t_min = jnp.full(4, 1e-4)
        open_w = jnp.full(4, jnp.inf)

        bt0, bk0, bi0 = pim.fused_search(sc, o, d, tm, t_min, open_w)
        assert np.isfinite(np.asarray(bt0[:3])).all(), "setup must hit"

        # collapse each hitting lane in turn: that lane must miss, the
        # OTHER lanes' winners must be bitwise unchanged (no cross-lane
        # winner update from a dead lane)
        for dead in range(3):
            t_max = open_w.at[dead].set(-1.0)
            bt, bk, bi = pim.fused_search(sc, o, d, tm, t_min, t_max)
            assert not np.isfinite(float(bt[dead])), f"lane {dead}"
            keep = np.asarray([i for i in range(4) if i != dead])
            np.testing.assert_array_equal(np.asarray(bt)[keep],
                                          np.asarray(bt0)[keep])
            np.testing.assert_array_equal(np.asarray(bk)[keep],
                                          np.asarray(bk0)[keep])
            np.testing.assert_array_equal(np.asarray(bi)[keep],
                                          np.asarray(bi0)[keep])

        # all lanes dead: nothing survives
        bt, bk, bi = pim.fused_search(sc, o, d, tm, t_min,
                                      jnp.full(4, -1.0))
        assert not np.isfinite(np.asarray(bt)).any()

    def test_mask_prepass_collapsed_rejects(self):
        sc = self._mixed_scene()
        n = pim.BC                      # mask pre-pass works per ray tile
        o = jnp.zeros((n, 3), jnp.float32)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
        m_open = pim._tile_cluster_mask(
            o, d, sc.tri_cluster_min, sc.tri_cluster_max,
            jnp.full(n, 1e-4), jnp.full(n, jnp.inf))
        assert bool(np.asarray(m_open).any()), "setup: cluster must enter"
        m_dead = pim._tile_cluster_mask(
            o, d, sc.tri_cluster_min, sc.tri_cluster_max,
            jnp.full(n, 1e-4), jnp.full(n, -1.0))
        assert not bool(np.asarray(m_dead).any())


class TestStandaloneKernels:
    """sph_search / quad_search (the >= CLUSTER table paths)."""

    @pytest.fixture(autouse=True)
    def interpret(self):
        pim.INTERPRET = True
        yield
        pim.INTERPRET = False

    def test_sphere_kernel(self):
        sc = make([S.Sphere((0, 0, -5), 1.0, MAT)])
        from rust_ray_tracer_tpu.ops.pallas_sphere import sph_search
        o = jnp.zeros((2, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (2, 3))
        tm = jnp.zeros(2)
        t_min = jnp.full(2, 1e-4)
        t, _ = sph_search(sc, o, d, tm, t_min,
                          jnp.asarray([jnp.inf, -1.0]))
        assert np.isfinite(float(t[0])) and not np.isfinite(float(t[1]))

    def test_quad_kernel(self):
        sc = make([S.XZRect(-1, 1, -6, -4, -0.5, MAT)])
        from rust_ray_tracer_tpu.ops.pallas_quad import quad_search
        o = jnp.zeros((2, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, -0.5, -5.0]), (2, 3))
        t_min = jnp.full(2, 1e-4)
        t, _ = quad_search(sc, o, d, t_min, jnp.asarray([jnp.inf, -1.0]))
        assert np.isfinite(float(t[0])) and not np.isfinite(float(t[1]))


def test_select_collapsed_all_kinds_one_scene():
    """intersect_select end-to-end (XLA path): one scene containing every
    kind, every lane aimed at its kind, all windows collapsed -> no lane
    reports a hit and every kind is KIND_NONE."""
    sc = make([
        S.Sphere((0, 0, -5), 1.0, MAT),
        S.Triangle((2, -1, -4), (4, -1, -4), (3, 1, -4), MAT,
                   double_sided=True),
        S.XZRect(5, 7, -6, -4, -0.5, MAT),
        S.ConstantMedium.from_color(
            S.Sphere((9, 0, -5), 1.5, MAT), 10.0, (1, 1, 1)),
    ])
    o = jnp.asarray([[0, 0, 0], [3, 0, 0], [6, 2, -5], [9, 0, 0]],
                    jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1], [0, -1, 0], [0, 0, -1]],
                    jnp.float32)
    tm = jnp.zeros(4)
    med_u = jnp.full((4, 1), 0.5)
    sel_open = intersect_select(sc, o, d, tm, med_u=med_u)
    assert np.asarray(sel_open.hit).all(), "setup: every lane must hit"
    sel = intersect_select(sc, o, d, tm, med_u=med_u,
                           t_max=jnp.full(4, -1.0))
    assert not np.asarray(sel.hit).any()
    from rust_ray_tracer_tpu.ops.intersect import KIND_NONE
    np.testing.assert_array_equal(np.asarray(sel.kind),
                                  np.full(4, KIND_NONE))
