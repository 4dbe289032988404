"""Pallas intersection kernel vs the XLA reference path (interpret mode on
CPU; the same comparison runs on real TPU hardware in verification)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import CLUSTER, compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pk
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.intersect import (
    _ray_features, _tri_coeffs, _tri_valid, INF)


@pytest.fixture(autouse=True)
def interpret_mode():
    pk.INTERPRET = True
    yield
    pk.INTERPRET = False


def make_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    dbl = (rng.random(n) < 0.3)
    return v0, e1, e2, dbl


def xla_reference(v0, e1, e2, dbl, o, d, t_min, t_max):
    feats = _ray_features(o, d)
    det_c, u_c, v_c, t_c = _tri_coeffs(v0, e1, e2)
    det = feats @ det_c
    u = np.where(np.abs(det) > 0, (feats @ u_c) / np.where(det == 0, 1, det),
                 0)
    v = np.where(np.abs(det) > 0, (feats @ v_c) / np.where(det == 0, 1, det),
                 0)
    t = np.where(np.abs(det) > 0, (feats @ t_c) / np.where(det == 0, 1, det),
                 0)
    dn = np.linalg.norm(d, axis=-1, keepdims=True).astype(np.float32)
    valid = np.asarray(_tri_valid(jnp.asarray(det), jnp.asarray(u),
                                  jnp.asarray(v), jnp.asarray(t),
                                  jnp.asarray(dbl)[None, :],
                                  jnp.asarray(t_min)[:, None],
                                  jnp.asarray(t_max)[:, None],
                                  jnp.asarray(dn)))
    tt = np.where(valid, t, np.inf)
    idx = tt.argmin(1)
    return tt[np.arange(len(idx)), idx], idx


def cluster_boxes(v0, e1, e2, n_real):
    corners = np.stack([v0, v0 + e1, v0 + e2], 1)
    lo, hi = corners.min(1), corners.max(1)
    lo[n_real:] = np.inf
    hi[n_real:] = -np.inf
    k = v0.shape[0] // CLUSTER
    return (lo.reshape(k, CLUSTER, 3).min(1),
            hi.reshape(k, CLUSTER, 3).max(1))


@pytest.mark.parametrize("n_tris,n_rays", [(CLUSTER, 64), (3 * CLUSTER, 300)])
def test_kernel_matches_xla(n_tris, n_rays):
    v0, e1, e2, dbl = make_tris(n_tris)
    rng = np.random.default_rng(1)
    o = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    t_min = np.full(n_rays, 1e-4, np.float32)
    t_max = np.full(n_rays, np.inf, np.float32)

    ref_t, ref_i = xla_reference(v0, e1, e2, dbl, o, d, t_min, t_max)
    det_c, u_c, v_c, t_c = _tri_coeffs(jnp.asarray(v0), jnp.asarray(e1),
                                       jnp.asarray(e2))
    cl_min, cl_max = cluster_boxes(v0, e1, e2, n_tris)
    got_t, got_i = pk.tri_search(
        _ray_features(jnp.asarray(o), jnp.asarray(d)), det_c, u_c, v_c,
        t_c, jnp.asarray(dbl), jnp.asarray(t_min), jnp.asarray(t_max),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cl_min),
        jnp.asarray(cl_max))
    got_t, got_i = np.asarray(got_t), np.asarray(got_i)

    hit_ref = np.isfinite(ref_t)
    hit_got = np.isfinite(got_t)
    np.testing.assert_array_equal(hit_ref, hit_got)
    np.testing.assert_allclose(got_t[hit_got], ref_t[hit_ref], rtol=1e-5)
    np.testing.assert_array_equal(got_i[hit_got], ref_i[hit_ref])


def test_dead_rays_hit_nothing():
    v0, e1, e2, dbl = make_tris(CLUSTER)
    n = 32
    o = np.zeros((n, 3), np.float32)
    d = np.tile([0, 0, -1.0], (n, 1)).astype(np.float32)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.full(n, -1.0, np.float32)   # collapsed window = dead
    det_c, u_c, v_c, t_c = _tri_coeffs(*map(jnp.asarray, (v0, e1, e2)))
    cl_min, cl_max = cluster_boxes(v0, e1, e2, CLUSTER)
    got_t, _ = pk.tri_search(
        _ray_features(jnp.asarray(o), jnp.asarray(d)), det_c, u_c, v_c,
        t_c, jnp.asarray(dbl), jnp.asarray(t_min), jnp.asarray(t_max),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cl_min),
        jnp.asarray(cl_max))
    assert not np.isfinite(np.asarray(got_t)).any()


def test_cull_is_conservative_through_integrator():
    """End-to-end: a triangle scene rendered via the full intersect path
    on CPU (XLA) must agree with the kernel run in interpret mode."""
    import os

    from rust_ray_tracer_tpu.ops.intersect import intersect

    world = [S.Triangle(*t) for t in [
        ((-1, -1, -4), (1, -1, -4), (0, 1, -4),
         S.Lambertian.from_rgb(1, 0, 0)),
        ((2, -1, -6), (4, -1, -6), (3, 1, -6),
         S.Lambertian.from_rgb(0, 1, 0)),
    ]]
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    sd = compile_scene(S.Scene(cam, world, [], (0, 0, 0)))
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-2, 2, (128, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((128, 3)), jnp.float32)
    tt = jnp.zeros(128)

    h_xla = intersect(sd, o, d, tt)

    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    real_on_tpu = pkm.on_tpu
    pkm.on_tpu = lambda: True     # force kernel path (interpret mode)
    try:
        h_k = intersect(sd, o, d, tt)
    finally:
        pkm.on_tpu = real_on_tpu

    np.testing.assert_array_equal(np.asarray(h_xla.hit), np.asarray(h_k.hit))
    m = np.asarray(h_xla.hit)
    np.testing.assert_allclose(np.asarray(h_xla.t)[m],
                               np.asarray(h_k.t)[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(h_xla.mat)[m],
                                  np.asarray(h_k.mat)[m])


@pytest.mark.parametrize("packed", [False, True])
def test_unified_search_multicluster_mixed(packed):
    """fused_search (tris spanning several clusters + spheres + quads,
    cross-kind select) vs the XLA consider-chain, including dead lanes
    and motion-blur times — with both tri-table layouts (streamed
    coefficient tables / packed vertices + in-kernel coeff build)."""
    from rust_ray_tracer_tpu.ops.intersect import intersect

    rng = np.random.default_rng(9)
    world = []
    mats = [S.Lambertian.from_rgb(0.5, 0.5, 0.5),
            S.Metal((0.9, 0.8, 0.7), 0.1)]
    for i in range(400):     # > 3 clusters of 128
        v0 = rng.uniform(-4, 4, 3).astype(np.float32)
        v0[2] -= 6.0
        e = rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32)
        world.append(S.Triangle(v0, v0 + e[0], v0 + e[1], mats[i % 2],
                                double_sided=bool(i % 3)))
    for i in range(5):
        c = rng.uniform(-3, 3, 3).astype(np.float32)
        c[2] -= 5.0
        world.append(S.Sphere(c, 0.5, mats[0]))
    world.append(S.MovingSphere((0, 0, -3), (1, 0, -3), 0.0, 1.0, 0.4,
                                mats[1]))
    world.append(S.XZRect(-3, 3, -8, -3, -2.0, mats[0]))
    world.append(S.Cuboid((2, -2, -5), (3, -1, -4), mats[1]))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    sd = compile_scene(S.Scene(cam, world, [], (0, 0, 0)))
    assert sd.n_tris > 3 * CLUSTER and sd.n_spheres and sd.n_quads

    C = 600
    o = jnp.asarray(rng.uniform(-2, 2, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.asarray(rng.random(C), jnp.float32)
    t_max = jnp.where(jnp.arange(C) % 7 == 0, -1.0, jnp.inf)  # dead lanes

    h_xla = intersect(sd, o, d, tt, t_max=t_max)

    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    real_on_tpu = pkm.on_tpu
    pkm.on_tpu = lambda: True
    pkm.INKERNEL_COEFFS = packed
    try:
        h_k = intersect(sd, o, d, tt, t_max=t_max)
    finally:
        pkm.on_tpu = real_on_tpu
        pkm.INKERNEL_COEFFS = None

    np.testing.assert_array_equal(np.asarray(h_xla.hit), np.asarray(h_k.hit))
    m = np.asarray(h_xla.hit)
    assert m.any() and (~m).any()
    np.testing.assert_allclose(np.asarray(h_xla.t)[m],
                               np.asarray(h_k.t)[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(h_xla.mat)[m],
                                  np.asarray(h_k.mat)[m])
    np.testing.assert_allclose(np.asarray(h_xla.normal)[m],
                               np.asarray(h_k.normal)[m],
                               rtol=2e-4, atol=2e-5)


def test_adaptive_cluster_width():
    """Big meshes get wider clusters (K capped at MAX_CLUSTERS) and the
    kernels derive the width from the compiled shapes: same scene
    compiled at cluster 128 and 256 must intersect identically."""
    from rust_ray_tracer_tpu.models.scene import MAX_CLUSTERS
    from rust_ray_tracer_tpu.ops.intersect import intersect

    rng = np.random.default_rng(11)
    mats = [S.Lambertian.from_rgb(0.5, 0.5, 0.5)]
    world = []
    for i in range(300):
        v0 = rng.uniform(-4, 4, 3).astype(np.float32)
        v0[2] -= 6.0
        e = rng.uniform(-0.5, 0.5, (2, 3)).astype(np.float32)
        world.append(S.Triangle(v0, v0 + e[0], v0 + e[1], mats[0],
                                double_sided=True))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    scene = S.Scene(cam, world, [], (0, 0, 0))
    sd128 = compile_scene(scene, tri_pad=128)
    sd256 = compile_scene(scene, tri_pad=256)
    assert sd128.tri_cluster_min.shape[0] == 3   # ceil(300/128)
    assert sd256.tri_cluster_min.shape[0] == 2

    # the adaptive default picks 128 here (small mesh) and the doubling
    # rule caps K for huge ones
    assert compile_scene(scene).tri_v0.shape[0] % 128 == 0
    tri_pad, n = 128, MAX_CLUSTERS * 128 + 1
    while n > MAX_CLUSTERS * tri_pad:
        tri_pad *= 2
    assert tri_pad == 256

    C = 500
    o = jnp.asarray(rng.uniform(-2, 2, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.zeros(C, jnp.float32)

    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm
    real_on_tpu = pkm.on_tpu
    pkm.on_tpu = lambda: True
    try:
        h128 = intersect(sd128, o, d, tt)
        h256 = intersect(sd256, o, d, tt)
    finally:
        pkm.on_tpu = real_on_tpu

    np.testing.assert_array_equal(np.asarray(h128.hit), np.asarray(h256.hit))
    m = np.asarray(h128.hit)
    assert m.any()
    np.testing.assert_allclose(np.asarray(h128.t)[m],
                               np.asarray(h256.t)[m], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h128.mat)[m],
                                  np.asarray(h256.mat)[m])


def test_search_order_compaction_exact():
    """The big-mesh search-order permutation (alive-first Morton) must
    not change a single result: per ray the cluster sweep order and all
    tie-breaks are position-independent, so intersect() output is
    bitwise identical with the sort forced on vs off."""
    from rust_ray_tracer_tpu.ops.intersect import intersect

    rng = np.random.default_rng(21)
    mats = [S.Lambertian.from_rgb(0.5, 0.5, 0.5)]
    world = []
    for i in range(500):
        v0 = rng.uniform(-4, 4, 3).astype(np.float32)
        v0[2] -= 6.0
        e = rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32)
        world.append(S.Triangle(v0, v0 + e[0], v0 + e[1], mats[0],
                                double_sided=True))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    sd = compile_scene(S.Scene(cam, world, [], (0, 0, 0)))

    C = 700
    o = jnp.asarray(rng.uniform(-2, 2, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.zeros(C, jnp.float32)
    t_max = jnp.where(jnp.arange(C) % 3 == 0, -1.0, jnp.inf)  # dead mix

    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm

    real_on_tpu, real_min = pkm.on_tpu, pkm.PACKED_MIN_TRIS
    pkm.on_tpu = lambda: True
    try:
        h_plain = intersect(sd, o, d, tt, t_max=t_max)
        pkm.PACKED_MIN_TRIS = 1          # force the sorted search path
        h_sort = intersect(sd, o, d, tt, t_max=t_max)
    finally:
        pkm.on_tpu, pkm.PACKED_MIN_TRIS = real_on_tpu, real_min

    for f in ("hit", "t", "p", "normal", "u", "v", "mat"):
        np.testing.assert_array_equal(np.asarray(getattr(h_plain, f)),
                                      np.asarray(getattr(h_sort, f)),
                                      err_msg=f)


def test_entry_mask_kernel_matches_xla_mask():
    """The Pallas entry-distance kernel must agree with the XLA slab
    mask exactly: entry finite <-> mask 1, and finite entries must be
    valid lower bounds (>= t_min, <= any true hit t)."""
    from rust_ray_tracer_tpu.ops.pallas_intersect import (
        _pad_axis, _tile_cluster_mask, tile_cluster_enter_pallas)

    rng = np.random.default_rng(5)
    K = 7
    cl_min = rng.uniform(-5, 4, (K, 3)).astype(np.float32)
    cl_max = cl_min + rng.uniform(0.1, 2.0, (K, 3)).astype(np.float32)
    # one empty (inverted) cluster, like compile_scene's all-pad boxes
    cl_min[3], cl_max[3] = np.inf, -np.inf
    C = 512
    o = rng.uniform(-6, 6, (C, 3)).astype(np.float32)
    d = rng.standard_normal((C, 3)).astype(np.float32)
    d[7] = 0.0                         # degenerate direction
    t_min = np.full(C, 1e-4, np.float32)
    t_max = np.where(np.arange(C) % 5 == 0, -np.inf,
                     np.inf).astype(np.float32)   # dead lanes

    op = _pad_axis(jnp.asarray(o), 256, 0, 0.0)
    dp = _pad_axis(jnp.asarray(d), 256, 0, 0.0)
    tminp = _pad_axis(jnp.asarray(t_min)[:, None], 256, 0, 0.0)[:, 0]
    tmaxp = _pad_axis(jnp.asarray(t_max)[:, None], 256, 0, -np.inf)[:, 0]

    ent = np.asarray(tile_cluster_enter_pallas(
        op, dp, jnp.asarray(cl_min), jnp.asarray(cl_max), tminp, tmaxp))
    mask = np.asarray(_tile_cluster_mask(
        op, dp, jnp.asarray(cl_min), jnp.asarray(cl_max), tminp, tmaxp))
    np.testing.assert_array_equal(np.isfinite(ent), mask.astype(bool))
    assert (ent[np.isfinite(ent)] >= 1e-4).all()
    assert not np.isfinite(ent[:, 3]).any()       # empty cluster


def test_subcluster_bitmask_exact():
    """Two-level hierarchy: with wide clusters (tri_pad=512 -> 4 sub-
    spans of 128) the packed kernel sweeps only bitmask-surviving
    sub-blocks; results must equal the XLA path and the non-packed
    kernel bitwise (the sub-split only changes which tiles are
    *skipped*, never a winner)."""
    from rust_ray_tracer_tpu.ops.intersect import intersect

    rng = np.random.default_rng(21)
    mats = [S.Lambertian.from_rgb(0.5, 0.5, 0.5)]
    world = []
    for i in range(1000):
        v0 = rng.uniform(-6, 6, 3).astype(np.float32)
        v0[2] -= 8.0
        e = rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32)
        world.append(S.Triangle(v0, v0 + e[0], v0 + e[1], mats[0],
                                double_sided=bool(i % 2)))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    # sub-spans are off by default since the round-4 hardware regression
    # (models/scene.py); the kernel path stays and is opted into here
    os.environ["RRT_SUB_W"] = "128"
    try:
        sd = compile_scene(S.Scene(cam, world, [], (0, 0, 0)), tri_pad=512)
    finally:
        del os.environ["RRT_SUB_W"]
    assert sd.tri_sub_min.shape[0] == sd.tri_v0.shape[0] // 128
    assert sd.tri_cluster_min.shape[0] == sd.tri_v0.shape[0] // 512

    C = 600
    o = jnp.asarray(rng.uniform(-2, 2, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.zeros(C, jnp.float32)
    t_max = jnp.where(jnp.arange(C) % 5 == 0, -1.0, jnp.inf)  # dead lanes

    h_xla = intersect(sd, o, d, tt, t_max=t_max)

    import rust_ray_tracer_tpu.ops.pallas_intersect as pkm
    real_on_tpu = pkm.on_tpu
    pkm.on_tpu = lambda: True
    try:
        pkm.INKERNEL_COEFFS = True     # packed + sub path
        h_sub = intersect(sd, o, d, tt, t_max=t_max)
        pkm.INKERNEL_COEFFS = False    # streamed tables, no sub
        h_flat = intersect(sd, o, d, tt, t_max=t_max)
    finally:
        pkm.on_tpu = real_on_tpu
        pkm.INKERNEL_COEFFS = None

    m = np.asarray(h_xla.hit)
    assert m.any() and (~m).any()
    for ref in (h_xla, h_flat):
        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(h_sub.hit))
        np.testing.assert_allclose(np.asarray(ref.t)[m],
                                   np.asarray(h_sub.t)[m], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ref.mat)[m],
                                      np.asarray(h_sub.mat)[m])


@pytest.mark.parametrize("packed", [False, True])
def test_pair_list_matches_dense_grid(packed):
    """The 1D dynamic pair-list search grid (the default for k > 1)
    must be BITWISE identical to the dense (tiles x clusters) grid —
    same (t, kind, idx) winners, including dead lanes, pad rays,
    all-dead tiles and cross-kind (sphere/quad) precedence."""
    rng = np.random.default_rng(17)
    world = []
    mats = [S.Lambertian.from_rgb(0.5, 0.5, 0.5),
            S.Metal((0.9, 0.8, 0.7), 0.1)]
    for i in range(400):     # > 3 clusters of 128
        v0 = rng.uniform(-4, 4, 3).astype(np.float32)
        v0[2] -= 6.0
        e = rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32)
        world.append(S.Triangle(v0, v0 + e[0], v0 + e[1], mats[i % 2],
                                double_sided=bool(i % 3)))
    world.append(S.Sphere((0, 0, -5), 0.7, mats[0]))
    world.append(S.XZRect(-3, 3, -8, -3, -2.0, mats[1]))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    sd = compile_scene(S.Scene(cam, world, [], (0, 0, 0)))
    assert sd.tri_cluster_min.shape[0] > 1

    C = 600
    o = jnp.asarray(rng.uniform(-2, 2, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    # a block of consecutive rays pointing AWAY from everything: their
    # tile should survive as a single valid=0 pair (all-dead-tile path)
    d = d.at[300:560, 2].set(jnp.abs(d[300:560, 2]) + 1.0)
    tt = jnp.asarray(rng.random(C), jnp.float32)
    t_min = jnp.full((C,), 1e-4, jnp.float32)
    t_max = jnp.where(jnp.arange(C) % 7 == 0, -1.0, jnp.inf)  # dead lanes

    pk.INKERNEL_COEFFS = packed
    try:
        os.environ["RRT_PAIR"] = "1"   # force: k=4 is under PAIR_MIN_K
        try:
            pair = pk.fused_search(sd, o, d, tt, t_min, t_max)
        finally:
            os.environ["RRT_PAIR"] = "0"
        try:
            dense = pk.fused_search(sd, o, d, tt, t_min, t_max)
        finally:
            del os.environ["RRT_PAIR"]
    finally:
        pk.INKERNEL_COEFFS = None

    for a, b, name in zip(pair, dense, ("t", "kind", "idx")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    kinds = np.asarray(dense[1])
    assert (kinds == 1).any() and (kinds == 2).any() and (kinds == 3).any()


@pytest.mark.parametrize("cap", ["512", "2"])
def test_fine_pair_grid_matches_dense(cap):
    """Fine sub-box pair blocks (the big-packed-mesh default) must match
    the dense cluster sweep bitwise — both under the in-budget fine
    grid and under the RRT_PAIR_CAP overflow lax.cond fallback."""
    rng = np.random.default_rng(23)
    world = []
    mat = S.Lambertian.from_rgb(0.5, 0.5, 0.5)
    for i in range(900):
        v0 = rng.uniform(-4, 4, 3).astype(np.float32)
        v0[2] -= 6.0
        e = rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32)
        world.append(S.Triangle(v0, v0 + e[0], v0 + e[1], mat,
                                double_sided=bool(i % 3)))
    world.append(S.Sphere((0, 0, -5), 0.7, mat))
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    # tri_pad 512 > CLUSTER -> 128-wide sub boxes are built by default
    sd = compile_scene(S.Scene(cam, world, [], (0, 0, 0)), tri_pad=512)
    assert sd.tri_sub_min.shape[0] == sd.tri_v0.shape[0] // 128
    assert sd.tri_cluster_min.shape[0] > 1

    C = 600
    o = jnp.asarray(rng.uniform(-2, 2, (C, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    tt = jnp.zeros(C, jnp.float32)
    t_min = jnp.full((C,), 1e-4, jnp.float32)
    t_max = jnp.where(jnp.arange(C) % 7 == 0, -1.0, jnp.inf)

    pk.INKERNEL_COEFFS = True      # packed: the fine-grid eligibility
    os.environ["RRT_PAIR_CAP"] = cap
    os.environ["RRT_PAIR_FINE"] = "1"   # fine blocks are ablation-only
    try:
        fine = pk.fused_search(sd, o, d, tt, t_min, t_max)
        os.environ["RRT_PAIR"] = "0"
        try:
            dense = pk.fused_search(sd, o, d, tt, t_min, t_max)
        finally:
            del os.environ["RRT_PAIR"]
    finally:
        del os.environ["RRT_PAIR_CAP"]
        del os.environ["RRT_PAIR_FINE"]
        pk.INKERNEL_COEFFS = None

    for a, b, name in zip(fine, dense, ("t", "kind", "idx")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    assert (np.asarray(dense[1]) == 1).any()
