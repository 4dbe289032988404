"""Pallas TPU kernel: fused, cluster-culled triangle intersection search.

The XLA path (ops/intersect._tri_candidates) computes the ``[C,10] @
[10,4T]`` Plücker contraction, then elementwise u/v/t + validity, then a
masked argmin — each stage materializing ``[C,T]`` intermediates in HBM.
At C=32k rays x T=4k triangles that is gigabytes of HBM traffic per
bounce: the renderer measures HBM-bandwidth-bound at ~2 Mrays/s.

This kernel performs matmul -> epilogue -> running argmin entirely in
VMEM, one ``[BC, CLUSTER]`` tile at a time, writing only ``[C]`` outputs.
The grid sweeps ray tiles (outer) x triangle clusters (inner); the output
block index depends only on the ray tile, so Mosaic keeps the running
best in VMEM across the whole cluster sweep.

**Culling.** Triangles are Morton-ordered at scene compile time
(models/scene.py), so each CLUSTER-sized index range is spatially compact
and carries an AABB. A cheap XLA pre-pass slab-tests every (ray, cluster)
pair, OR-reduces over each BC-ray tile, and hands the kernel a
``[Ci, K]`` mask; ``@pl.when`` skips the matmuls for masked-out pairs.
Rays whose ``t_max <= t_min`` (dead wavefront lanes — the integrator
collapses the window of terminated rays) cull every cluster, so a tile
whose 256 rays are all dead or all miss the geometry costs four tiny
matmul skips per cluster and nothing else. This is BVH-flavored work
avoidance in a shape the TPU likes: dense tiles, tile-granular
decisions, no pointer chasing, no divergence within a tile.

Precision: HIGHEST (6-pass bf16 ~= exact f32; Mosaic's dot lowering
supports only DEFAULT and HIGHEST). The search picks the closest-hit
*winner*; raw bf16 t-error (~0.4% relative) could select a surface
behind a nearby one (e.g. the Cornell lamp at y=554 vs the ceiling at
555 — 0.2% apart), so single-pass bf16 is ruled out.

Used only inside the detached phase-1 search (``stop_gradient``), so no
custom VJP is needed — gradients flow through the phase-2 recompute
(ops/intersect.py docstring).

Semantics match ``_tri_candidates`` / the reference exactly
(triangle.rs:38-69): det eps 1e-5, backface cull unless double-sided,
u in [0,1], v in [0, 1-u), t in [t_min, t_max], first-hit tie-break on
equal t (lowest triangle index wins). The cluster cull is conservative
(epsilon-margined slab test), so culling never changes the winner.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.models.scene import CLUSTER

TRI_DET_EPS = 1e-5      # triangle.rs:42
# rays per tile: 256 = two 128-lane rows (tuned default). RRT_BC=128
# makes the pair list ROW-granular for big packed meshes — each pair
# sweeps tris only for the 128 rays that actually enter the cluster
# box (finer culling, 2x the pre-pass/pair-build size); sweepable knob.
BC = int(os.environ.get("RRT_BC", "256"))
BT = CLUSTER            # min triangles per tile (cluster width is
                        # derived per scene: see tri_search)

INTERPRET = False       # tests set True to run the kernel on CPU
UNIFIED = True          # ablation toggle: one-kernel phase-1 search
INKERNEL_COEFFS = None  # build Plücker coefficient matrices inside the
                        # kernel from packed [10, T] vertex rows
                        # (40B/tri streamed) instead of streaming four
                        # [10, T] coefficient tables (160B/tri).
                        # None = auto (on for >= PACKED_MIN_TRIS, where
                        # the sweep is HBM-streaming-bound); True/False
                        # force it for ablation. Measured at suzanne
                        # (VMEM-resident): packed fwd 52.9 vs 48.3
                        # ms/wave — the in-kernel assembly only pays
                        # when the mesh cannot live in VMEM.
PACKED_MIN_TRIS = 65536


def _kernel(mask_ref, feats_ref, det_ref, u_ref, v_ref, t_ref, dbl_ref,
            tmin_ref, tmax_ref, best_t_ref, best_i_ref):
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _init():
        best_t_ref[:] = jnp.full_like(best_t_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    # mask rows travel in 8-row SMEM blocks (Mosaic wants the leading
    # block dim divisible by 8); this tile's row is program_id(0) % 8
    @pl.when(mask_ref[pl.program_id(0) % 8, tj] > 0)
    def _compute():
        f = feats_ref[:]                                # [BC, 10]
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        det = dot(f, det_ref[:])                        # [BC, BT]
        u_num = dot(f, u_ref[:])
        v_num = dot(f, v_ref[:])
        t_num = dot(f, t_ref[:])

        # scale-invariant degeneracy cutoff: coefficients carry 1/|n|
        # (intersect._tri_coeffs) so |det| <= |d| and EPS·|d| is a pure
        # grazing-angle test — absolute EPS broke millimetre meshes
        dn = jnp.sqrt(jnp.sum(f[:, 3:6] * f[:, 3:6], axis=1,
                              keepdims=True))           # [BC, 1]
        eps = TRI_DET_EPS * dn
        safe = jnp.where(jnp.abs(det) > eps, det, 1.0)
        inv = 1.0 / safe
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv

        dbl = dbl_ref[:]                                # [1, BT] float
        tmin = tmin_ref[:]                              # [BC, 1]
        tmax = tmax_ref[:]
        side_ok = (det > eps) | ((det < -eps) & (dbl > 0.5))
        valid = (side_ok & (u >= 0.0) & (u <= 1.0)
                 & (v >= 0.0) & (v < 1.0 - u)
                 & (t >= tmin) & (t <= tmax))
        tt = jnp.where(valid, t, jnp.inf)               # [BC, BT]

        loc_t = jnp.min(tt, axis=1, keepdims=True)      # [BC, 1]
        loc_i = (jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                 + tj * det_ref.shape[1])

        better = loc_t < best_t_ref[:]
        best_i_ref[:] = jnp.where(better, loc_i, best_i_ref[:])
        best_t_ref[:] = jnp.where(better, loc_t, best_t_ref[:])


def _pad_axis(x, mult, axis, value):
    n = x.shape[axis]
    target = -(-n // mult) * mult
    if target == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return jnp.pad(x, widths, constant_values=value)


def _tile_cluster_mask(o, d, cl_min, cl_max, t_min, t_max):
    """[Ci, K] int32: does ANY ray of tile i possibly hit cluster k?

    Conservative slab test on unnormalized rays; axes with |d| ~ 0 fall
    back to an origin-inside-slab check. Rays with a collapsed t-window
    (t_max <= t_min — dead lanes) hit nothing. Inverted boxes
    (min > max — the all-pad "empty cluster" encoding) are rejected
    explicitly: the per-axis min/max swap below would otherwise turn an
    (+inf, -inf) slab into (-inf, +inf) and pass every ray.
    """
    eps = 1e-3
    nonempty = jnp.all(cl_min <= cl_max, axis=-1)[None]   # [1, K]
    o_ = o[:, None, :]                       # [C,1,3]
    d_ = d[:, None, :]
    small = jnp.abs(d_) < 1e-12
    inv = 1.0 / jnp.where(small, 1.0, d_)
    lo = (cl_min[None] - eps - o_) * inv     # [C,K,3]
    hi = (cl_max[None] + eps - o_) * inv
    tlo = jnp.minimum(lo, hi)
    thi = jnp.maximum(lo, hi)
    # ignore degenerate axes in the interval intersection
    tlo = jnp.where(small, -jnp.inf, tlo)
    thi = jnp.where(small, jnp.inf, thi)
    enter = jnp.max(tlo, axis=-1)
    exit_ = jnp.min(thi, axis=-1)
    par_ok = jnp.all(
        ~small | ((o_ >= cl_min[None] - eps) & (o_ <= cl_max[None] + eps)),
        axis=-1)
    window = (t_max > t_min)[:, None]
    hit = (nonempty & par_ok & (enter <= exit_) & (exit_ >= t_min[:, None])
           & (enter <= t_max[:, None]) & window)
    ci = o.shape[0] // BC
    return jnp.any(hit.reshape(ci, BC, -1), axis=1).astype(jnp.int32)


def _mask_kernel(o_ref, d_ref, tw_ref, clmin_ref, clmax_ref, mask_ref):
    """One ray tile vs ALL cluster AABBs -> one [1, K] mask row.

    Same slab test as _tile_cluster_mask, but tile-resident in VMEM: the
    XLA version materializes [C, K, 3] broadcast intermediates in HBM —
    measured 39.6ms per search at C=9216, K=508 (1M-tri MetalRough-
    Spheres) vs <1ms here. Inverted (empty) cluster boxes are rejected
    by the nonempty row; dead lanes (t_max <= t_min) contribute nothing.
    """
    eps = 1e-3
    o = o_ref[:]                                  # [3, BC]
    d = d_ref[:]
    tw = tw_ref[:]                                # [2, BC] (t_min, t_max)
    any_hit = None
    nonempty = None
    enter = None
    exit_ = None
    par_ok = None
    for ax in range(3):
        cmin = clmin_ref[ax:ax + 1, :]            # [1, K]
        cmax = clmax_ref[ax:ax + 1, :]
        ne = cmin <= cmax
        nonempty = ne if nonempty is None else (nonempty & ne)
        oa = o[ax:ax + 1, :].T                    # [BC, 1]
        da = d[ax:ax + 1, :].T
        small = jnp.abs(da) < 1e-12
        inv = 1.0 / jnp.where(small, 1.0, da)
        lo = (cmin - eps - oa) * inv              # [BC, K]
        hi = (cmax + eps - oa) * inv
        tlo = jnp.minimum(lo, hi)
        thi = jnp.maximum(lo, hi)
        tlo = jnp.where(small, -jnp.inf, tlo)
        thi = jnp.where(small, jnp.inf, thi)
        enter = tlo if enter is None else jnp.maximum(enter, tlo)
        exit_ = thi if exit_ is None else jnp.minimum(exit_, thi)
        pok = (~small) | ((oa >= cmin - eps) & (oa <= cmax + eps))
        par_ok = pok if par_ok is None else (par_ok & pok)
    tmin = tw[0:1, :].T                           # [BC, 1]
    tmax = tw[1:2, :].T
    window = tmax > tmin
    hit = (nonempty & par_ok & (enter <= exit_)
           & (exit_ >= tmin) & (enter <= tmax) & window)
    # min ENTRY DISTANCE over the tile's rays (+inf = tile misses the
    # cluster): a conservative lower bound on any hit t inside the
    # cluster for every ray of the tile — the sweep sorts clusters by
    # it (front to back) and prunes once all rays' best_t beat it.
    # Entry clamped up to t_min stays a valid bound (hits are >= t_min).
    ent = jnp.where(hit, jnp.maximum(enter, tmin), jnp.inf)
    # rows travel in 8-row blocks (Mosaic's minimum sublane tile). The
    # RAY grid dim must vary FASTEST (grid=(kchunks, ci), ray id =
    # program_id(1)): the output block (i//8, j) is then visited in 8
    # CONSECUTIVE steps, each filling its own row — a j-fastest order
    # would revisit a flushed block, which the pipeline does not allow.
    r = pl.program_id(1) % 8
    mask_ref[pl.ds(r, 1), :] = jnp.min(ent, axis=0, keepdims=True)


def tile_cluster_enter_pallas(o, d, cl_min, cl_max, t_min, t_max):
    """[Ci, K] f32 per-(tile, cluster) min entry distance via the Pallas
    kernel (+inf where the tile misses the cluster entirely).

    Caller guarantees o/d/t are BC-padded (pad rays carry a collapsed
    window). K is padded to the 128-lane boundary with empty boxes.
    Large box counts (sub-cluster level at big meshes) are swept in
    lane chunks by a second grid dimension so the [BC, chunk]
    intermediates stay a fixed VMEM size.
    """
    c = o.shape[0]
    k = cl_min.shape[0]
    KC = 2048                                           # lanes per step
    kp = -(-k // 128) * 128
    kc = min(kp, KC)
    kp = -(-kp // kc) * kc
    clmin_p = jnp.pad(cl_min.T, ((0, 0), (0, kp - k)),
                      constant_values=jnp.inf)          # [3, Kp]
    clmax_p = jnp.pad(cl_max.T, ((0, 0), (0, kp - k)),
                      constant_values=-jnp.inf)
    tw = jnp.stack([t_min, t_max], axis=0)              # [2, C]
    ci = c // BC
    ci_p = -(-ci // 8) * 8
    ray_spec = pl.BlockSpec((3, BC), lambda j, i: (0, i),
                            memory_space=pltpu.VMEM)
    ent = pl.pallas_call(
        _mask_kernel,
        grid=(kp // kc, ci),
        in_specs=[
            ray_spec,
            ray_spec,
            pl.BlockSpec((2, BC), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, kc), lambda j, i: (i // 8, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ci_p, kp), jnp.float32),
        interpret=INTERPRET,
    )(o.T, d.T, tw, clmin_p, clmax_p)
    return ent[:ci, :k]


def tri_search(feats, det_c, u_c, v_c, t_c, double, t_min, t_max,
               o, d, cl_min, cl_max):
    """Best (t, triangle index) per ray over all triangles.

    Args:
      feats: [C, 10] Plücker ray features.
      det_c, u_c, v_c, t_c: [10, T] per-component coefficient matrices.
      double: [T] float (1.0 = double-sided).
      t_min, t_max: [C].
      o, d: [C,3] rays (for the culling pre-pass).
      cl_min, cl_max: [T/CLUSTER, 3] cluster AABBs (inverted = empty).

    Returns (best_t [C] — inf on miss, best_idx [C] int32).

    The cluster width is DERIVED from the shapes — ``det_c.shape[1] //
    cl_min.shape[0]`` — so compile_scene's adaptive clustering (CLUSTER
    at suzanne scale, wider for big meshes to cap K) needs no plumbing.
    """
    c, t_n = feats.shape[0], det_c.shape[1]
    k = cl_min.shape[0]
    bt = t_n // k
    assert bt * k == t_n and bt % CLUSTER == 0, (t_n, k)
    feats_p = _pad_axis(feats, BC, 0, 0.0)
    # pad triangles (compile_scene): zero coeffs -> det == 0 -> invalid
    det_p, u_p, v_p, t_p = det_c, u_c, v_c, t_c
    dbl_p = double.astype(jnp.float32)[None, :]
    tmin_p = _pad_axis(t_min[:, None], BC, 0, 0.0)
    tmax_p = _pad_axis(t_max[:, None], BC, 0, -1.0)  # pad rays: no window
    o_p = _pad_axis(o, BC, 0, 0.0)
    d_p = _pad_axis(d, BC, 0, 0.0)

    cp = feats_p.shape[0]
    grid = (cp // BC, k)

    mask = _pad_axis(_tile_cluster_mask(
        o_p, d_p, cl_min, cl_max,
        tmin_p[:, 0],
        jnp.where(tmax_p[:, 0] < 0, -jnp.inf, tmax_p[:, 0])), 8, 0, 0)

    coeff_spec = pl.BlockSpec((10, bt), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((BC, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    best_t, best_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # 8 [*, K] mask rows per SMEM block (8*K*4 bytes — the whole
            # [Ci, K] array would outgrow SMEM at big-mesh K; Mosaic
            # requires the leading block dim to be a multiple of 8)
            pl.BlockSpec((8, k), lambda i, j: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, 10), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            coeff_spec, coeff_spec, coeff_spec, coeff_spec,
            pl.BlockSpec((1, bt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec,
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * cp * 10 * 4 * t_n, transcendentals=0,
            bytes_accessed=cp * (10 + 2 + 2) * 4 + 4 * 10 * t_n * 4),
        interpret=INTERPRET,
    )(mask, feats_p, det_p, u_p, v_p, t_p, dbl_p, tmin_p, tmax_p)

    return best_t[:c, 0], jnp.minimum(best_i[:c, 0], t_n - 1)


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


# ---------------------------------------------------------------------------
# Unified phase-1 search: triangles + small sphere/quad tables + the
# cross-kind argmin in ONE kernel.
#
# The per-kind design (tri_search + sph/quad XLA paths + consider()
# where-chains in ops/intersect.py) leaves a string of [C]-sized XLA
# fusion islands between kernels every bounce. Here the sub-CLUSTER
# sphere/quad tables ride along as single [*, 128] VMEM blocks evaluated
# at the last cluster step, and the winner (t, kind, index) leaves the
# kernel already selected — phase 1 becomes one kernel + the XLA feats
# build + one slab-mask pre-pass.
#
# Plücker features stay XLA-side (like tri_search): two earlier variants
# assembled them in-kernel from (o, d) — per cluster step, then once per
# ray tile into VMEM scratch — and both measured SLOWER (fwd 78ms vs
# 58ms per suzanne wave; tools/ablate_phase1.py). [BC,1] column slices
# of a packed ray block are cross-lane relayouts Mosaic pays for on
# every grid step, and the scratch write serializes the cluster
# pipeline. o/d for the last-step sphere/quad fold are read from the
# feats block's columns instead (6 relayouts once per tile).
#
# Cross-kind tie-break preserved: the reference considers list members
# in order with a strictly-shrinking t_max (geometry/mod.rs:67-82), and
# ops/intersect.consider() ordered tri < sphere < quad; folding spheres
# then quads AFTER the final tri cluster with strict < reproduces that
# precedence exactly.
# ---------------------------------------------------------------------------

_K_TRI, _K_SPH, _K_QUAD = 1, 2, 3     # == intersect.KIND_* (stable ABI)


def _coeffs_from_pack(pk):
    """Plücker coefficient matrices [10, bt] from a packed vertex block
    (rows 0-2 v0, 3-5 e1, 6-8 e2, row 9 double-sided flag).

    Same formulas and operation order as intersect._tri_coeffs (which
    documents the 1/|n| scaling); computed in-kernel so only 40B/tri
    stream from HBM instead of four 40B coefficient tables. Zero-pad
    triangles give n = 0 -> inv_n guard 1 -> all-zero coefficients ->
    det == 0 -> invalid, exactly like the XLA-side tables.
    """
    def row(i):
        return pk[i:i + 1, :]                           # [1, bt]

    v0x, v0y, v0z = row(0), row(1), row(2)
    e1x, e1y, e1z = row(3), row(4), row(5)
    e2x, e2y, e2z = row(6), row(7), row(8)
    dbl = row(9)

    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    nl = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv_n = 1.0 / jnp.where(nl > 0, nl, 1.0)
    nhx, nhy, nhz = nx * inv_n, ny * inv_n, nz * inv_n

    # cross(e2, v0) and cross(v0, e1), scaled by inv_n
    c1x = (e2y * v0z - e2z * v0y) * inv_n
    c1y = (e2z * v0x - e2x * v0z) * inv_n
    c1z = (e2x * v0y - e2y * v0x) * inv_n
    c2x = (v0y * e1z - v0z * e1y) * inv_n
    c2y = (v0z * e1x - v0x * e1z) * inv_n
    c2z = (v0x * e1y - v0y * e1x) * inv_n

    z = jnp.zeros_like(v0x)
    det_m = jnp.concatenate([z, z, z, -nhx, -nhy, -nhz, z, z, z, z], 0)
    u_m = jnp.concatenate([z, z, z, -c1x, -c1y, -c1z,
                           e2x * inv_n, e2y * inv_n, e2z * inv_n, z], 0)
    v_m = jnp.concatenate([z, z, z, -c2x, -c2y, -c2z,
                           -e1x * inv_n, -e1y * inv_n, -e1z * inv_n, z], 0)
    t_m = jnp.concatenate(
        [nhx, nhy, nhz, z, z, z, z, z, z,
         -(v0x * nhx + v0y * nhy + v0z * nhz)], 0)
    return det_m, u_m, v_m, t_m, dbl


def _tri_eval_fold(f, det_m, u_m, v_m, t_m, dbl, tmin, tmax, cid, width,
                   fold, off=0):
    """Shared tri tile evaluation: Plücker dots -> epilogue -> fold.

    ``cid`` is the (traced) cluster id this block came from; winning
    triangle index = local argmin + cid * width + off (``off`` = the
    static sub-block offset within the cluster).
    """
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    det = dot(f, det_m)                             # [BC, bt]
    u_num = dot(f, u_m)
    v_num = dot(f, v_m)
    t_num = dot(f, t_m)
    # scale-invariant cutoff (see _kernel / _tri_coeffs)
    dn = jnp.sqrt(jnp.sum(f[:, 3:6] * f[:, 3:6], axis=1,
                          keepdims=True))           # [BC, 1]
    eps = TRI_DET_EPS * dn
    safe = jnp.where(jnp.abs(det) > eps, det, 1.0)
    inv = 1.0 / safe
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    side_ok = (det > eps) | ((det < -eps) & (dbl > 0.5))
    valid = (side_ok & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (v < 1.0 - u)
             & (t >= tmin) & (t <= tmax))
    tt = jnp.where(valid, t, jnp.inf)
    loc_t = jnp.min(tt, axis=1, keepdims=True)
    loc_i = (jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
             + cid * width + off)
    fold(loc_t, loc_i, _K_TRI)


def _make_fused_kernel(has_tri: bool, has_sph: bool, has_quad: bool,
                       k_last: int, packed: bool = False, sub: int = 0):
    """``packed=False``: tri data arrives as four [10, bt] coefficient
    blocks + a [1, bt] double-sided row. ``packed=True``: one [10, bt]
    vertex block (v0/e1/e2/dbl rows) and the coefficients are built
    in-kernel (_coeffs_from_pack) — 4x less HBM traffic per cluster.
    ``sub > 0``: the cluster splits into ``sub`` sub-spans and a
    per-(tile, cluster) survivor bitmask (scalar-prefetched ``sub_ref``)
    gates one guarded sub-matmul each — the second hierarchy level:
    compute scales with the sub-boxes a tile's rays actually touch,
    not the full cluster width."""
    def impl(ids_ref, cnt_ref, sub_ref, feats_ref, tri_refs, time_ref,
             tmin_ref, tmax_ref, sph_ref, quad_ref,
             bt_ref, bk_ref, bi_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)

        @pl.when(tj == 0)
        def _init():
            bt_ref[:] = jnp.full_like(bt_ref, jnp.inf)
            bk_ref[:] = jnp.zeros_like(bk_ref)
            bi_ref[:] = jnp.zeros_like(bi_ref)

        def fold(loc_t, loc_i, kind):
            better = loc_t < bt_ref[:]
            bi_ref[:] = jnp.where(better, loc_i, bi_ref[:])
            bk_ref[:] = jnp.where(better, jnp.int32(kind), bk_ref[:])
            bt_ref[:] = jnp.where(better, loc_t, bt_ref[:])

        def fold_tri(loc_t, loc_i, kind):
            # lexicographic (t, index): the cluster sweep is front-to-
            # back, NOT ascending-id, so equal-t ties across clusters
            # must resolve to the globally lowest triangle index to stay
            # bitwise identical to the dense ascending sweep / XLA path
            bt = bt_ref[:]
            better = (loc_t < bt) | ((loc_t == bt) & (loc_i < bi_ref[:]))
            bi_ref[:] = jnp.where(better, loc_i, bi_ref[:])
            bk_ref[:] = jnp.where(better, jnp.int32(kind), bk_ref[:])
            bt_ref[:] = jnp.where(better, loc_t, bt_ref[:])

        if has_tri:
            # compacted front-to-back sweep: step j of tile i processes
            # cluster ids[ti, j] (survivors sorted by tile entry
            # distance). Steps past the survivor count repeat the last
            # id (index map pins the block -> the DMA is elided) and
            # skip compute.
            # NOTE a max(best_t)-vs-entry pruning test was measured
            # here and REVERTED: any ray of the tile that ends up
            # missing everything keeps best_t = inf, so the tile-level
            # bound almost never fires on scenes with background gaps
            # while its per-step reduce+branch cost 14% of the 1M-tri
            # wave (1253 vs 1103 ms). The front-to-back survivor order
            # stays (harmless; tie-safety comes from the lexicographic
            # fold), ready for a finer-grained bound.
            @pl.when(tj < cnt_ref[ti])
            def _tri():
                width = tri_refs[0].shape[1]
                if sub:
                    m = sub_ref[ti, tj]
                    w = width // sub
                    for s in range(sub):
                        @pl.when((m & (1 << s)) != 0)
                        def _one_sub(s=s):
                            det_m, u_m, v_m, t_m, dbl = _coeffs_from_pack(
                                tri_refs[0][:, s * w:(s + 1) * w])
                            _tri_eval_fold(
                                feats_ref[:], det_m, u_m, v_m, t_m, dbl,
                                tmin_ref[:], tmax_ref[:],
                                ids_ref[ti, tj], width, fold_tri,
                                off=s * w)
                else:
                    if packed:
                        det_m, u_m, v_m, t_m, dbl = _coeffs_from_pack(
                            tri_refs[0][:])
                    else:
                        det_m, u_m, v_m, t_m = (r[:] for r in tri_refs[:4])
                        dbl = tri_refs[4][:]
                    _tri_eval_fold(feats_ref[:], det_m, u_m, v_m, t_m,
                                   dbl, tmin_ref[:], tmax_ref[:],
                                   ids_ref[ti, tj], width, fold_tri)

        @pl.when(tj == k_last)
        def _small_tables():
            _fold_small_tables(feats_ref, time_ref, tmin_ref, tmax_ref,
                               sph_ref, quad_ref, fold, has_sph, has_quad)

    if packed:
        def kernel(ids_ref, cnt_ref, sub_ref, feats_ref, pack_ref,
                   time_ref, tmin_ref, tmax_ref, sph_ref, quad_ref,
                   bt_ref, bk_ref, bi_ref):
            impl(ids_ref, cnt_ref, sub_ref, feats_ref, (pack_ref,),
                 time_ref, tmin_ref, tmax_ref, sph_ref, quad_ref,
                 bt_ref, bk_ref, bi_ref)
    else:
        def kernel(ids_ref, cnt_ref, sub_ref, feats_ref, det_ref, u_ref,
                   v_ref, t_ref, dbl_ref, time_ref, tmin_ref, tmax_ref,
                   sph_ref, quad_ref, bt_ref, bk_ref, bi_ref):
            impl(ids_ref, cnt_ref, sub_ref, feats_ref,
                 (det_ref, u_ref, v_ref, t_ref, dbl_ref), time_ref,
                 tmin_ref, tmax_ref, sph_ref, quad_ref,
                 bt_ref, bk_ref, bi_ref)
    return kernel


def _fold_small_tables(feats_ref, time_ref, tmin_ref, tmax_ref,
                       sph_ref, quad_ref, fold, has_sph, has_quad):
    """Fold the (small, VMEM-resident) sphere and quad tables into the
    running best — shared by the dense (tiles x clusters) and pair-list
    kernels; runs exactly once per ray tile, AFTER all its triangle
    folds (cross-kind precedence: strict <, tri < sphere < quad)."""
    f = feats_ref[:]                                    # [BC, 10]

    def rcol(i):
        return f[:, i:i + 1]                            # [BC, 1]

    ox, oy, oz = rcol(0), rcol(1), rcol(2)
    dx, dy, dz = rcol(3), rcol(4), rcol(5)
    time, tmin, tmax = time_ref[:], tmin_ref[:], tmax_ref[:]
    if has_sph:
        sph = sph_ref[:]                                # [9, SP]

        def srow(i):
            return sph[i:i + 1, :]                      # [1, SP]

        c0x, c0y, c0z = srow(0), srow(1), srow(2)
        e1x, e1y, e1z = srow(3), srow(4), srow(5)
        st0, inv_dt, r = srow(6), srow(7), srow(8)
        frac = (time - st0) * inv_dt            # [BC, SP]
        cx = c0x + frac * e1x
        cy = c0y + frac * e1y
        cz = c0z + frac * e1z
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz
        b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - a * cc
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12)) * (disc > 0)
        inv_a = 1.0 / jnp.maximum(a, 1e-12)
        root1 = (-b - sq) * inv_a
        root2 = (-b + sq) * inv_a
        ok1 = ok & (root1 >= tmin) & (root1 <= tmax)
        ok2 = ok & (root2 >= tmin) & (root2 <= tmax)
        t = jnp.where(ok1, root1,
                      jnp.where(ok2, root2, jnp.inf))
        loc_t = jnp.min(t, axis=1, keepdims=True)
        loc_i = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
        fold(loc_t, loc_i, _K_SPH)
    if has_quad:
        qd = quad_ref[:]                        # [9, QP]

        def qrow(i):
            return qd[i:i + 1, :]

        qx, qy, qz = qrow(0), qrow(1), qrow(2)
        ux, uy, uz = qrow(3), qrow(4), qrow(5)
        vx, vy, vz = qrow(6), qrow(7), qrow(8)
        wnx = uy * vz - uz * vy
        wny = uz * vx - ux * vz
        wnz = ux * vy - uy * vx
        denom = dx * wnx + dy * wny + dz * wnz  # [BC, QP]
        dsafe = jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom < 0, -1e-12, 1e-12),
                          denom)
        t = ((qx - ox) * wnx + (qy - oy) * wny
             + (qz - oz) * wnz) / dsafe
        wx = ox + t * dx - qx
        wy = oy + t * dy - qy
        wz = oz + t * dz - qz
        n2 = wnx * wnx + wny * wny + wnz * wnz
        inv_n2 = 1.0 / jnp.maximum(n2, 1e-12)
        alpha = ((wy * vz - wz * vy) * wnx
                 + (wz * vx - wx * vz) * wny
                 + (wx * vy - wy * vx) * wnz) * inv_n2
        beta = ((uy * wz - uz * wy) * wnx
                + (uz * wx - ux * wz) * wny
                + (ux * wy - uy * wx) * wnz) * inv_n2
        valid = ((jnp.abs(denom) > 0.0)
                 & (t >= tmin) & (t <= tmax)
                 & (alpha >= 0.0) & (alpha <= 1.0)
                 & (beta >= 0.0) & (beta <= 1.0))
        tt = jnp.where(valid, t, jnp.inf)
        loc_t = jnp.min(tt, axis=1, keepdims=True)
        loc_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
        fold(loc_t, loc_i, _K_QUAD)


def _make_pair_kernel(has_tri: bool, has_sph: bool, has_quad: bool,
                      packed: bool, B: int):
    """1D pair-list variant of the fused search kernel.

    The dense grid is (ray tiles x ALL clusters): every non-surviving
    (tile, cluster) slot still costs a pipeline step (DMA elided,
    compute skipped), which dominates big-mesh waves — the round-4
    roofline measured 293k grid steps/wave at ~4.3us amortized on the
    1M-tri scene while only ~1/5 carry work, and dead tiles on bounces
    1-3 still pay all K steps. Here the grid is ONE dimension: the
    ``total`` live (tile, cluster) pairs (a traced value — Mosaic
    supports dynamic grid bounds), tile-major. Scalar-prefetched
    ``pt/pb/pv`` give each step its ray tile, cluster block and a
    validity flag (every tile emits >= 1 pair so its outputs are
    initialized and the sphere/quad fold runs; a dead tile costs
    exactly one step). This is the TPU shape of the reference's
    hierarchy-pruned traversal (geometry/mod.rs:137-153): work scales
    with boxes actually entered, not boxes that exist.

    Ordering contract: pairs of one tile are CONSECUTIVE and ascending
    in cluster id (the output block pins in VMEM for the whole run;
    ascending ids + the lexicographic (t, index) fold keep winners
    bitwise identical to the dense sweep), and the sphere/quad fold
    fires on the tile's LAST pair — after all its triangle folds, as
    the cross-kind strict-< precedence requires.
    """
    def impl(pt_ref, pb_ref, pv_ref, feats_ref, tri_refs, time_ref,
             tmin_ref, tmax_ref, sph_ref, quad_ref,
             bt_ref, bk_ref, bi_ref):
        j = pl.program_id(0)
        n = pl.num_programs(0)
        tile = pt_ref[j]

        @pl.when((j == 0) | (pt_ref[jnp.maximum(j - 1, 0)] != tile))
        def _init():
            bt_ref[:] = jnp.full_like(bt_ref, jnp.inf)
            bk_ref[:] = jnp.zeros_like(bk_ref)
            bi_ref[:] = jnp.zeros_like(bi_ref)

        def fold(loc_t, loc_i, kind):
            better = loc_t < bt_ref[:]
            bi_ref[:] = jnp.where(better, loc_i, bi_ref[:])
            bk_ref[:] = jnp.where(better, jnp.int32(kind), bk_ref[:])
            bt_ref[:] = jnp.where(better, loc_t, bt_ref[:])

        def fold_tri(loc_t, loc_i, kind):
            bt = bt_ref[:]
            better = (loc_t < bt) | ((loc_t == bt) & (loc_i < bi_ref[:]))
            bi_ref[:] = jnp.where(better, loc_i, bi_ref[:])
            bk_ref[:] = jnp.where(better, jnp.int32(kind), bk_ref[:])
            bt_ref[:] = jnp.where(better, loc_t, bt_ref[:])

        if has_tri:
            @pl.when(pv_ref[j] > 0)
            def _tri():
                width = tri_refs[0].shape[1]
                if packed:
                    det_m, u_m, v_m, t_m, dbl = _coeffs_from_pack(
                        tri_refs[0][:])
                else:
                    det_m, u_m, v_m, t_m = (r[:] for r in tri_refs[:4])
                    dbl = tri_refs[4][:]
                _tri_eval_fold(feats_ref[:], det_m, u_m, v_m, t_m,
                               dbl, tmin_ref[:], tmax_ref[:],
                               pb_ref[j], width, fold_tri)

        @pl.when((j == n - 1)
                 | (pt_ref[jnp.minimum(j + 1, B - 1)] != tile))
        def _small_tables():
            _fold_small_tables(feats_ref, time_ref, tmin_ref, tmax_ref,
                               sph_ref, quad_ref, fold, has_sph, has_quad)

    if packed:
        def kernel(pt_ref, pb_ref, pv_ref, feats_ref, pack_ref,
                   time_ref, tmin_ref, tmax_ref, sph_ref, quad_ref,
                   bt_ref, bk_ref, bi_ref):
            impl(pt_ref, pb_ref, pv_ref, feats_ref, (pack_ref,),
                 time_ref, tmin_ref, tmax_ref, sph_ref, quad_ref,
                 bt_ref, bk_ref, bi_ref)
    else:
        def kernel(pt_ref, pb_ref, pv_ref, feats_ref, det_ref, u_ref,
                   v_ref, t_ref, dbl_ref, time_ref, tmin_ref, tmax_ref,
                   sph_ref, quad_ref, bt_ref, bk_ref, bi_ref):
            impl(pt_ref, pb_ref, pv_ref, feats_ref,
                 (det_ref, u_ref, v_ref, t_ref, dbl_ref), time_ref,
                 tmin_ref, tmax_ref, sph_ref, quad_ref,
                 bt_ref, bk_ref, bi_ref)
    return kernel


def _pair_arrays(ent, B):
    """Flatten [Ci, K] tile/cluster entry distances into a tile-major
    pair list for the 1D search grid.

    Returns (tile [B] int32, blk [B] int32, valid [B] int32,
    total int32 traced): pairs of tile i occupy positions
    offs[i]..offs[i]+cnt_eff[i)-1 with ascending surviving cluster ids;
    a tile with NO survivors still emits one (valid=0) pair so the
    kernel initializes its outputs and folds the small tables. Entries
    past ``total`` repeat the owner's last pair (valid=0) but never run
    (the grid bound is ``total``).
    """
    ci, k = ent.shape
    fin = ent < jnp.inf                                  # [Ci, K]
    cnt = jnp.sum(fin, axis=1, dtype=jnp.int32)          # [Ci]
    pos = jnp.cumsum(fin, axis=1, dtype=jnp.int32) - 1
    dest = jnp.where(fin, pos, k)                        # k = dump col
    ids = jnp.zeros((ci, k + 1), jnp.int32).at[
        jnp.arange(ci, dtype=jnp.int32)[:, None], dest].set(
        jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                         (ci, k)))[:, :k]
    cnt_eff = jnp.maximum(cnt, 1)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cnt_eff, dtype=jnp.int32)[:-1]])
    total = jnp.sum(cnt_eff, dtype=jnp.int32)
    j = jnp.arange(B, dtype=jnp.int32)
    tile = (jnp.searchsorted(offs, j, side="right") - 1).astype(jnp.int32)
    rank = j - offs[tile]
    blk = ids[tile, jnp.minimum(rank, cnt_eff[tile] - 1)]
    valid = (rank < cnt[tile]).astype(jnp.int32)
    return tile, blk, valid, total


def fused_search(scene, o, d, time, t_min, t_max):
    """One-kernel phase 1: returns (best_t [C], best_kind [C] int32,
    best_idx [C] int32) over triangles + (< CLUSTER) spheres and quads.

    Caller guarantees scene.n_spheres < CLUSTER and n_quads < CLUSTER
    (bigger tables use their own cluster-culled kernels); media are
    folded by the caller in XLA.
    """
    from rust_ray_tracer_tpu.ops.intersect import _ray_features, _tri_coeffs

    c = o.shape[0]
    t_n = scene.tri_v0.shape[0]
    s_n = scene.sph_c0.shape[0]
    q_n = scene.quad_q.shape[0]
    has_tri, has_sph, has_quad = t_n > 0, s_n > 0, q_n > 0

    feats = _pad_axis(_ray_features(o, d), BC, 0, 0.0)
    time_p = _pad_axis(time[:, None], BC, 0, 0.0)
    tmin_p = _pad_axis(t_min[:, None], BC, 0, 0.0)
    tmax_p = _pad_axis(t_max[:, None], BC, 0, -1.0)  # pad rays: no window
    cp = feats.shape[0]

    packed = (t_n >= PACKED_MIN_TRIS if INKERNEL_COEFFS is None
              else INKERNEL_COEFFS)
    sub = 0
    sub_bits = None
    if has_tri:
        k = scene.tri_cluster_min.shape[0]
        t_total = scene.tri_v0.shape[0]
        bt = t_total // k
        assert bt * k == t_total and bt % CLUSTER == 0, (t_total, k)
        if packed:
            # one [10, T] vertex table (v0/e1/e2/dbl rows): coefficients
            # are built in-kernel, 40B/tri streamed instead of 160
            tri_tabs = (jnp.concatenate(
                [scene.tri_v0.T, scene.tri_e1.T, scene.tri_e2.T,
                 scene.tri_double.astype(jnp.float32)[None, :]], axis=0),)
        else:
            det_p, u_p, v_p, t_p = _tri_coeffs(
                scene.tri_v0, scene.tri_e1, scene.tri_e2)
            dbl_p = scene.tri_double.astype(jnp.float32)[None, :]
            tri_tabs = (det_p, u_p, v_p, t_p, dbl_p)
        tmax_mask = jnp.where(tmax_p[:, 0] < 0, -jnp.inf, tmax_p[:, 0])
        n_sub_rows = scene.tri_sub_min.shape[0]
        if os.environ.get("RRT_NO_SUB", "") == "1":   # ablation gate
            n_sub_rows = 0
        # bitmask second level: ablation-only (RRT_SUB_W) — measured
        # regression as the dense default (models/scene.py ledger)
        use_bitmask = (bool(os.environ.get("RRT_SUB_W")) and packed
                       and n_sub_rows and t_total // n_sub_rows < bt)
        fine_w = t_total // n_sub_rows if n_sub_rows else 0
        # fine pair grid: sub-box-sized blocks (RRT_PAIR_FINE=1,
        # ablation-only): MEASURED LOSS on the 1M-tri scene vs coarse
        # cluster-block pairs (fwd 948.0 vs 910.7 ms/wave; dense 922.4
        # — tools/r4_bigmesh_pair.py, v5e 2026-08-19): the 8128-box
        # pre-pass + bounce-cone overflow into the dense lax.cond
        # fallback eat the finer culling. Coarse pairs are the default
        # at k >= PAIR_MIN_K.
        use_fine = (packed and n_sub_rows and fine_w < bt
                    and not use_bitmask
                    and os.environ.get("RRT_PAIR", "") != "0"
                    and os.environ.get("RRT_PAIR_FINE", "") == "1")
        ent_fine = None
        if use_bitmask:
            # two-level hierarchy: test rays against SUB-boxes, fold to
            # cluster entries + per-(tile, cluster) survivor bitmasks
            sub = bt // fine_w
            assert sub <= 31, sub   # bits in an int32 mask
            ent_sub = tile_cluster_enter_pallas(
                feats[:, 0:3], feats[:, 3:6],
                scene.tri_sub_min, scene.tri_sub_max,
                tmin_p[:, 0], tmax_mask)              # [Ci, K*sub]
            ci = ent_sub.shape[0]
            ent_sub = ent_sub.reshape(ci, k, sub)
            ent = jnp.min(ent_sub, axis=2)            # [Ci, K]
            weights = (1 << jnp.arange(sub, dtype=jnp.int32))
            sub_bits = jnp.sum(
                jnp.where(jnp.isfinite(ent_sub), weights[None, None], 0),
                axis=2, dtype=jnp.int32)              # [Ci, K]
        elif use_fine:
            ent_fine = tile_cluster_enter_pallas(
                feats[:, 0:3], feats[:, 3:6],
                scene.tri_sub_min, scene.tri_sub_max,
                tmin_p[:, 0], tmax_mask)              # [Ci, n_sub]
            ent = None   # coarse entries derived lazily (overflow path)
        else:
            ent = tile_cluster_enter_pallas(
                feats[:, 0:3], feats[:, 3:6],
                scene.tri_cluster_min, scene.tri_cluster_max,
                tmin_p[:, 0], tmax_mask)
    else:
        bt = BT
        if packed:
            tri_tabs = (jnp.zeros((10, bt), jnp.float32),)
        else:
            tri_tabs = (jnp.zeros((10, bt), jnp.float32),) * 4 \
                + (jnp.zeros((1, bt), jnp.float32),)
        k = 1
        use_fine = False
        ent_fine = None
        ent = jnp.full((cp // BC, 1), jnp.inf, jnp.float32)

    # grid dispatch: the 1D dynamic pair-list grid (_make_pair_kernel)
    # is the default wherever it can win — FINE sub-box blocks for big
    # packed meshes, coarse cluster blocks when there are enough
    # clusters for the dense grid's dead steps to matter (measured
    # 2026-08-19, v5e: composite k=339 fwd 359.3 -> 315.8 ms/wave;
    # suzanne k=8 REGRESSES 19.3 -> 24.3 — the pair construction costs
    # more than 8 clusters' worth of skipped steps). RRT_PAIR=0 forces
    # the dense grid everywhere, RRT_PAIR=1 forces the pair grid at any
    # cluster count (ablation / tests).
    PAIR_MIN_K = 16
    pair_env = os.environ.get("RRT_PAIR", "")
    use_pair = (has_tri and sub == 0 and pair_env != "0"
                and (pair_env == "1" or use_fine or k >= PAIR_MIN_K))

    # sphere table [9, SP]: far-pad rows give disc = inf - inf = NaN,
    # rejected on every comparison path (see ops/pallas_sphere.py)
    SP = CLUSTER
    sph = jnp.zeros((9, SP), jnp.float32).at[0:3, :].set(1e30)
    if has_sph:
        dt = scene.sph_t1 - scene.sph_t0
        inv_dt = 1.0 / jnp.where(jnp.abs(dt) < 1e-12,
                                 jnp.where(dt < 0, -1e-12, 1e-12), dt)
        real = jnp.stack([
            scene.sph_c0[:, 0], scene.sph_c0[:, 1], scene.sph_c0[:, 2],
            scene.sph_c1[:, 0] - scene.sph_c0[:, 0],
            scene.sph_c1[:, 1] - scene.sph_c0[:, 1],
            scene.sph_c1[:, 2] - scene.sph_c0[:, 2],
            scene.sph_t0, inv_dt, scene.sph_r], axis=0)
        sph = sph.at[:, :s_n].set(real[:, :s_n])

    # quad table [9, QP]: zero-edge pads have |denom| == 0 -> invalid
    QP = CLUSTER
    quad = jnp.zeros((9, QP), jnp.float32)
    if has_quad:
        real = jnp.concatenate(
            [scene.quad_q.T, scene.quad_u.T, scene.quad_v.T], axis=0)
        quad = quad.at[:, :q_n].set(real[:, :q_n])

    out_shape = [
        jax.ShapeDtypeStruct((cp, 1), jnp.float32),
        jax.ShapeDtypeStruct((cp, 1), jnp.int32),
        jax.ShapeDtypeStruct((cp, 1), jnp.int32),
    ]
    cost = pl.CostEstimate(
        flops=2 * cp * 10 * 4 * k * bt + cp * (SP + QP) * 40,
        transcendentals=0,
        bytes_accessed=cp * 16 * 4 + 4 * 10 * k * bt * 4)

    def _finish(res):
        best_t, best_k, best_i = res
        bt_, bk_, bi_ = best_t[:c, 0], best_k[:c, 0], best_i[:c, 0]
        if has_tri:
            bi_ = jnp.where(bk_ == _K_TRI, jnp.minimum(bi_, t_n - 1), bi_)
        return bt_, bk_, bi_

    def _pair_call(ptl, pbl, pvl, n_steps, w, B):
        """Pair-list grid over ``n_steps`` (traced) live pairs of
        ``w``-wide triangle blocks."""
        p_ray = pl.BlockSpec((BC, 1), lambda j, pt, pb, pv: (pt[j], 0),
                             memory_space=pltpu.VMEM)
        p_coeff = pl.BlockSpec((10, w), lambda j, pt, pb, pv: (0, pb[j]),
                               memory_space=pltpu.VMEM)
        p_fix = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda j, pt, pb, pv: (0, 0),
            memory_space=pltpu.VMEM)
        if packed:
            p_tri = [p_coeff]
        else:
            p_tri = [p_coeff] * 4 + [
                pl.BlockSpec((1, w), lambda j, pt, pb, pv: (0, pb[j]),
                             memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            _make_pair_kernel(has_tri, has_sph, has_quad,
                              packed=packed, B=B),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,        # pair tile / block / valid
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((BC, 10), lambda j, pt, pb, pv: (pt[j], 0),
                                 memory_space=pltpu.VMEM),
                    *p_tri,
                    p_ray, p_ray, p_ray,
                    p_fix((9, SP)),
                    p_fix((9, QP)),
                ],
                out_specs=[p_ray, p_ray, p_ray],
            ),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=INTERPRET,
        )(ptl, pbl, pvl, feats, *tri_tabs,
          time_p, tmin_p, tmax_p, sph, quad)

    def _dense_call(ent):
        # compact the tile-entry distances into per-tile survivor id
        # lists SORTED FRONT TO BACK: step j of tile i sweeps cluster
        # ids[i, j]; past cnt[i] the index map repeats the last
        # survivor, so the pipeline skips both the DMA and the compute.
        # (A tile-level closest-hit prune on these entry bounds was
        # measured and REVERTED — see the NOTE inside the kernel; the
        # front-to-back order stays, and equal-t winners remain bitwise
        # identical to the dense ascending sweep because the tri fold
        # is lexicographic in (t, index).)
        cnt = jnp.sum(ent < jnp.inf, axis=1, dtype=jnp.int32)  # [Ci]
        ids = jnp.argsort(ent, axis=1, stable=True).astype(jnp.int32)
        # survivor bitmasks travel in the ids order (sub_ref[ti, tj]
        # gates the sub-blocks of cluster ids[ti, tj])
        if sub_bits is not None:
            subm = jnp.take_along_axis(sub_bits, ids, axis=1)
        else:
            subm = jnp.zeros((ids.shape[0], 1), jnp.int32)

        def cluster_ix(i, j, ids_r, cnt_r, sub_r):
            # survivor j of tile i; past the count, pin to the last
            # survivor (same block index -> the pipeline elides the copy)
            return (0, ids_r[i, jnp.minimum(j,
                                            jnp.maximum(cnt_r[i] - 1, 0))])

        coeff_spec = pl.BlockSpec((10, bt), cluster_ix,
                                  memory_space=pltpu.VMEM)
        ray_spec = pl.BlockSpec((BC, 1), lambda i, j, *pref: (i, 0),
                                memory_space=pltpu.VMEM)
        fix_spec = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, j, *pref: (0, 0),
            memory_space=pltpu.VMEM)
        if packed:
            tri_specs = [coeff_spec]
        else:
            tri_specs = [coeff_spec] * 4 + [
                pl.BlockSpec((1, bt), cluster_ix,
                             memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            _make_fused_kernel(has_tri, has_sph, has_quad, k - 1,
                               packed=packed, sub=sub),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,        # ids, cnt, sub bitmasks
                grid=(cp // BC, k),
                in_specs=[
                    pl.BlockSpec((BC, 10), lambda i, j, *pref: (i, 0),
                                 memory_space=pltpu.VMEM),
                    *tri_specs,
                    ray_spec, ray_spec, ray_spec,
                    fix_spec((9, SP)),
                    fix_spec((9, QP)),
                ],
                out_specs=[ray_spec, ray_spec, ray_spec],
            ),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=INTERPRET,
        )(ids, cnt, subm, feats, *tri_tabs,
          time_p, tmin_p, tmax_p, sph, quad)

    if use_pair:
        ci = cp // BC
        if use_fine:
            # fine sub-box blocks: work scales with the ~w-tri boxes a
            # tile's rays enter instead of the full cluster survivor
            # union. Budget: B pairs; a chunk-bounce whose tiles enter
            # more than B boxes total (incoherent frusta) falls back to
            # the dense cluster sweep via lax.cond — correct for any
            # input, fine-grid fast for the common coherent case.
            nb = scene.tri_sub_min.shape[0]
            cap = int(os.environ.get("RRT_PAIR_CAP", "512"))
            B = ci * min(nb, cap)
            ptl, pbl, pvl, total = _pair_arrays(ent_fine, B)
            if nb <= cap:
                return _finish(_pair_call(ptl, pbl, pvl, total,
                                          fine_w, B))
            g = bt // fine_w

            def fine_fn(_):
                return _pair_call(ptl, pbl, pvl, jnp.minimum(total, B),
                                  fine_w, B)

            def dense_fn(_):
                ent_c = jnp.min(
                    ent_fine.reshape(ent_fine.shape[0], k, g), axis=2)
                return _dense_call(ent_c)

            return _finish(lax.cond(total > B, dense_fn, fine_fn, 0))
        ptl, pbl, pvl, total = _pair_arrays(ent, ci * k)
        return _finish(_pair_call(ptl, pbl, pvl, total, bt, ci * k))

    return _finish(_dense_call(ent))
