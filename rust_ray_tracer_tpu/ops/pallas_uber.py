"""Uber-bounce: plane-resident wavefront state + a one-kernel phase 1.

Round-4's measured roofline (BASELINE.md) showed the chip idle on every
scene: of a ~540us live chunk-bounce on suzanne, the two Pallas kernels
cost 152us and ~300-400us was per-bounce XLA machinery — winner-row
gathers of tiny primitive/material tables, their backward scatter-adds,
the [C,3]<->plane transposes of the carry, and the mask-kernel dispatch.
This module removes that machinery for VMEM-resident scenes (suzanne,
the Cornell scenes, glTF imports, ``random``):

* The wavefront carry lives as PLANES ``[14, CR, 128]`` across the whole
  bounce scan (packed once per chunk, unpacked once) — no per-bounce
  [C,3] transposes.
* Phase 1 (candidate search over triangles/spheres/quads + the winner's
  unified parameter/attribute row) runs as ONE Pallas kernel
  (:func:`_select_call`): per 8x128-ray tile it builds Pluecker features
  in registers, sweeps the (VMEM-resident) primitive tables with
  transposed ``[T,10] @ [10,128]`` MXU contractions, folds the
  cross-kind winner with the reference's tie rules, and fetches the
  winner's table row with a one-hot MXU contraction — replacing the
  mask kernel + search kernel + 1-2 XLA row gathers (and their backward
  scatter-adds) per bounce.
* The existing fused bounce megakernel (ops/pallas_bounce) consumes the
  result unchanged; a live-tile scalar-prefetch list lets both kernels
  skip tiles whose 1024 lanes are all dead (the reference recursion's
  pay-only-for-live-paths property, ray.rs:85-126, at tile granularity
  — suzanne kills ~93% of its primaries at bounce 0, main.rs:86-112).

Semantics: identical threefry streams and identical fold/tie rules as
the split pipeline (ops/intersect.intersect_select + pallas_intersect.
fused_search): triangles sweep ascending ids with a lexicographic
(t, index) fold, spheres then quads fold after with strict ``<``
(cross-kind precedence tri < sphere < quad; geometry/mod.rs:67-82), and
the epilogue formulas mirror the measured-parity kernels line for line.
Gradients: the selection is detached; the winner's row values are
differentiable w.r.t. the unified table (the custom VJP scatter-adds
row cotangents back), and everything downstream differentiates through
the megakernel's fused backward.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.ops import pallas_intersect as _pi
from rust_ray_tracer_tpu.ops.pallas_shade import LANES
from rust_ray_tracer_tpu.utils import rng as rngu

TRI_DET_EPS = 1e-5      # triangle.rs:42 (scale-invariant form, see intersect)
T_MIN = 1e-4            # ray.rs:89
BR = 8                  # ray rows per tile (8 * 128 = 1024 rays)
N_ST = 8                # select-kernel state planes: o(3) d(3) time alive
# state-plane layout of the scan carry (pack_state/unpack):
#   0:3 o   3:6 d   6 time   7 alive   8:11 L   11:14 beta
N_STATE = 14
ROWS_MAX = 4096         # eligibility: total winner-table rows
TC = 1024               # triangle rows per in-kernel sweep chunk
# tri rows per CULLED sweep chunk (fused/trace kernels) — also the cull
# AABB grain and the search-table padding grain; env-sweepable
TCC = int(os.environ.get("RRT_TCC", "512"))
SC = 512                # sphere rows per chunk
QC = 512                # quad rows per chunk
PC = 1024               # winner-table rows per one-hot chunk
_BIGF = 3.0e38


def _cparams(has_noise):
    """Mosaic params for the uber kernels: the in-kernel perlin path's
    unrolled 7x8 one-hot lookups need ~20MB of scoped VMEM transiently
    (measured OOM at the default 16MB limit on random, 2026-08-20), so
    noise scenes raise the budget; non-noise scenes keep the default."""
    if not has_noise:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _dot_tn(a, b):
    """[R, K] x [K, 128] -> [R, 128] (HIGHEST: 6-pass bf16 ~= f32)."""
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def _dot_onehot(table, mask):
    """[P, W] one-hot-contracted with [P, 128] -> [W, 128]."""
    return lax.dot_general(table, mask, (((0,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def _min_with_index(tt, off, base=0):
    """Per-lane (min t, lowest row index attaining it) over axis 0.

    ``tt`` [R, 128]; returns ([1,128], [1,128] f32 index + off + base).
    ``off`` is a static int; ``base`` may be a TRACED row offset (the
    fori_loop culled sweep). Index arithmetic rides f32 (exact below
    2^24; ROWS_MAX bounds it) because Mosaic's cross-sublane reductions
    are safest in f32. Matches ``jnp.argmin`` (first minimum) for every
    finite min; when the min is inf the index is garbage and the
    caller's fold ignores it.
    """
    loc_t = jnp.min(tt, axis=0, keepdims=True)
    # int32 iota cast to f32 (Mosaic's tpu.iota is integer-only)
    ii = (lax.broadcasted_iota(jnp.int32, tt.shape, 0)
          .astype(jnp.float32) + float(off))
    if not (isinstance(base, int) and base == 0):
        ii = ii + jnp.asarray(base, jnp.float32)
    loc_i = jnp.min(jnp.where(tt == loc_t, ii, _BIGF), axis=0,
                    keepdims=True)
    return loc_t, loc_i


def _search_row(P, r, cfg, uni_ref, det_ref, u_ref, v_ref, t_ref,
                dbl_ref, sph_ref, quad_ref, dflt_tile, cab=None):
    """Phase 1 for ray row ``r`` (128 lanes) of a tile.

    Returns (sel [W,128] winner-row values, kind [1,128] f32,
    idx [1,128] f32 global winner-table row).

    ``cab`` (optional, the fused path): per-triangle-chunk AABB rows
    [n_chunks, 8] = (lo3, hi3, pad2) over the Morton-ordered triangle
    table at :data:`TCC` grain — each chunk's 4 MXU contractions run
    under ``lax.cond`` on a slab any-hit of the row's 128 rays, so a
    row whose rays miss a chunk's box pays ~20 VPU ops instead of the
    sweep (the device realization of the reference's per-ray BVH
    pruning, geometry/mod.rs:137-153, at row x chunk granularity).
    """
    (has_tri, has_sph, has_quad, t_off, s_off, q_off) = cfg[:6]
    from rust_ray_tracer_tpu.ops.intersect import (KIND_QUAD, KIND_SPH,
                                                   KIND_TRI)

    def row(c):
        return P[c, r:r + 1, :]                       # [1, 128]

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    time, alive = row(6), row(7)
    tmin = jnp.full_like(ox, T_MIN)
    # dead lanes: collapsed window rejects every candidate (the
    # integrator wavefront invariant, ops/integrator._bounce)
    tmax = jnp.where(alive > 0.5, jnp.inf, -1.0)

    best_t = jnp.full((1, LANES), jnp.inf)
    best_k = jnp.zeros((1, LANES), jnp.float32)
    best_i = jnp.zeros((1, LANES), jnp.float32)

    if has_tri:
        # Pluecker features [o, d, o x d, 1] (intersect._ray_features)
        mx = oy * dz - oz * dy
        my = oz * dx - ox * dz
        mz = ox * dy - oy * dx
        f = jnp.concatenate(
            [ox, oy, oz, dx, dy, dz, mx, my, mz, jnp.ones_like(ox)],
            axis=0)                                   # [10, 128]
        dn = jnp.sqrt(dx * dx + dy * dy + dz * dz)    # [1, 128]
        eps = TRI_DET_EPS * dn
        tp = det_ref.shape[0]

        def sweep(best, c0, tc):
            """Fold tri rows [c0, c0+tc) — c0 may be traced (dslice)."""
            bt, bk, bi = best
            sl = (pl.dslice(c0, tc), slice(None))
            dm = _dot_tn(det_ref[sl], f)              # [tc, 128]
            um = _dot_tn(u_ref[sl], f)
            vm = _dot_tn(v_ref[sl], f)
            tm = _dot_tn(t_ref[sl], f)
            dbl = dbl_ref[sl]                         # [tc, 1]
            safe = jnp.where(jnp.abs(dm) > eps, dm, 1.0)
            inv = 1.0 / safe
            u = um * inv
            v = vm * inv
            t = tm * inv
            side_ok = (dm > eps) | ((dm < -eps) & (dbl > 0.5))
            valid = (side_ok & (u >= 0.0) & (u <= 1.0)
                     & (v >= 0.0) & (v < 1.0 - u)
                     & (t >= tmin) & (t <= tmax))
            tt = jnp.where(valid, t, jnp.inf)
            loc_t, loc_i = _min_with_index(tt, t_off, base=c0)
            # lexicographic (t, index): ascending-id sweep == the
            # dense kernel's front-to-back + lexicographic fold
            # (both resolve equal t to the lowest global tri id)
            better = (loc_t < bt) | ((loc_t == bt) & (loc_i < bi))
            return (jnp.where(better, loc_t, bt),
                    jnp.where(better, float(KIND_TRI), bk),
                    jnp.where(better, loc_i, bi))

        if cab is None:
            for c0 in range(0, tp, TC):
                best_t, best_k, best_i = sweep(
                    (best_t, best_k, best_i), c0, min(TC, tp - c0))
        else:
            # per-(row, chunk) AABB cull: slab-test ingredients shared
            # across chunks (safe inverse: |d|<1e-30 -> huge same-sign
            # t's -> correct in/out call for axis-parallel rays, the
            # occupancy-probe convention, ops/integrator.auto_compact)
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-30, 1e-30, dx)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-30, 1e-30, dy)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)
            amask = alive > 0.5

            def chunk_body(ci, best):
                t0x = (cab[ci, 0] - ox) * inv_dx
                t1x = (cab[ci, 3] - ox) * inv_dx
                t0y = (cab[ci, 1] - oy) * inv_dy
                t1y = (cab[ci, 4] - oy) * inv_dy
                t0z = (cab[ci, 2] - oz) * inv_dz
                t1z = (cab[ci, 5] - oz) * inv_dz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tmin))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                hit = (tf >= tn) & amask              # [1, 128]
                anyhit = jnp.max(
                    jnp.where(hit, 1.0, 0.0)) > 0.0
                return lax.cond(anyhit,
                                lambda b: sweep(b, ci * TCC, TCC),
                                lambda b: b, best)

            best_t, best_k, best_i = lax.fori_loop(
                0, tp // TCC, chunk_body, (best_t, best_k, best_i))

    def fold_strict(best, loc_t, loc_i, kindv):
        bt, bk, bi = best
        better = loc_t < bt
        return (jnp.where(better, loc_t, bt),
                jnp.where(better, kindv, bk),
                jnp.where(better, loc_i, bi))

    if has_sph:
        sp = sph_ref.shape[0]
        for s0 in range(0, sp, SC):
            sc = min(SC, sp - s0)
            sb = sph_ref[s0:s0 + sc, :]               # [sc, 9]

            def col(ci, sb=sb):
                return sb[:, ci:ci + 1]               # [sc, 1]

            c0x, c0y, c0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            st0, inv_dt, rr = col(6), col(7), col(8)
            # mirrors pallas_intersect._fold_small_tables (sphere)
            frac = (time - st0) * inv_dt              # [sc, 128]
            cx = c0x + frac * e1x
            cy = c0y + frac * e1y
            cz = c0z + frac * e1z
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            a = dx * dx + dy * dy + dz * dz
            b = ocx * dx + ocy * dy + ocz * dz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
            disc = b * b - a * cc
            ok = disc > 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 1e-12)) * (disc > 0)
            inv_a = 1.0 / jnp.maximum(a, 1e-12)
            root1 = (-b - sq) * inv_a
            root2 = (-b + sq) * inv_a
            ok1 = ok & (root1 >= tmin) & (root1 <= tmax)
            ok2 = ok & (root2 >= tmin) & (root2 <= tmax)
            t = jnp.where(ok1, root1, jnp.where(ok2, root2, jnp.inf))
            loc_t, loc_i = _min_with_index(t, s_off + s0)
            best_t, best_k, best_i = fold_strict(
                (best_t, best_k, best_i), loc_t, loc_i, float(KIND_SPH))

    if has_quad:
        qp = quad_ref.shape[0]
        for q0 in range(0, qp, QC):
            qc = min(QC, qp - q0)
            qb = quad_ref[q0:q0 + qc, :]              # [qc, 9]

            def col(ci, qb=qb):
                return qb[:, ci:ci + 1]

            qx, qy, qz = col(0), col(1), col(2)
            ux, uy, uz = col(3), col(4), col(5)
            vx, vy, vz = col(6), col(7), col(8)
            # mirrors pallas_intersect._fold_small_tables (quad)
            wnx = uy * vz - uz * vy
            wny = uz * vx - ux * vz
            wnz = ux * vy - uy * vx
            denom = dx * wnx + dy * wny + dz * wnz    # [qc, 128]
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
            loc_t, loc_i = _min_with_index(tt, q_off + q0)
            best_t, best_k, best_i = fold_strict(
                (best_t, best_k, best_i), loc_t, loc_i, float(KIND_QUAD))

    found = best_k > 0.5                              # [1, 128]
    best_i = jnp.where(found, best_i, 0.0)

    # one-hot winner-row fetch: [P, W]^T-contract [P, 128] on the MXU.
    # The mask has exactly one 1.0 per found lane; 6-pass bf16 HIGHEST
    # reconstructs a f32 exactly for a 1.0-weighted single row. The
    # fetch is ~30% of the kernel's MXU FLOPs, so all-miss rows (sky
    # rows at bounce 0) skip it entirely under lax.cond.
    w = uni_ref.shape[1]
    pu = uni_ref.shape[0]

    def fetch(_):
        sel = jnp.zeros((w, LANES), jnp.float32)
        for p0 in range(0, pu, PC):
            pc = min(PC, pu - p0)
            iif = (lax.broadcasted_iota(jnp.int32, (pc, LANES), 0)
                   .astype(jnp.float32) + float(p0))
            m = (iif == best_i).astype(jnp.float32)   # [pc, 128]
            sel = sel + _dot_onehot(uni_ref[p0:p0 + pc, :], m)
        # miss lanes take the default row (material 0's attrs) so the
        # branchless downstream eval never sees 0-ior/0-albedo poison —
        # same convention as intersect_select's miss default
        return jnp.where(jnp.broadcast_to(found, (w, LANES)), sel,
                         dflt_tile)

    any_found = jnp.max(jnp.where(found, 1.0, 0.0)) > 0.0
    sel = lax.cond(any_found, fetch, lambda _: dflt_tile, 0)
    return sel, best_k, best_i


def _make_select_kernel(cfg, w):
    def kernel(tlive_ref, st_ref, uni_ref, dflt_ref, det_ref, u_ref,
               v_ref, t_ref, dbl_ref, sph_ref, quad_ref,
               selv_ref, kind_ref, idx_ref):
        i = pl.program_id(0)

        def dflt_tile():
            return jnp.concatenate(
                [jnp.full((1, LANES), dflt_ref[0, c]) for c in range(w)],
                axis=0)                               # [w, 128]

        @pl.when(tlive_ref[i] == 0)
        def _dead():
            kind_ref[:] = jnp.zeros_like(kind_ref)
            idx_ref[:] = jnp.zeros_like(idx_ref)
            selv_ref[:] = jnp.broadcast_to(dflt_tile()[:, None, :],
                                           (w, BR, LANES))

        @pl.when(tlive_ref[i] > 0)
        def _live():
            P = st_ref[:]
            dt = dflt_tile()
            sel_rows, kind_rows, idx_rows = [], [], []
            for r in range(BR):
                sel, bk, bi = _search_row(
                    P, r, cfg, uni_ref, det_ref, u_ref, v_ref, t_ref,
                    dbl_ref, sph_ref, quad_ref, dt)
                sel_rows.append(sel[:, None, :])
                kind_rows.append(bk)
                idx_rows.append(bi)
            selv_ref[:] = jnp.concatenate(sel_rows, axis=1)
            kind_ref[:] = jnp.concatenate(kind_rows,
                                          axis=0).astype(jnp.int32)
            idx_ref[:] = jnp.concatenate(idx_rows,
                                         axis=0).astype(jnp.int32)

    return kernel


def _select_impl(cfg, tlive, st, uni, dflt, det_t, u_t, v_t, t_t,
                 dbl_t, sph, quad):
    w = uni.shape[1]
    cr = st.shape[1]
    nt = cr // BR
    fix = lambda shape, space=pltpu.VMEM: pl.BlockSpec(  # noqa: E731
        shape, lambda i, tl: tuple(0 for _ in shape), memory_space=space)
    return pl.pallas_call(
        _make_select_kernel(cfg, w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((N_ST, BR, LANES), lambda i, tl: (0, i, 0),
                             memory_space=pltpu.VMEM),
                fix(uni.shape),
                fix(dflt.shape, pltpu.SMEM),
                fix(det_t.shape), fix(u_t.shape), fix(v_t.shape),
                fix(t_t.shape), fix(dbl_t.shape),
                fix(sph.shape), fix(quad.shape),
            ],
            out_specs=[
                pl.BlockSpec((w, BR, LANES), lambda i, tl: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((w, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cr, LANES), jnp.int32),
        ],
        interpret=_pi.INTERPRET,
    )(tlive, st, uni, dflt, det_t, u_t, v_t, t_t, dbl_t, sph, quad)


def _name_select(out):
    """checkpoint-name the select outputs so the remat policy
    (save_only_these_names in ops/integrator) keeps them. Applied
    INSIDE the custom_vjp fwd so the vjp residuals are the NAMED
    tensors — naming after the call leaves the residual vars unnamed
    and the backward recompute re-runs the whole kernel (measured:
    8.1 ms/wave of duplicated select on suzanne, r5 step trace)."""
    selv, kind, idx = out
    return (checkpoint_name(selv, "hit_attrs"),
            checkpoint_name(kind, "isect_sel"),
            checkpoint_name(idx, "isect_sel"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _select_call(cfg, tlive, st, uni, dflt, det_t, u_t, v_t, t_t,
                 dbl_t, sph, quad):
    """One-kernel phase 1. Differentiable ONLY w.r.t. ``uni`` (the
    winner-table rows); the selection itself and the search tables are
    detached by design (ops/intersect.py module docstring)."""
    return _name_select(_select_impl(cfg, tlive, st, uni, dflt, det_t,
                                     u_t, v_t, t_t, dbl_t, sph, quad))


def _select_fwd(cfg, tlive, st, uni, dflt, det_t, u_t, v_t, t_t,
                dbl_t, sph, quad):
    out = _name_select(_select_impl(cfg, tlive, st, uni, dflt, det_t,
                                    u_t, v_t, t_t, dbl_t, sph, quad))
    selv, kind, idx = out
    return out, (kind, idx)


def _select_bwd(cfg, res, g):
    import numpy as np
    kind, idx = res
    (_, _, _, _, _, _, st_sh, uni_sh, dflt_sh, det_sh, dbl_sh, sph_sh,
     quad_sh, tlive_sh) = cfg
    d_selv = g[0]                                     # [w, cr, 128]
    w = d_selv.shape[0]
    c = d_selv.shape[1] * d_selv.shape[2]
    drows = d_selv.reshape(w, c).T                    # [c, w]
    kf = kind.reshape(c)
    ix = idx.reshape(c)
    ok = kf > 0
    d_uni = jnp.zeros(uni_sh, jnp.float32).at[
        jnp.where(ok, ix, 0)].add(jnp.where(ok[:, None], drows, 0.0))
    z = lambda sh: jnp.zeros(sh, jnp.float32)  # noqa: E731
    return (np.zeros(tlive_sh, jax.dtypes.float0), z(st_sh), d_uni,
            z(dflt_sh), z(det_sh), z(det_sh), z(det_sh), z(det_sh),
            z(dbl_sh), z(sph_sh), z(quad_sh))


_select_call.defvjp(_select_fwd, _select_bwd)


# ---------------------------------------------------------------------------
# fully fused bounce: search + phase 2 + shade + update in ONE kernel
# ---------------------------------------------------------------------------
#
# The round-5 trace of the two-kernel uber path showed the bounce now
# dominated by (a) the uncullled search sweep (223us/call — every live
# tile sweeps EVERY triangle), (b) the d_uni scatter-add in the backward
# (~2.9 ms/wave of XLA scatter), (c) ~6 ms/wave of device idle between
# the many small per-bounce ops. This path attacks all three:
#   * ONE kernel per bounce: the select epilogue feeds the megakernel
#     core in registers — no selv HBM round-trip, no 52-plane XLA
#     concat, two dispatch points fewer per bounce.
#   * per-ROW alive skip (93% of suzanne's lanes are dead from bounce 1)
#     and per-(row, tri-chunk) AABB culls under lax.cond — the
#     reference recursion's pay-only-for-live-paths property
#     (ray.rs:85-126) at 128-lane granularity, plus its BVH pruning
#     (geometry/mod.rs:137-153) at row x Morton-chunk granularity.
#   * the backward accumulates d_uni IN-KERNEL with one-hot MXU
#     contractions into a revisited [P, W] block — the XLA scatter-add
#     is gone.
# Streams, fold rules and the estimator update are bit-identical to the
# two-kernel path (same _search_row, same _bounce_plane_core).

def _tile_core(st_t, rnd_t, selv, pkind, lt, n_lights, has_checker,
               has_noise=False, ptab=None):
    """Megakernel core on one tile, fed from select values in registers.

    st_t [N_STATE, BR, L] carry planes; rnd_t [15, BR, L]; selv
    [W, BR, L] winner rows (miss lanes already defaulted); pkind
    [BR, L] int32; ptab [8, 256] perlin tables (has_noise scenes).
    Returns the next carry tile [N_STATE, BR, L]. Mirrors bounce_uber's
    plane assembly exactly (pallas_bounce layout).
    """
    from rust_ray_tracer_tpu.ops.intersect import (MATTR_ALBEDO,
                                                   MATTR_EVEN,
                                                   MATTR_FUZZ,
                                                   MATTR_IOR,
                                                   MATTR_ISCHK,
                                                   MATTR_MKIND,
                                                   MATTR_ODD,
                                                   mattr_noise_cols)
    from rust_ray_tracer_tpu.ops.pallas_bounce import _bounce_plane_core

    A = 11  # uni column where the material-attr block starts
    tminp = jnp.full_like(st_t[0:1], T_MIN)
    tmaxp = jnp.where(st_t[7:8] > 0.5, jnp.inf, -1.0)
    parts = [st_t[0:7],                    # o, d, time
             tminp, tmaxp,
             selv[0:9],                    # winner pack
             jnp.zeros_like(st_t[0:1]),    # t_med (no media here)
             selv[A + MATTR_ALBEDO.start:A + MATTR_ALBEDO.stop],
             selv[A + MATTR_FUZZ:A + MATTR_FUZZ + 1],
             selv[A + MATTR_IOR:A + MATTR_IOR + 1],
             st_t[8:14],                   # L, beta
             rnd_t,                        # ub(9), gb(6)
             st_t[7:8]]                    # alive
    flags = (selv[9] > 0.5).astype(jnp.int32)
    if has_checker:
        parts += [selv[A + MATTR_EVEN.start:A + MATTR_EVEN.stop],
                  selv[A + MATTR_ODD.start:A + MATTR_ODD.stop]]
        flags = flags | ((selv[A + MATTR_ISCHK] > 0.5).astype(jnp.int32)
                         << 1)
    if has_noise:
        sc_col, nz_col = mattr_noise_cols(has_checker)
        parts += [selv[A + sc_col:A + sc_col + 1]]
        flags = flags | ((selv[A + nz_col] > 0.5).astype(jnp.int32) << 2)
    P = jnp.concatenate(parts, axis=0)
    mkind = selv[A + MATTR_MKIND].astype(jnp.int32)
    out = _bounce_plane_core(P, pkind, mkind, flags, lt, n_lights,
                             has_checker, has_noise, ptab)
    return jnp.concatenate([out[0:6], st_t[6:7], out[12:13], out[6:9],
                            out[9:12]], axis=0)


def _rebuild_row(uni_ref, bi, found, dflt_tile):
    """One-hot winner-row fetch for the backward rebuild — identical
    arithmetic to _search_row's epilogue, so selv is reconstructed
    bit-exactly from the saved (kind, idx) residuals."""
    w = uni_ref.shape[1]
    pu_ = uni_ref.shape[0]
    bi = jnp.where(found, bi, 0.0)
    sel = jnp.zeros((w, LANES), jnp.float32)
    for p0 in range(0, pu_, PC):
        pc = min(PC, pu_ - p0)
        iif = (lax.broadcasted_iota(jnp.int32, (pc, LANES), 0)
               .astype(jnp.float32) + float(p0))
        m = (iif == bi).astype(jnp.float32)
        sel = sel + _dot_onehot(uni_ref[p0:p0 + pc, :], m)
    return jnp.where(jnp.broadcast_to(found, (w, LANES)), sel, dflt_tile)


def _make_fused_kernel(cfg, w, n_lights, has_checker, has_noise):
    def kernel(tlive_ref, st_ref, rnd_ref, uni_ref, dflt_ref, det_ref,
               u_ref, v_ref, t_ref, dbl_ref, sph_ref, quad_ref, cab_ref,
               lt_ref, ptab_ref, out_ref, kind_ref, idx_ref, selv_ref):
        i = pl.program_id(0)

        @pl.when(tlive_ref[i] == 0)
        def _dead():
            out_ref[:] = st_ref[:]
            kind_ref[:] = jnp.zeros_like(kind_ref)
            idx_ref[:] = jnp.zeros_like(idx_ref)

        @pl.when(tlive_ref[i] > 0)
        def _live():
            P = st_ref[:]
            dt = jnp.concatenate(
                [jnp.full((1, LANES), dflt_ref[0, c]) for c in range(w)],
                axis=0)                               # [w, 128]
            # defaults first, then live rows overwrite (one cond/row)
            selv_ref[:] = jnp.broadcast_to(dt[:, None, :],
                                           (w, BR, LANES))
            kind_ref[:] = jnp.zeros((BR, LANES), jnp.int32)
            idx_ref[:] = jnp.zeros((BR, LANES), jnp.int32)
            for r in range(BR):
                row_alive = jnp.max(P[7:8, r, :]) > 0.5

                @pl.when(row_alive)
                def _row(r=r):
                    sel, bk, bi = _search_row(
                        P, r, cfg, uni_ref, det_ref, u_ref, v_ref,
                        t_ref, dbl_ref, sph_ref, quad_ref, dt,
                        cab=cab_ref)
                    selv_ref[:, r:r + 1, :] = sel[:, None, :]
                    kind_ref[r:r + 1, :] = bk.astype(jnp.int32)
                    idx_ref[r:r + 1, :] = bi.astype(jnp.int32)

            out_ref[:] = _tile_core(P, rnd_ref[:], selv_ref[:],
                                    kind_ref[:],
                                    _read_lt_local(lt_ref, n_lights + 1),
                                    n_lights, has_checker, has_noise,
                                    ptab_ref[:])

    return kernel


def _read_lt_local(lt_ref, rows):
    from rust_ray_tracer_tpu.ops.pallas_shade import LT_COLS
    return tuple(tuple(lt_ref[r, j] for j in range(LT_COLS))
                 for r in range(rows))


def _make_fused_bwd_kernel(w, n_lights, has_checker, has_noise):
    from rust_ray_tracer_tpu.ops.pallas_shade import LT_COLS

    def kernel(tlive_ref, st_ref, rnd_ref, uni_ref, dflt_ref, lt_ref,
               ptab_ref, kind_ref, idx_ref, g_ref, dst_ref, duni_ref,
               dlt_ref, selv_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            duni_ref[:] = jnp.zeros_like(duni_ref)

        @pl.when(tlive_ref[i] == 0)
        def _dead():
            # the dead-tile forward is the identity on the carry
            dst_ref[:] = g_ref[:]
            dlt_ref[0] = jnp.zeros((8, LANES), jnp.float32)

        @pl.when(tlive_ref[i] > 0)
        def _live():
            kindp = kind_ref[:]                   # [BR, 128] i32
            idxf = idx_ref[:].astype(jnp.float32)
            dt = jnp.concatenate(
                [jnp.full((1, LANES), dflt_ref[0, c]) for c in range(w)],
                axis=0)
            selv_ref[:] = jnp.broadcast_to(dt[:, None, :],
                                           (w, BR, LANES))
            for r in range(BR):
                found_r = kindp[r:r + 1, :] > 0
                any_found = jnp.max(jnp.where(found_r, 1, 0)) > 0

                @pl.when(any_found)
                def _row(r=r, found_r=found_r):
                    sel = _rebuild_row(uni_ref, idxf[r:r + 1, :],
                                       found_r, dt)
                    selv_ref[:, r:r + 1, :] = sel[:, None, :]

            selv = selv_ref[:]
            rnd_t = rnd_ref[:]
            lt = _read_lt_local(lt_ref, n_lights + 1)
            ptab = ptab_ref[:] if has_noise else None

            def core(st_, selv_, lt_):
                return _tile_core(st_, rnd_t, selv_, kindp, lt_,
                                  n_lights, has_checker, has_noise, ptab)

            _, vjp = jax.vjp(core, st_ref[:], selv, lt)
            dst, dsel, dlt = vjp(g_ref[:])
            dst_ref[:] = dst

            # d_uni accumulation: per row, scatter the winner-row
            # cotangents back with the SAME one-hot masks as the fetch
            # ([pc,128] contract [w,128] over lanes -> [pc, w]) into the
            # revisited [P, W] accumulator — replaces the measured
            # 2.9 ms/wave XLA scatter-add (r5 step trace). Grid is
            # sequential, so the accumulation order is deterministic.
            pu_ = duni_ref.shape[0]
            for r in range(BR):
                found_r = kindp[r:r + 1, :] > 0
                any_found = jnp.max(jnp.where(found_r, 1, 0)) > 0

                @pl.when(any_found)
                def _acc(r=r, found_r=found_r):
                    bi = jnp.where(found_r, idxf[r:r + 1, :], -1.0)
                    drows = jnp.where(
                        jnp.broadcast_to(found_r, (w, LANES)),
                        dsel[:, r, :], 0.0)           # [w, 128]
                    for p0 in range(0, pu_, PC):
                        pc = min(PC, pu_ - p0)
                        iif = (lax.broadcasted_iota(
                            jnp.int32, (pc, LANES), 0)
                            .astype(jnp.float32) + float(p0))
                        m = (iif == bi).astype(jnp.float32)
                        contrib = lax.dot_general(
                            m, drows, (((1,), (1,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                        duni_ref[p0:p0 + pc, :] = (
                            duni_ref[p0:p0 + pc, :] + contrib)

            rows = n_lights + 1
            acc = jnp.zeros((8, LANES), jnp.float32)
            rr = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            cc = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            for r in range(rows):
                for j in range(LT_COLS):
                    s = dlt[r][j]
                    acc = acc + jnp.where(
                        (rr == 0) & (cc == r * LT_COLS + j), s, 0.0)
            dlt_ref[0] = acc

    return kernel


def _fused_impl(cfg, tlive, st, rnd, uni, dflt, det_t, u_t, v_t, t_t,
                dbl_t, sph, quad, cab, lt, ptab):
    (n_lights, has_checker, has_noise) = cfg[6:9]
    w = uni.shape[1]
    cr = st.shape[1]
    nt = cr // BR
    fix = lambda shape, space=pltpu.VMEM: pl.BlockSpec(  # noqa: E731
        shape, lambda i, tl: tuple(0 for _ in shape), memory_space=space)
    tile = lambda n: pl.BlockSpec((n, BR, LANES),  # noqa: E731
                                  lambda i, tl: (0, i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fused_kernel(cfg, w, n_lights, has_checker, has_noise),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                tile(N_STATE), tile(15),
                fix(uni.shape),
                fix(dflt.shape, pltpu.SMEM),
                fix(det_t.shape), fix(u_t.shape), fix(v_t.shape),
                fix(t_t.shape), fix(dbl_t.shape),
                fix(sph.shape), fix(quad.shape),
                fix(cab.shape, pltpu.SMEM),
                fix(lt.shape, pltpu.SMEM),
                fix(ptab.shape),
            ],
            out_specs=[
                tile(N_STATE),
                pl.BlockSpec((BR, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((w, BR, LANES), jnp.float32)]),
        out_shape=[
            jax.ShapeDtypeStruct((N_STATE, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cr, LANES), jnp.int32),
        ],
        compiler_params=_cparams(has_noise),
        interpret=_pi.INTERPRET,
    )(tlive, st, rnd, uni, dflt, det_t, u_t, v_t, t_t, dbl_t, sph, quad,
      cab, lt, ptab)


def _name_fused(out):
    st2, kind, idx = out
    return (st2, checkpoint_name(kind, "isect_sel"),
            checkpoint_name(idx, "isect_sel"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_call(cfg, tlive, st, rnd, uni, dflt, det_t, u_t, v_t, t_t,
                dbl_t, sph, quad, cab, lt, ptab):
    """One-kernel uber bounce. Differentiable w.r.t. ``st`` (through the
    phase-2 recompute + estimator core), ``uni`` (winner rows) and
    ``lt`` (light table + background); the selection, the search
    tables and the perlin tables are detached by design
    (ops/intersect.py; pallas_bounce noise section)."""
    st2, _, _ = _name_fused(_fused_impl(cfg, tlive, st, rnd, uni, dflt,
                                        det_t, u_t, v_t, t_t, dbl_t,
                                        sph, quad, cab, lt, ptab))
    return st2


def _fused_fwd(cfg, tlive, st, rnd, uni, dflt, det_t, u_t, v_t, t_t,
               dbl_t, sph, quad, cab, lt, ptab):
    st2, kind, idx = _name_fused(
        _fused_impl(cfg, tlive, st, rnd, uni, dflt, det_t, u_t, v_t,
                    t_t, dbl_t, sph, quad, cab, lt, ptab))
    return st2, (tlive, st, rnd, uni, dflt, lt, ptab, kind, idx)


def _fused_bwd(cfg, res, g):
    import numpy as np
    tlive, st, rnd, uni, dflt, lt, ptab, kind, idx = res
    (n_lights, has_checker, has_noise) = cfg[6:9]
    (det_sh, dbl_sh, sph_sh, quad_sh, cab_sh) = cfg[9:14]
    from rust_ray_tracer_tpu.ops.pallas_shade import LT_COLS

    w = uni.shape[1]
    cr = st.shape[1]
    nt = cr // BR
    fix = lambda shape, space=pltpu.VMEM: pl.BlockSpec(  # noqa: E731
        shape, lambda i, tl: tuple(0 for _ in shape), memory_space=space)
    tile = lambda n: pl.BlockSpec((n, BR, LANES),  # noqa: E731
                                  lambda i, tl: (0, i, 0),
                                  memory_space=pltpu.VMEM)
    dst, duni, dlt = pl.pallas_call(
        _make_fused_bwd_kernel(w, n_lights, has_checker, has_noise),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                tile(N_STATE), tile(15),
                fix(uni.shape),
                fix(dflt.shape, pltpu.SMEM),
                fix(lt.shape, pltpu.SMEM),
                fix(ptab.shape),
                pl.BlockSpec((BR, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                tile(N_STATE),
            ],
            out_specs=[
                tile(N_STATE),
                fix(uni.shape),                    # revisited accumulator
                pl.BlockSpec((1, 8, LANES), lambda i, tl: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((w, BR, LANES), jnp.float32)]),
        out_shape=[
            jax.ShapeDtypeStruct((N_STATE, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct(uni.shape, jnp.float32),
            jax.ShapeDtypeStruct((nt, 8, LANES), jnp.float32),
        ],
        compiler_params=_cparams(has_noise),
        interpret=_pi.INTERPRET,
    )(tlive, st, rnd, uni, dflt, lt, ptab, kind, idx, g)
    rows = lt.shape[0]
    d_lt = dlt[:, 0, :rows * LT_COLS].sum(0).reshape(rows, LT_COLS)
    z = lambda sh: jnp.zeros(sh, jnp.float32)  # noqa: E731
    return (np.zeros(jnp.shape(tlive), jax.dtypes.float0), dst,
            z(jnp.shape(rnd)), duni, z(jnp.shape(dflt)), z(det_sh),
            z(det_sh), z(det_sh), z(det_sh), z(dbl_sh), z(sph_sh),
            z(quad_sh), z(cab_sh), d_lt, z(jnp.shape(ptab)))


_fused_call.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# whole-wave trace kernel: the ENTIRE bounce loop inside one dispatch
# ---------------------------------------------------------------------------
#
# Even with the one-kernel bounce, the round-5 trace showed ~6 ms/wave
# of device idle around 3.8 ms/wave of work: the per-(chunk, bounce)
# lax.cond + scan sequencing stalls the pipeline at every step (768
# conditionals and 192 while iterations per 12 waves). Here the bounce
# scan moves INSIDE the kernel: grid = (wave tiles, depth), iteration
# order tile-major with bounces innermost, and the wavefront carry for
# a tile lives in a REVISITED output block (constant index over the
# bounce dim — Mosaic keeps it in VMEM across the tile's bounce steps,
# the matmul-accumulator pattern generalized to state). One wave of the
# flagship render = ONE pallas dispatch; the only per-wave XLA left is
# camera rays, the batched threefry, and the image accumulation.
#
# Liveness needs no scalar prefetch: each (tile, bounce) step reads its
# own alive plane from the resident carry and pl.when-skips everything
# (a dead tile-bounce costs the block DMAs only). The backward is a
# mirrored kernel: bounces iterate REVERSED (index maps d -> depth-1-d),
# the carry cotangent rides a revisited block, the bounce-d input state
# comes from the ``hist`` residual written by the forward, winner rows
# are rebuilt from (kind, idx) via the one-hot fetch, and d_uni / d_lt
# accumulate into revisited blocks across the whole grid.
#
# Streams/arithmetic are bit-identical to the per-bounce fused path:
# the randoms arrive as precomputed per-(chunk, bounce) planes drawn
# from the SAME threefry streams, and tiles/bounces execute the same
# per-tile math in the same order.

def _make_trace_kernel(cfg, w, n_lights, has_checker, has_noise, depth):
    def kernel(st0_ref, rnd_ref, uni_ref, dflt_ref, det_ref, u_ref,
               v_ref, t_ref, dbl_ref, sph_ref, quad_ref, cab_ref,
               lt_ref, ptab_ref, stf_ref, hist_ref, kind_ref, idx_ref,
               selv_ref):
        d = pl.program_id(1)

        @pl.when(d == 0)
        def _init():
            stf_ref[:] = st0_ref[:]

        P = stf_ref[:]
        hist_ref[0] = P          # bounce-d input state (bwd residual)
        tile_alive = jnp.max(P[7:8]) > 0.5

        @pl.when(jnp.logical_not(tile_alive))
        def _dead():
            kind_ref[:] = jnp.zeros_like(kind_ref)
            idx_ref[:] = jnp.zeros_like(idx_ref)

        @pl.when(tile_alive)
        def _live():
            dt = jnp.concatenate(
                [jnp.full((1, LANES), dflt_ref[0, c]) for c in range(w)],
                axis=0)                               # [w, 128]
            selv_ref[:] = jnp.broadcast_to(dt[:, None, :],
                                           (w, BR, LANES))
            kind_ref[:] = jnp.zeros_like(kind_ref)
            idx_ref[:] = jnp.zeros_like(idx_ref)
            for r in range(BR):
                row_alive = jnp.max(P[7:8, r, :]) > 0.5

                @pl.when(row_alive)
                def _row(r=r):
                    sel, bk, bi = _search_row(
                        P, r, cfg, uni_ref, det_ref, u_ref, v_ref,
                        t_ref, dbl_ref, sph_ref, quad_ref, dt,
                        cab=cab_ref)
                    selv_ref[:, r:r + 1, :] = sel[:, None, :]
                    kind_ref[0, r:r + 1, :] = bk.astype(jnp.int32)
                    idx_ref[0, r:r + 1, :] = bi.astype(jnp.int32)

            stf_ref[:] = _tile_core(
                P, rnd_ref[0], selv_ref[:], kind_ref[0],
                _read_lt_local(lt_ref, n_lights + 1), n_lights,
                has_checker, has_noise, ptab_ref[:])

    return kernel


def _make_trace_bwd_kernel(w, n_lights, has_checker, has_noise, depth):
    from rust_ray_tracer_tpu.ops.pallas_shade import LT_COLS

    def kernel(hist_ref, rnd_ref, uni_ref, dflt_ref, lt_ref, ptab_ref,
               kind_ref, idx_ref, g_ref, dst_ref, duni_ref, dlt_ref,
               selv_ref):
        i = pl.program_id(0)
        dd = pl.program_id(1)    # reversed bounce (index maps handle it)

        @pl.when((i == 0) & (dd == 0))
        def _init_acc():
            duni_ref[:] = jnp.zeros_like(duni_ref)
            dlt_ref[:] = jnp.zeros_like(dlt_ref)

        @pl.when(dd == 0)
        def _init_g():
            dst_ref[:] = g_ref[:]

        P = hist_ref[0]                        # bounce-d input state
        tile_alive = jnp.max(P[7:8]) > 0.5     # same predicate as fwd

        @pl.when(tile_alive)
        def _live():
            kindp = kind_ref[0]
            idxf = idx_ref[0].astype(jnp.float32)
            dt = jnp.concatenate(
                [jnp.full((1, LANES), dflt_ref[0, c]) for c in range(w)],
                axis=0)
            selv_ref[:] = jnp.broadcast_to(dt[:, None, :],
                                           (w, BR, LANES))
            for r in range(BR):
                found_r = kindp[r:r + 1, :] > 0
                any_found = jnp.max(jnp.where(found_r, 1, 0)) > 0

                @pl.when(any_found)
                def _row(r=r, found_r=found_r):
                    sel = _rebuild_row(uni_ref, idxf[r:r + 1, :],
                                       found_r, dt)
                    selv_ref[:, r:r + 1, :] = sel[:, None, :]

            selv = selv_ref[:]
            rnd_t = rnd_ref[0]
            lt = _read_lt_local(lt_ref, n_lights + 1)
            ptab = ptab_ref[:] if has_noise else None

            def core(st_, selv_, lt_):
                return _tile_core(st_, rnd_t, selv_, kindp, lt_,
                                  n_lights, has_checker, has_noise, ptab)

            _, vjp = jax.vjp(core, P, selv, lt)
            dst, dsel, dlt = vjp(dst_ref[:])
            dst_ref[:] = dst

            pu_ = duni_ref.shape[0]
            for r in range(BR):
                found_r = kindp[r:r + 1, :] > 0
                any_found = jnp.max(jnp.where(found_r, 1, 0)) > 0

                @pl.when(any_found)
                def _acc(r=r, found_r=found_r):
                    bi = jnp.where(found_r, idxf[r:r + 1, :], -1.0)
                    drows = jnp.where(
                        jnp.broadcast_to(found_r, (w, LANES)),
                        dsel[:, r, :], 0.0)           # [w, 128]
                    for p0 in range(0, pu_, PC):
                        pc = min(PC, pu_ - p0)
                        iif = (lax.broadcasted_iota(
                            jnp.int32, (pc, LANES), 0)
                            .astype(jnp.float32) + float(p0))
                        m = (iif == bi).astype(jnp.float32)
                        contrib = lax.dot_general(
                            m, drows, (((1,), (1,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                        duni_ref[p0:p0 + pc, :] = (
                            duni_ref[p0:p0 + pc, :] + contrib)

            rows = n_lights + 1
            acc = jnp.zeros((8, LANES), jnp.float32)
            rr = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            cc = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            for r in range(rows):
                for j in range(LT_COLS):
                    s = dlt[r][j]
                    acc = acc + jnp.where(
                        (rr == 0) & (cc == r * LT_COLS + j), s, 0.0)
            dlt_ref[:] = dlt_ref[:] + acc

    return kernel


def _trace_impl(cfg, st0, rnd, uni, dflt, det_t, u_t, v_t, t_t, dbl_t,
                sph, quad, cab, lt, ptab):
    (n_lights, has_checker, has_noise) = cfg[6:9]
    depth = cfg[14]
    w = uni.shape[1]
    cr = st0.shape[1]
    nt = cr // BR
    fix = lambda shape, space=pltpu.VMEM: pl.BlockSpec(  # noqa: E731
        shape, lambda i, d: tuple(0 for _ in shape), memory_space=space)
    return pl.pallas_call(
        _make_trace_kernel(cfg, w, n_lights, has_checker, has_noise,
                           depth),
        grid=(nt, depth),
        in_specs=[
            pl.BlockSpec((N_STATE, BR, LANES), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 15, BR, LANES), lambda i, d: (d, 0, i, 0),
                         memory_space=pltpu.VMEM),
            fix(uni.shape),
            fix(dflt.shape, pltpu.SMEM),
            fix(det_t.shape), fix(u_t.shape), fix(v_t.shape),
            fix(t_t.shape), fix(dbl_t.shape),
            fix(sph.shape), fix(quad.shape),
            fix(cab.shape, pltpu.SMEM),
            fix(lt.shape, pltpu.SMEM),
            fix(ptab.shape),
        ],
        out_specs=[
            pl.BlockSpec((N_STATE, BR, LANES), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_STATE, BR, LANES),
                         lambda i, d: (d, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, LANES), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, LANES), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_STATE, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((depth, N_STATE, cr, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((depth, cr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((depth, cr, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((w, BR, LANES), jnp.float32)],
        compiler_params=_cparams(has_noise),
        interpret=_pi.INTERPRET,
    )(st0, rnd, uni, dflt, det_t, u_t, v_t, t_t, dbl_t, sph, quad,
      cab, lt, ptab)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trace_call(cfg, st0, rnd, uni, dflt, det_t, u_t, v_t, t_t, dbl_t,
                sph, quad, cab, lt, ptab):
    """Whole-wave bounce loop in one dispatch (see section comment).
    Returns the final carry planes. Differentiable w.r.t. ``st0``,
    ``uni`` and ``lt``; selection + search/perlin tables detached."""
    stf, _, kind, idx = _trace_impl(cfg, st0, rnd, uni, dflt, det_t,
                                    u_t, v_t, t_t, dbl_t, sph, quad,
                                    cab, lt, ptab)
    return stf


def _trace_fwd(cfg, st0, rnd, uni, dflt, det_t, u_t, v_t, t_t, dbl_t,
               sph, quad, cab, lt, ptab):
    stf, hist, kind, idx = _trace_impl(cfg, st0, rnd, uni, dflt, det_t,
                                       u_t, v_t, t_t, dbl_t, sph, quad,
                                       cab, lt, ptab)
    return stf, (hist, rnd, uni, dflt, lt, ptab, kind, idx)


def _trace_bwd(cfg, res, g):
    import numpy as np
    hist, rnd, uni, dflt, lt, ptab, kind, idx = res
    (n_lights, has_checker, has_noise) = cfg[6:9]
    (det_sh, dbl_sh, sph_sh, quad_sh, cab_sh) = cfg[9:14]
    depth = cfg[14]
    from rust_ray_tracer_tpu.ops.pallas_shade import LT_COLS

    w = uni.shape[1]
    cr = hist.shape[2]
    nt = cr // BR
    rev = lambda d: depth - 1 - d  # noqa: E731
    fix = lambda shape, space=pltpu.VMEM: pl.BlockSpec(  # noqa: E731
        shape, lambda i, d: tuple(0 for _ in shape), memory_space=space)
    dst, duni, dlt = pl.pallas_call(
        _make_trace_bwd_kernel(w, n_lights, has_checker, has_noise,
                               depth),
        grid=(nt, depth),
        in_specs=[
            pl.BlockSpec((1, N_STATE, BR, LANES),
                         lambda i, d: (rev(d), 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 15, BR, LANES),
                         lambda i, d: (rev(d), 0, i, 0),
                         memory_space=pltpu.VMEM),
            fix(uni.shape),
            fix(dflt.shape, pltpu.SMEM),
            fix(lt.shape, pltpu.SMEM),
            fix(ptab.shape),
            pl.BlockSpec((1, BR, LANES), lambda i, d: (rev(d), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, LANES), lambda i, d: (rev(d), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATE, BR, LANES), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_STATE, BR, LANES), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            fix(uni.shape),
            fix((8, LANES)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_STATE, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct(uni.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((w, BR, LANES), jnp.float32)],
        compiler_params=_cparams(has_noise),
        interpret=_pi.INTERPRET,
    )(hist, rnd, uni, dflt, lt, ptab, kind, idx, g)
    rows = lt.shape[0]
    d_lt = dlt[0, :rows * LT_COLS].reshape(rows, LT_COLS)
    z = lambda sh: jnp.zeros(sh, jnp.float32)  # noqa: E731
    return (dst, z(jnp.shape(rnd)), duni, z(jnp.shape(dflt)),
            z(det_sh), z(det_sh), z(det_sh), z(det_sh), z(dbl_sh),
            z(sph_sh), z(quad_sh), z(cab_sh), d_lt, z(jnp.shape(ptab)))


_trace_call.defvjp(_trace_fwd, _trace_bwd)


def trace_wave_uber(scene, wkey, width: int, height: int,
                    depth: int, chunk_size: int, ctx=None):
    """One full sample-wave through :func:`_trace_call` — returns the
    [n_chunks * chunk_size, 3] radiance rows (chunk-major; caller crops
    the tail) with EXACTLY the per-chunk path's sampled trajectories:
    camera rays and randoms are keyed by (wave key, global chunk id,
    bounce) just as render_chunk/trace_rays draw them, each chunk's
    planes are packed with its own tile padding, and the kernel
    processes the same 1024-lane tiles in the same order.
    """
    from rust_ray_tracer_tpu.ops import camera as cam_ops

    if ctx is None:
        ctx = make_ctx(scene)
    uni, dflt, (t_off, s_off, q_off), search, lt, cab, ptab = ctx
    det_t, u_t, v_t, t_t, dbl_t, sph, quad = search

    n = width * height
    n_chunks = -(-n // chunk_size)
    chunk_ids = jnp.arange(n_chunks)
    pad = (-chunk_size) % (BR * LANES)
    cp = chunk_size + pad
    cr_c = cp // LANES

    def prim(cid):
        o, d, t, ckey = cam_ops.camera_rays_for_chunk(
            scene.camera, wkey, cid, chunk_size, width, height)
        ck = rngu.stream(ckey, rngu.CHUNK)
        st, _ = pack_state(o, d, t, jnp.zeros((chunk_size, 3), o.dtype),
                           jnp.ones((chunk_size, 3), o.dtype),
                           jnp.ones((chunk_size,), bool))

        def draw(b):
            bk = rngu.bounce_key(ck, b)
            ub = jax.random.uniform(rngu.stream(bk, rngu.SCATTER),
                                    (chunk_size, 9), dtype=o.dtype)
            gb = jax.random.normal(rngu.stream(bk, rngu.FUZZ),
                                   (chunk_size, 6), dtype=o.dtype)
            ub = jnp.pad(ub, ((0, pad), (0, 0)))
            gb = jnp.pad(gb, ((0, pad), (0, 0)))
            return jnp.concatenate([ub.T.reshape(9, cr_c, LANES),
                                    gb.T.reshape(6, cr_c, LANES)],
                                   axis=0)            # [15, cr_c, 128]

        rnd = jax.vmap(draw)(jnp.arange(depth))       # [depth, 15, ...]
        return st, rnd

    st_c, rnd_c = lax.map(prim, chunk_ids)
    # chunk-major concat along the plane-row axis
    st0 = jnp.moveaxis(st_c, 0, 1).reshape(N_STATE, n_chunks * cr_c,
                                           LANES)
    rnd = jnp.moveaxis(rnd_c, 0, 2).reshape(
        depth, 15, n_chunks * cr_c, LANES)

    from rust_ray_tracer_tpu.ops.intersect import KIND_NONE  # noqa: F401
    has_checker = scene.tex_even.shape[0] > 0
    has_noise = scene.perlin_vec.shape[0] > 0
    cfg = (scene.tri_v0.shape[0] > 0, scene.sph_c0.shape[0] > 0,
           scene.quad_q.shape[0] > 0, t_off, s_off, q_off,
           int(lt.shape[0]) - 1, has_checker, has_noise,
           tuple(det_t.shape), tuple(dbl_t.shape),
           tuple(sph.shape), tuple(quad.shape), tuple(cab.shape),
           int(depth))
    stf = _trace_call(cfg, st0, rnd, uni, dflt, det_t, u_t, v_t, t_t,
                      dbl_t, sph, quad, cab, lt, ptab)
    L = stf[8:11].reshape(3, n_chunks, cr_c * LANES)
    L = jnp.moveaxis(L, 0, 2)[:, :chunk_size, :]      # [n_chunks, C, 3]
    return L.reshape(n_chunks * chunk_size, 3)


# ---------------------------------------------------------------------------
# glue: eligibility, table builds, the full uber bounce
# ---------------------------------------------------------------------------

def _pad_rows(x, mult, value=0.0):
    n = x.shape[0]
    target = max(mult, -(-n // mult) * mult)
    if target == n:
        return x
    pad = jnp.full((target - n,) + x.shape[1:], value, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def uber_eligible(scene) -> bool:
    """Static (shape-only — callable at trace time) per-scene gate for
    the plane-resident uber bounce. Unlike pallas_bounce.eligible,
    marble-noise scenes ARE eligible since r5: the fused/trace cores
    evaluate perlin in-kernel via one-hot MXU lookups (random,
    rect_light, perlin_spheres — final_scene stays media-blocked).
    Constraints on the noise route: the one-kernel (fused) core only
    (RRT_NO_UBER_FUSED falls back to the XLA shade path), and no
    checker textures in the same scene (a checker-of-noise LEAF would
    need a second marble eval the in-kernel checker select doesn't do;
    no builder scene mixes them — shape-only check)."""
    if os.environ.get("RRT_NO_UBER", "") == "1":
        return False
    if os.environ.get("RRT_NO_MEGAKERNEL", "") == "1":
        return False
    if os.environ.get("RRT_NO_PALLAS_SHADE", "") == "1":
        return False          # debugging isolation: keep shade() reachable
    if scene.n_media:
        return False          # media free-flight stays on the split path
    if scene.img_data.shape[0]:
        return False          # image texel tables don't fit the kernel
    from rust_ray_tracer_tpu.ops.pallas_bounce import LT_COLS
    if (scene.n_lights + 1) * LT_COLS > LANES:
        return False
    if scene.perlin_vec.shape[0]:
        if os.environ.get("RRT_UBER_NOISE", "1") == "0":
            return False
        if os.environ.get("RRT_NO_UBER_FUSED", "") == "1":
            return False
        if scene.tex_even.shape[0]:
            return False      # checker + noise mix unsupported in-kernel
    rows = (scene.tri_v0.shape[0] + scene.sph_c0.shape[0]
            + scene.quad_q.shape[0])
    return 0 < rows <= ROWS_MAX


def pack_state(o, d, time, L, beta, alive):
    """[C,*] wavefront carry -> [N_STATE, CRp, 128] planes (+ the real
    lane count). Pad lanes are dead (alive=0)."""
    c = o.shape[0]
    pad = (-c) % (BR * LANES)
    cp = c + pad

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(1, cp // LANES, LANES)

    cols = ([plane(o[:, i]) for i in range(3)]
            + [plane(d[:, i]) for i in range(3)]
            + [plane(time), plane(alive.astype(o.dtype))]
            + [plane(L[:, i]) for i in range(3)]
            + [plane(beta[:, i]) for i in range(3)])
    return jnp.concatenate(cols, axis=0), c


def unpack_radiance(st, c):
    """[N_STATE, CRp, 128] planes -> L [c, 3]."""
    cr = st.shape[1]
    return st[8:11].reshape(3, cr * LANES)[:, :c].T


def _scene_tables(scene):
    """(uni, dflt, cfg-offsets) — differentiable winner table in the
    fixed tri/sphere/quad row order the kernel's global ids assume."""
    from rust_ray_tracer_tpu.ops.intersect import _mat_attr_table

    f32 = scene.mat_fuzz.dtype
    matt = _mat_attr_table(scene)

    def kind_table(pack_cols, flip_col, mat_col):
        return jnp.concatenate(
            [pack_cols, flip_col.astype(f32)[:, None],
             mat_col.astype(f32)[:, None], matt[mat_col]], axis=1)

    parts = []
    t_off = s_off = q_off = 0
    off = 0
    if scene.tri_v0.shape[0]:
        t_off = off
        parts.append(kind_table(
            jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2],
                            axis=1), scene.tri_flip, scene.tri_mat))
        off += scene.tri_v0.shape[0]
    if scene.sph_c0.shape[0]:
        s_off = off
        parts.append(kind_table(
            jnp.concatenate(
                [scene.sph_c0, scene.sph_c1, scene.sph_t0[:, None],
                 scene.sph_t1[:, None], scene.sph_r[:, None]], axis=1),
            scene.sph_flip, scene.sph_mat))
        off += scene.sph_c0.shape[0]
    if scene.quad_q.shape[0]:
        q_off = off
        parts.append(kind_table(
            jnp.concatenate([scene.quad_q, scene.quad_u, scene.quad_v],
                            axis=1), scene.quad_flip, scene.quad_mat))
        off += scene.quad_q.shape[0]
    uni = jnp.concatenate(parts, axis=0)
    # miss default: first kind's pack row 0, flip/mat 0, material 0's
    # attrs (the split path's miss convention, intersect_select)
    dflt = jnp.concatenate(
        [uni[0, :9], jnp.zeros((2,), f32), matt[0]])[None]
    uni = _pad_rows(uni, 8)
    return uni, dflt, (t_off, s_off, q_off)


def _search_tables(scene_s):
    """Detached transposed search tables ([T,10] x4 + dbl [T,1], sphere
    [S,9] with far-pad rows, quad [Q,9] with zero pads)."""
    from rust_ray_tracer_tpu.ops.intersect import _tri_coeffs

    if scene_s.tri_v0.shape[0]:
        det_c, u_c, v_c, t_c = _tri_coeffs(
            scene_s.tri_v0, scene_s.tri_e1, scene_s.tri_e2)
        det_t, u_t, v_t, t_t = det_c.T, u_c.T, v_c.T, t_c.T
        dbl_t = scene_s.tri_double.astype(jnp.float32)[:, None]
    else:
        det_t = u_t = v_t = t_t = jnp.zeros((8, 10), jnp.float32)
        dbl_t = jnp.zeros((8, 1), jnp.float32)
    # pad to TCC multiples: the fused kernel's fori_loop sweep reads
    # full TCC-row dslices (pad coeff rows are zeros -> det 0 -> always
    # rejected; all-pad chunks get inverted cull boxes and never run)
    det_t, u_t, v_t, t_t = (_pad_rows(x, TCC) for x in
                            (det_t, u_t, v_t, t_t))
    dbl_t = _pad_rows(dbl_t, TCC)

    s_n = scene_s.sph_c0.shape[0]
    if s_n:
        dt = scene_s.sph_t1 - scene_s.sph_t0
        inv_dt = 1.0 / jnp.where(jnp.abs(dt) < 1e-12,
                                 jnp.where(dt < 0, -1e-12, 1e-12), dt)
        sph = jnp.concatenate(
            [scene_s.sph_c0, scene_s.sph_c1 - scene_s.sph_c0,
             scene_s.sph_t0[:, None], inv_dt[:, None],
             scene_s.sph_r[:, None]], axis=1)
        # far pads: c0 = 1e30 -> disc = inf - inf = NaN, rejected on
        # every comparison (pallas_intersect sphere-table convention)
        pad = (-s_n) % 8
        if pad:
            padrow = jnp.zeros((pad, 9), jnp.float32).at[:, 0:3].set(1e30)
            sph = jnp.concatenate([sph, padrow], axis=0)
    else:
        sph = jnp.zeros((8, 9), jnp.float32).at[:, 0:3].set(1e30)

    if scene_s.quad_q.shape[0]:
        quad = jnp.concatenate(
            [scene_s.quad_q, scene_s.quad_u, scene_s.quad_v], axis=1)
        quad = _pad_rows(quad, 8)     # zero edges -> |denom| == 0
    else:
        quad = jnp.zeros((8, 9), jnp.float32)
    return det_t, u_t, v_t, t_t, dbl_t, sph, quad


def make_ctx(scene):
    """Scene-derived tables for :func:`bounce_uber`, built ONCE per
    trace. Building them inside the bounce scan body re-runs the
    Plücker coeff cross products + table concats EVERY bounce — XLA
    does not hoist them out of the scan/cond (measured: 4.3 ms/wave
    fwd, ~9.8 ms/wave step on suzanne, r5 trace). ``uni`` stays in the
    autodiff graph (differentiable w.r.t. scene); the search tables are
    detached."""
    from rust_ray_tracer_tpu.ops.pallas_shade import LT_COLS, _light_table

    uni, dflt, offs = _scene_tables(scene)
    scene_s = jax.tree.map(
        lambda x: lax.stop_gradient(x) if isinstance(x, jnp.ndarray)
        else x, scene)
    search = _search_tables(scene_s)
    lt = jnp.concatenate(
        [_light_table(scene) if scene.n_lights
         else jnp.zeros((0, LT_COLS), jnp.float32),
         jnp.pad(scene.background[None, :], ((0, 0), (0, LT_COLS - 3)))],
        axis=0)
    cab = _chunk_aabbs(scene_s, search[0].shape[0])
    # perlin tables as one [8, 256] VMEM plane: rows 0-2 gradient x/y/z
    # (transposed), rows 4-6 the permutation tables as exact-int f32.
    # Detached (pallas_bounce noise section); zeros when the scene has
    # no noise texture (the kernels never read it then).
    if scene_s.perlin_vec.shape[0]:
        ptab = jnp.zeros((8, 256), jnp.float32)
        ptab = ptab.at[0:3, :].set(scene_s.perlin_vec.T)
        ptab = ptab.at[4, :].set(scene_s.perlin_px.astype(jnp.float32))
        ptab = ptab.at[5, :].set(scene_s.perlin_py.astype(jnp.float32))
        ptab = ptab.at[6, :].set(scene_s.perlin_pz.astype(jnp.float32))
    else:
        ptab = jnp.zeros((8, 256), jnp.float32)
    return uni, dflt, offs, search, lt, cab, ptab


def _chunk_aabbs(scene_s, tp: int):
    """[ceil(tp/TCC), 8] = (lo3, hi3, 0, 0) AABBs over TCC-sized chunks
    of the (Morton-ordered) triangle table — the fused kernel's
    row x chunk cull boxes. Pad rows (zero coefficient tris past the
    real count) get inverted boxes (+inf lo / -inf hi), so all-pad
    chunks are never swept; real chunks' boxes ignore them."""
    n_chunks = max(1, -(-tp // TCC))
    n = scene_s.tri_v0.shape[0]
    if n == 0:
        return jnp.zeros((n_chunks, 8), jnp.float32)
    v0 = scene_s.tri_v0
    c1 = v0 + scene_s.tri_e1
    c2 = v0 + scene_s.tri_e2
    lo3 = jnp.minimum(jnp.minimum(v0, c1), c2)      # [n, 3]
    hi3 = jnp.maximum(jnp.maximum(v0, c1), c2)
    padn = n_chunks * TCC - n
    lo3 = jnp.concatenate(
        [lo3, jnp.full((padn, 3), jnp.inf, lo3.dtype)], axis=0)
    hi3 = jnp.concatenate(
        [hi3, jnp.full((padn, 3), -jnp.inf, hi3.dtype)], axis=0)
    lo = lo3.reshape(n_chunks, TCC, 3).min(axis=1)
    hi = hi3.reshape(n_chunks, TCC, 3).max(axis=1)
    return jnp.concatenate(
        [lo, hi, jnp.zeros((n_chunks, 2), lo.dtype)],
        axis=1).astype(jnp.float32)


def bounce_uber(scene, bkey, st, rand=None, ctx=None):
    """One full wavefront bounce on plane-resident state.

    ``st`` [N_STATE, CR, 128]; returns the next ``st``. Threefry streams
    identical to ops/shade.shade / pallas_bounce.bounce_fused, so the
    sampled trajectories match the split pipeline bitwise.
    """
    from rust_ray_tracer_tpu.ops import pallas_bounce as pb
    from rust_ray_tracer_tpu.ops.intersect import (MATTR_ALBEDO,
                                                   MATTR_EVEN,
                                                   MATTR_FUZZ,
                                                   MATTR_IOR,
                                                   MATTR_ISCHK,
                                                   MATTR_MKIND,
                                                   MATTR_ODD)

    f32 = st.dtype
    cr = st.shape[1]
    c = cr * LANES
    has_checker = scene.tex_even.shape[0] > 0
    if ctx is None:
        ctx = make_ctx(scene)

    # ---- the bounce's random budget (identical streams to shade()) ----
    if rand is None:
        ub = jax.random.uniform(rngu.stream(bkey, rngu.SCATTER), (c, 9),
                                dtype=f32)
        gb = jax.random.normal(rngu.stream(bkey, rngu.FUZZ), (c, 6),
                               dtype=f32)
    else:
        ub, gb = rand
        pad = c - ub.shape[0]
        if pad:
            ub = jnp.pad(ub, ((0, pad), (0, 0)))
            gb = jnp.pad(gb, ((0, pad), (0, 0)))
    ub = checkpoint_name(ub, "shade_rand")
    gb = checkpoint_name(gb, "shade_rand")
    rnd = jnp.concatenate([ub.T.reshape(9, cr, LANES),
                           gb.T.reshape(6, cr, LANES)], axis=0)

    # ---- live-tile list + phase 1 (one kernel) ----
    alive = st[7]
    tlive = jnp.any(alive.reshape(cr // BR, BR, LANES) > 0.5,
                    axis=(1, 2)).astype(jnp.int32)
    uni, dflt, (t_off, s_off, q_off), search, lt, cab, ptab = ctx
    det_t, u_t, v_t, t_t, dbl_t, sph, quad = search
    has_noise = scene.perlin_vec.shape[0] > 0

    if os.environ.get("RRT_NO_UBER_FUSED", "") != "1":
        # one-kernel bounce: search + phase 2 + shade + update fused
        cfg = (scene.tri_v0.shape[0] > 0, scene.sph_c0.shape[0] > 0,
               scene.quad_q.shape[0] > 0, t_off, s_off, q_off,
               int(lt.shape[0]) - 1, has_checker, has_noise,
               tuple(det_t.shape), tuple(dbl_t.shape),
               tuple(sph.shape), tuple(quad.shape), tuple(cab.shape))
        return _fused_call(cfg, tlive, st, rnd, uni, dflt, det_t, u_t,
                           v_t, t_t, dbl_t, sph, quad, cab, lt, ptab)

    st8 = lax.stop_gradient(st[0:N_ST])
    cfg = (scene.tri_v0.shape[0] > 0, scene.sph_c0.shape[0] > 0,
           scene.quad_q.shape[0] > 0, t_off, s_off, q_off,
           tuple(st8.shape), tuple(uni.shape), tuple(dflt.shape),
           tuple(det_t.shape), tuple(dbl_t.shape), tuple(sph.shape),
           tuple(quad.shape), tuple(tlive.shape))
    selv, kindp, idxp = _select_call(cfg, tlive, st8, uni, dflt, det_t,
                                     u_t, v_t, t_t, dbl_t, sph, quad)

    # ---- megakernel planes (pallas_bounce layout) ----
    A = 11  # uni column where the material-attr block starts
    one1 = jnp.ones((1, cr, LANES), f32)
    planes = [
        st[0:6],                               # o, d
        st[6:7],                               # time
        one1 * T_MIN,                          # tmin
        jnp.where(st[7:8] > 0.5, jnp.inf, -1.0),   # tmax
        selv[0:9],                             # winner pack
        jnp.zeros((1, cr, LANES), f32),        # t_med (no media here)
        selv[A + MATTR_ALBEDO.start:A + MATTR_ALBEDO.stop],
        selv[A + MATTR_FUZZ:A + MATTR_FUZZ + 1],
        selv[A + MATTR_IOR:A + MATTR_IOR + 1],
        st[8:11], st[11:14],                   # L, beta
        rnd,                                   # ub(9), gb(6)
        st[7:8],                               # alive
    ]
    flags = (selv[9] > 0.5).astype(jnp.int32)
    if has_checker:
        planes += [selv[A + MATTR_EVEN.start:A + MATTR_EVEN.stop],
                   selv[A + MATTR_ODD.start:A + MATTR_ODD.stop]]
        flags = flags | ((selv[A + MATTR_ISCHK] > 0.5).astype(jnp.int32)
                         << 1)
    planes = jnp.concatenate(planes, axis=0)
    mkind = selv[A + MATTR_MKIND].astype(jnp.int32)

    out = pb.bounce_planes_live(planes, kindp, mkind, flags, lt, tlive)
    # out: [13, CR, 128] = o'(3) d'(3) L'(3) beta'(3) alive'
    return jnp.concatenate([out[0:6], st[6:7], out[12:13], out[6:9],
                            out[9:12]], axis=0)
