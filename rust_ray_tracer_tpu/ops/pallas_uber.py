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
SC = 512                # sphere rows per chunk
QC = 512                # quad rows per chunk
PC = 1024               # winner-table rows per one-hot chunk
_BIGF = 3.0e38


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


def _min_with_index(tt, off):
    """Per-lane (min t, lowest row index attaining it) over axis 0.

    ``tt`` [R, 128]; returns ([1,128], [1,128] f32 index + off). Index
    arithmetic rides f32 (exact below 2^24; ROWS_MAX bounds it) because
    Mosaic's cross-sublane reductions are safest in f32. Matches
    ``jnp.argmin`` (first minimum) for every finite min; when the min is
    inf the index is garbage and the caller's fold ignores it.
    """
    loc_t = jnp.min(tt, axis=0, keepdims=True)
    # int32 iota cast to f32 (Mosaic's tpu.iota is integer-only)
    ii = (lax.broadcasted_iota(jnp.int32, tt.shape, 0)
          .astype(jnp.float32) + float(off))
    loc_i = jnp.min(jnp.where(tt == loc_t, ii, _BIGF), axis=0,
                    keepdims=True)
    return loc_t, loc_i


def _search_row(P, r, cfg, uni_ref, det_ref, u_ref, v_ref, t_ref,
                dbl_ref, sph_ref, quad_ref, dflt_tile):
    """Phase 1 for ray row ``r`` (128 lanes) of a tile.

    Returns (sel [W,128] winner-row values, kind [1,128] f32,
    idx [1,128] f32 global winner-table row).
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
        for c0 in range(0, tp, TC):
            tc = min(TC, tp - c0)
            dm = _dot_tn(det_ref[c0:c0 + tc, :], f)   # [tc, 128]
            um = _dot_tn(u_ref[c0:c0 + tc, :], f)
            vm = _dot_tn(v_ref[c0:c0 + tc, :], f)
            tm = _dot_tn(t_ref[c0:c0 + tc, :], f)
            dbl = dbl_ref[c0:c0 + tc, :]              # [tc, 1]
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
            loc_t, loc_i = _min_with_index(tt, t_off + c0)
            # lexicographic (t, index): ascending-id sweep == the dense
            # kernel's front-to-back + lexicographic fold (both resolve
            # equal t to the lowest global triangle id)
            better = (loc_t < best_t) | ((loc_t == best_t)
                                         & (loc_i < best_i))
            best_i = jnp.where(better, loc_i, best_i)
            best_k = jnp.where(better, float(KIND_TRI), best_k)
            best_t = jnp.where(better, loc_t, best_t)

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
    # reconstructs a f32 exactly for a 1.0-weighted single row.
    w = uni_ref.shape[1]
    pu = uni_ref.shape[0]
    sel = jnp.zeros((w, LANES), jnp.float32)
    for p0 in range(0, pu, PC):
        pc = min(PC, pu - p0)
        iif = (lax.broadcasted_iota(jnp.int32, (pc, LANES), 0)
               .astype(jnp.float32) + float(p0))
        m = (iif == best_i).astype(jnp.float32)       # [pc, 128]
        sel = sel + _dot_onehot(uni_ref[p0:p0 + pc, :], m)
    # miss lanes take the default row (material 0's attrs) so the
    # branchless downstream eval never sees 0-ior/0-albedo poison —
    # same convention as intersect_select's miss default
    sel = jnp.where(jnp.broadcast_to(found, (w, LANES)), sel, dflt_tile)
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
    """Static per-scene gate for the plane-resident uber bounce."""
    from rust_ray_tracer_tpu.ops import pallas_bounce as pb

    if os.environ.get("RRT_NO_UBER", "") == "1":
        return False
    if scene.n_media:
        return False          # media free-flight stays on the split path
    if not pb.eligible(scene):
        return False          # noise/image textures or light-table size
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
    det_t, u_t, v_t, t_t = (_pad_rows(x, 8) for x in
                            (det_t, u_t, v_t, t_t))
    dbl_t = _pad_rows(dbl_t, 8)

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
    return uni, dflt, offs, search, lt


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
    uni, dflt, (t_off, s_off, q_off), search, lt = ctx
    det_t, u_t, v_t, t_t, dbl_t, sph, quad = search
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
