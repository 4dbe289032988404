"""Pallas TPU kernels: fused differentiable hit attributes (phase 2) —
forward AND backward.

The forward computes (t, p, normal, u, v) for the detached closest-hit
selection in one plane-layout kernel — triangle Möller–Trumbore
recompute, sphere roots/normal, quad plane/barycentrics, medium
constant, cross-kind select, FlipFace — replacing a dozen XLA fusion
islands per bounce (ops/intersect.hit_attrs_core is the semantic
reference; reference parity notes there: triangle.rs:38-69,
sphere.rs:52-95, aarect.rs:38-67, constant_medium.rs:46-80,
geometry/mod.rs:226-230).

The backward is a second Pallas kernel that calls ``jax.vjp`` of the
SAME plane-level core (:func:`_hit_plane_core`) at trace time: primal
recompute + every transpose compile into one fused Mosaic kernel, so
reverse-mode never leaves VMEM for the per-ray math. The custom-VJP
boundary sits at the planes level (``_hit_planes_call``); the cheap
[C]-sized epilogue (sphere UV arccos/arctan2 — risky Mosaic
transcendentals — and the plane packing) stays in XLA and is
differentiated by ordinary JAX AD. The per-ray primitive packs are
gathered in XLA, so gradient scatter-adds into the scene tables stay
with XLA's gather transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.ops import pallas_intersect as _pi
from rust_ray_tracer_tpu.ops.pallas_shade import (
    LANES, _dot, _normalize, _pick_br, _safe_sqrt)

EPS = 1e-12
# The winner's 9-float parameter pack is UNIFIED across primitive kinds
# (round 4): rows 9..17 are read as (v0,e1,e2) by the triangle math, as
# (c0,c1,t0,t1,r) by the sphere math and as (q,u,v) by the quad math —
# every sub-computation is _safe_div/_safe_sqrt-guarded, so the two
# non-winner interpretations produce finite garbage that the final
# kind-select (and its zero cotangent in reverse mode) discards. This
# replaces three 9-plane sections (27 rows) and their three XLA
# gathers/scatter-adds with one of each.
N_IN = 19    # o(3) d(3) time tmin tmax pack(9) tmed
N_OUT = 12   # t p(3) n(3) u v uvsrc(3)


def _safe_div(a, b):
    bs = jnp.where(jnp.abs(b) < EPS, jnp.where(b < 0, -EPS, EPS), b)
    return a / bs


def _hit_plane_core(P, kind, flip):
    """Pure plane-level hit-attribute math shared by fwd and bwd kernels.

    Args:
      P: ``[N_IN, BR, 128]`` input plane stack.
      kind, flip: ``[BR, 128]`` int32.

    Returns ``[N_OUT, BR, 128]``: t (inf on miss), p(3), normal(3),
    u, v (triangle/quad only), and the sphere-UV source vector (the host
    epilogue applies arccos/arctan2).
    """
    from rust_ray_tracer_tpu.ops.intersect import (
        KIND_MED, KIND_NONE, KIND_QUAD, KIND_SPH, KIND_TRI)

    def f(i):
        return P[i]

    ox, oy, oz = f(0), f(1), f(2)
    dx, dy, dz = f(3), f(4), f(5)
    time, tmin, tmax = f(6), f(7), f(8)
    # unified winner pack: three kind-specific views of rows 9..17
    v0x, v0y, v0z = f(9), f(10), f(11)
    e1x, e1y, e1z = f(12), f(13), f(14)
    e2x, e2y, e2z = f(15), f(16), f(17)
    c0x, c0y, c0z = f(9), f(10), f(11)
    c1x, c1y, c1z = f(12), f(13), f(14)
    st0, st1, sr = f(15), f(16), f(17)
    qx, qy, qz = f(9), f(10), f(11)
    qux, quy, quz = f(12), f(13), f(14)
    qvx, qvy, qvz = f(15), f(16), f(17)
    tmed = f(18)

    # ---- triangle (matches _tri_quants) ------------------------------
    tnx = e1y * e2z - e1z * e2y
    tny = e1z * e2x - e1x * e2z
    tnz = e1x * e2y - e1y * e2x
    det = -(dx * tnx + dy * tny + dz * tnz)
    mx_ = oy * dz - oz * dy
    my_ = oz * dx - ox * dz
    mz_ = ox * dy - oy * dx
    c_e2v0x = e2y * v0z - e2z * v0y
    c_e2v0y = e2z * v0x - e2x * v0z
    c_e2v0z = e2x * v0y - e2y * v0x
    c_v0e1x = v0y * e1z - v0z * e1y
    c_v0e1y = v0z * e1x - v0x * e1z
    c_v0e1z = v0x * e1y - v0y * e1x
    u_num = (_dot(mx_, my_, mz_, e2x, e2y, e2z)
             - _dot(dx, dy, dz, c_e2v0x, c_e2v0y, c_e2v0z))
    v_num = (-_dot(mx_, my_, mz_, e1x, e1y, e1z)
             - _dot(dx, dy, dz, c_v0e1x, c_v0e1y, c_v0e1z))
    t_num = (_dot(ox, oy, oz, tnx, tny, tnz)
             - _dot(v0x, v0y, v0z, tnx, tny, tnz))
    inv_det = _safe_div(jnp.ones_like(det), det)
    t_tri = t_num * inv_det
    u_tri = u_num * inv_det
    v_tri = v_num * inv_det
    sgn = jnp.where(det > 0, 1.0, jnp.where(det < 0, -1.0, 0.0))
    ntx, nty, ntz = _normalize(tnx, tny, tnz)
    ntx, nty, ntz = ntx * sgn, nty * sgn, ntz * sgn

    # ---- sphere (matches _sphere_roots + _sph attrs) ------------------
    frac = _safe_div(time - st0, st1 - st0)
    cenx = c0x + frac * (c1x - c0x)
    ceny = c0y + frac * (c1y - c0y)
    cenz = c0z + frac * (c1z - c0z)
    ocx, ocy, ocz = ox - cenx, oy - ceny, oz - cenz
    a = dx * dx + dy * dy + dz * dz
    b = _dot(ocx, ocy, ocz, dx, dy, dz)
    cc = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - sr * sr
    disc = b * b - a * cc
    ok = disc > 0.0
    sq = _safe_sqrt(disc)
    root1 = _safe_div(-b - sq, a)
    root2 = _safe_div(-b + sq, a)
    ok1 = ok & (root1 >= tmin) & (root1 <= tmax)
    t_sph = jnp.where(ok1, root1, root2)
    psx = ox + t_sph * dx
    psy = oy + t_sph * dy
    psz = oz + t_sph * dz
    # floor 1e-12, not 1e-20: the vjp computes -1/floor^2 and 1e-40
    # overflows f32 -> inf * (zero cotangent) = NaN when the unified
    # pack presents a zero "radius" (non-sphere winners)
    inv_r = 1.0 / jnp.maximum(sr, 1e-12)
    nsx, nsy, nsz = ((psx - cenx) * inv_r, (psy - ceny) * inv_r,
                     (psz - cenz) * inv_r)
    # UV source: unit normal for the near root, world p for the far
    # (sphere.rs:66-69 vs 80-82); host applies arccos/arctan2
    uvx = jnp.where(ok1, nsx, psx)
    uvy = jnp.where(ok1, nsy, psy)
    uvz = jnp.where(ok1, nsz, psz)

    # ---- quad (matches _quad_quants) ----------------------------------
    wnx = quy * qvz - quz * qvy
    wny = quz * qvx - qux * qvz
    wnz = qux * qvy - quy * qvx
    denom = _dot(dx, dy, dz, wnx, wny, wnz)
    t_qud = _safe_div(
        _dot(qx - ox, qy - oy, qz - oz, wnx, wny, wnz), denom)
    wx_ = ox + t_qud * dx - qx
    wy_ = oy + t_qud * dy - qy
    wz_ = oz + t_qud * dz - qz
    inv_n2 = _safe_div(
        jnp.ones_like(denom), _dot(wnx, wny, wnz, wnx, wny, wnz))
    alpha = _dot(wy_ * qvz - wz_ * qvy, wz_ * qvx - wx_ * qvz,
                 wx_ * qvy - wy_ * qvx, wnx, wny, wnz) * inv_n2
    beta = _dot(quy * wz_ - quz * wy_, quz * wx_ - qux * wz_,
                qux * wy_ - quy * wx_, wnx, wny, wnz) * inv_n2
    nqx, nqy, nqz = _normalize(wnx, wny, wnz)
    dsign = jnp.where(_dot(dx, dy, dz, nqx, nqy, nqz) > 0, -1.0, 1.0)
    nqx, nqy, nqz = nqx * dsign, nqy * dsign, nqz * dsign

    # ---- select -------------------------------------------------------
    is_tri = kind == KIND_TRI
    is_sph = kind == KIND_SPH
    is_qud = kind == KIND_QUAD
    is_med = kind == KIND_MED

    def sel(tv, sv, qv, mv, default):
        return jnp.where(is_tri, tv,
                         jnp.where(is_sph, sv,
                                   jnp.where(is_qud, qv,
                                             jnp.where(is_med, mv,
                                                       default))))

    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    # miss lanes: t=0 here (finite p), inf on output (hit_attrs_core)
    t = sel(t_tri, t_sph, t_qud, tmed, zero)
    t_out = jnp.where(kind == KIND_NONE, jnp.inf, t)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    nx = sel(ntx, nsx, nqx, one, one)
    ny = sel(nty, nsy, nqy, zero, zero)
    nz = sel(ntz, nsz, nqz, zero, zero)
    ny = jnp.where(flip > 0, -jnp.abs(ny), ny)   # geometry/mod.rs:226-230
    uu = sel(u_tri, zero, alpha, zero, zero)
    vv = sel(v_tri, zero, beta, zero, zero)
    return jnp.stack([t_out, px, py, pz, nx, ny, nz, uu, vv,
                      uvx, uvy, uvz])


def _kernel(planes_ref, kind_ref, flip_ref, out_ref):
    out_ref[:] = _hit_plane_core(planes_ref[:], kind_ref[:], flip_ref[:])


def _bwd_kernel(planes_ref, kind_ref, flip_ref, g_ref, dpl_ref):
    P = planes_ref[:]
    kind = kind_ref[:]
    flip = flip_ref[:]

    def core(P_):
        return _hit_plane_core(P_, kind, flip)

    _, vjp = jax.vjp(core, P)
    (dP,) = vjp(g_ref[:])
    dpl_ref[:] = dP


@jax.custom_vjp
def _hit_planes_call(planes, kind_p, flip_p):
    """[N_IN, Cr, 128] planes -> [N_OUT, Cr, 128] attribute planes."""
    cr = planes.shape[1]
    br = _pick_br(cr)
    return pl.pallas_call(
        _kernel,
        grid=(cr // br,),
        in_specs=[
            pl.BlockSpec((N_IN, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT, br, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT, cr, LANES), jnp.float32),
        interpret=_pi.INTERPRET,
    )(planes, kind_p, flip_p)


def _hp_fwd(planes, kind_p, flip_p):
    return _hit_planes_call(planes, kind_p, flip_p), (planes, kind_p,
                                                      flip_p)


def _hp_bwd(res, g):
    planes, kind_p, flip_p = res
    cr = planes.shape[1]
    br = _pick_br(cr)
    dplanes = pl.pallas_call(
        _bwd_kernel,
        grid=(cr // br,),
        in_specs=[
            pl.BlockSpec((N_IN, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_OUT, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_IN, br, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_IN, cr, LANES), jnp.float32),
        interpret=_pi.INTERPRET,
    )(planes, kind_p, flip_p, g)
    import numpy as np
    zk = np.zeros(jnp.shape(kind_p), jax.dtypes.float0)
    zf = np.zeros(jnp.shape(flip_p), jax.dtypes.float0)
    return dplanes, zk, zf


_hit_planes_call.defvjp(_hp_fwd, _hp_bwd)


def hit_attrs_fused(o, d, time, t_min, t_max, kind, flip, pack, t_med):
    """Fused phase-2 hit attributes — differentiable (the heavy per-ray
    math runs as paired fwd/bwd Pallas kernels; packing and the sphere-UV
    epilogue are ordinary XLA and differentiated by JAX AD).

    ``pack`` [C,9] is the WINNER's parameter pack (unified across
    primitive kinds — see N_IN)."""
    from rust_ray_tracer_tpu.ops.intersect import KIND_SPH, _sphere_uv

    c = o.shape[0]
    pad = (-c) % (8 * LANES)
    cp = c + pad

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(cp // LANES, LANES)

    feats = ([o[:, i] for i in range(3)] + [d[:, i] for i in range(3)]
             + [time, t_min, t_max]
             + [pack[:, i] for i in range(9)]
             + [t_med])
    planes = jnp.stack([plane(x) for x in feats])       # [N_IN, Cr, 128]
    kind_p = plane(kind.astype(jnp.int32))
    flip_p = plane(flip.astype(jnp.int32))

    out = _hit_planes_call(planes, kind_p, flip_p)

    flat = out.reshape(N_OUT, cp)[:, :c]
    t, p, normal = flat[0], flat[1:4].T, flat[4:7].T
    uu, vv = flat[7], flat[8]
    u_s, v_s = _sphere_uv(flat[9:12].T)
    sph = kind == KIND_SPH
    return (t, p, normal,
            jnp.where(sph, u_s, uu), jnp.where(sph, v_s, vv))
