"""Pallas TPU kernels: fused material shading — forward AND backward.

One forward kernel evaluates all five materials + the light-mixture
sampling for a tile of rays, replacing ~40 XLA ops whose fusion
boundaries round-trip [C,3] intermediates through HBM (~38% of forward
wave time measured by ablation).

**Layout.** Scalars-as-planes: every per-ray quantity is a ``[Cr, 128]``
f32 plane (rays along lanes, full VPU utilization) and the kernel input
is the stack ``[F, BR, 128]``. A ``[C, 3]`` vector is three planes. The
tiny light table rides in SMEM and is looped over statically.

**RNG.** The bounce's random budget (9 uniforms + 6 normals per ray) is
drawn XLA-side (threefry, same streams as :func:`ops.shade.shade_core`)
and fed to the kernel as fifteen extra planes. An earlier revision
generated it in-kernel with the hardware PRNG; that made pallas-vs-XLA
renders statistically-decorrelated MC estimates (seed-to-seed mean
spread ~6.5% at 8spp) and — worse — forced the remat backward to re-run
the forward kernel just to regenerate the consumed randoms, because
custom-VJP residuals born inside the kernel cannot be checkpoint-named.
Threefry measured ~equal on the hot path ("already cheap", round-1
ablation), so shared streams win: the two backends follow identical
sampled paths and the random planes are nameable remat residuals.

**Gradients.** ``shade_fused`` is a ``jax.custom_vjp``; the backward is
a SECOND Pallas kernel (``_make_bwd_kernel``) that calls ``jax.vjp`` of
the *same plane-level core* (:func:`_plane_core`) at trace time, fed the
exported randoms — so the whole adjoint (forward recompute + transposes)
runs as one fused plane-layout kernel in VMEM, and the linearization is
taken around the identical sampled path. Detached sampling lives in
``_plane_core``'s ``stop_gradient``s (mixture-selected scatter
direction, fuzz/isotropic ball draws), mirroring
:func:`ops.shade.shade_core` exactly; gradients flow through BSDF
values, pdf evaluations and specular chains only. Light-table gradients
(solid-angle/area pdfs are differentiable in the light geometry) are
reduced in-kernel to per-tile scalars and summed in XLA.

Semantics: mirror of shade_core (material/mod.rs parity notes there).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.models.scene import (
    LIGHT_QUAD, LIGHT_SPHERE, MAT_DIELECTRIC, MAT_ISOTROPIC,
    MAT_LAMBERTIAN, MAT_LIGHT, MAT_METAL)
from rust_ray_tracer_tpu.ops import pallas_intersect as _pi
from rust_ray_tracer_tpu.ops.shade import Scatter

LANES = 128
BR = 32                 # plane rows per grid step (rays/step = BR*128)


def _pick_br(cr: int) -> int:
    """Largest row-block in {32, 16, 8} dividing the plane row count —
    BR=32 alone forces 4096-lane granularity, which pads 33% dead lanes
    at the tuned 9216-lane chunk (72 rows -> br=8, zero pad)."""
    for br in (32, 16, 8):
        if cr % br == 0:
            return br
    raise ValueError(f"plane rows {cr} not a multiple of 8")
PDF_FLOOR = 1e-5        # ray.rs:112
EPS = 1e-12
PI = 3.14159265358979

N_DATA = 14             # d(3) p(3) n(3) albedo(3) fuzz ior
N_RNG = 15              # 9 uniforms + 6 normals
LT_COLS = 14            # light row: kind c(3) r q(3) u(3) v(3)


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    n2 = x * x + y * y + z * z
    inv = jax.lax.rsqrt(jnp.maximum(n2, EPS))
    inv = jnp.where(n2 > 0, inv, 0.0)
    return x * inv, y * inv, z * inv


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, EPS)) * (x > 0)


def _onb(wx, wy, wz):
    """Duff et al. branchless ONB (matches linalg.orthonormal_basis)."""
    wx, wy, wz = _normalize(wx, wy, wz)
    sign = jnp.where(wz >= 0.0, 1.0, -1.0)
    den = sign + wz
    a = -1.0 / (den + jnp.where(jnp.abs(den) < 1e-8, 1e-8, 0.0))
    b = wx * wy * a
    ux, uy, uz = 1.0 + sign * wx * wx * a, sign * b, -sign * wx
    vx, vy, vz = b, sign + wy * wy * a, -wy
    return (ux, uy, uz), (vx, vy, vz), (wx, wy, wz)


def _ball(gx, gy, gz, u):
    dx, dy, dz = _normalize(gx, gy, gz)
    # cbrt via exp/log (u in [0,1)); matches jnp.cbrt to fp accuracy
    r = jnp.exp(jnp.log(jnp.maximum(u, 1e-30)) / 3.0)
    return dx * r, dy * r, dz * r



def _plane_core(data, rng, kind, lt, n_lights):
    """Pure plane-level shade math shared by the fwd and bwd kernels.

    Args:
      data: tuple of N_DATA ``[BR,128]`` planes
        (dx,dy,dz, px,py,pz, nx,ny,nz, ax,ay,az, fuzz, ior).
      rng: tuple of N_RNG planes (u0..u4, ul0, ul1, ufr, uir, g0..g5).
      kind: ``[BR,128]`` int32 material ids.
      lt: tuple of n_lights rows, each a tuple of LT_COLS scalars.
      n_lights: static light count.

    Returns 10 planes: emitted(3), weight(3), direction(3), alive(float).
    The sampled directions are ``stop_gradient``-detached exactly as in
    :func:`ops.shade.shade_core` (detached-sampling discipline), so
    ``jax.vjp`` of this function IS the correct estimator gradient.
    """
    dx, dy, dz, px, py, pz, nx, ny, nz, ax, ay, az, fuzz, ior = data
    u0, u1, u2, u3, u4, ul0, ul1, ufr, uir, g0, g1, g2, g3, g4, g5 = rng

    udx, udy, udz = _normalize(dx, dy, dz)

    # ---- Lambertian: cosine sample about n --------------------------
    (bux, buy, buz), (bvx, bvy, bvz), (bwx, bwy, bwz) = _onb(nx, ny, nz)
    z = _safe_sqrt(1.0 - u1)
    phi = 2.0 * PI * u0
    sr = _safe_sqrt(u1)
    lx, ly, lz = jnp.cos(phi) * sr, jnp.sin(phi) * sr, z
    cosx = lx * bux + ly * bvx + lz * bwx
    cosy = lx * buy + ly * bvy + lz * bwy
    cosz = lx * buz + ly * bvz + lz * bwz

    if n_lights:
        # picked light
        li = jnp.minimum((u4 * n_lights).astype(jnp.int32),
                         n_lights - 1)
        ldx = jnp.zeros_like(dx)
        ldy = jnp.zeros_like(dx)
        ldz = jnp.zeros_like(dx)
        for l in range(n_lights):
            kf = lt[l][0]
            cx, cy, cz, r = lt[l][1], lt[l][2], lt[l][3], lt[l][4]
            qx, qy, qz = lt[l][5], lt[l][6], lt[l][7]
            lux, luy, luz = lt[l][8], lt[l][9], lt[l][10]
            lvx, lvy, lvz = lt[l][11], lt[l][12], lt[l][13]
            # sphere: cone sample toward center (sphere.rs:114-119)
            tcx, tcy, tcz = cx - px, cy - py, cz - pz
            dist_sq = _dot(tcx, tcy, tcz, tcx, tcy, tcz)
            cos_max = _safe_sqrt(
                1.0 - r * r / jnp.maximum(dist_sq, EPS))
            zz = 1.0 + ul1 * (cos_max - 1.0)
            ph = 2.0 * PI * ul0
            ss = _safe_sqrt(1.0 - zz * zz)
            sx, sy, szl = jnp.cos(ph) * ss, jnp.sin(ph) * ss, zz
            (cux, cuy, cuz), (cvx, cvy, cvz), (cwx, cwy, cwz) = \
                _onb(tcx, tcy, tcz)
            sphx = sx * cux + sy * cvx + szl * cwx
            sphy = sx * cuy + sy * cvy + szl * cwy
            sphz = sx * cuz + sy * cvz + szl * cwz
            # quad: uniform point (aarect.rs:134-143)
            qdx = qx + ul0 * lux + ul1 * lvx - px
            qdy = qy + ul0 * luy + ul1 * lvy - py
            qdz = qz + ul0 * luz + ul1 * lvz - pz
            is_sph = kf == float(LIGHT_SPHERE)
            is_quad = kf == float(LIGHT_QUAD)
            cand_x = jnp.where(is_sph, sphx,
                               jnp.where(is_quad, qdx, 1.0))
            cand_y = jnp.where(is_sph, sphy,
                               jnp.where(is_quad, qdy, 0.0))
            cand_z = jnp.where(is_sph, sphz,
                               jnp.where(is_quad, qdz, 0.0))
            sel = li == l
            ldx = jnp.where(sel, cand_x, ldx)
            ldy = jnp.where(sel, cand_y, ldy)
            ldz = jnp.where(sel, cand_z, ldz)
        mix = u3 < 0.5
        # detached sampling: the scatter direction is a constant of the
        # estimator (shade_core: lam_dir = stop_gradient(...)); pdf and
        # scattering_pdf below stay attached through n, p and the lights
        sdx = lax.stop_gradient(jnp.where(mix, cosx, ldx))
        sdy = lax.stop_gradient(jnp.where(mix, cosy, ldy))
        sdz = lax.stop_gradient(jnp.where(mix, cosz, ldz))
        # mixture pdf = 0.5 cos_pdf + 0.5 mean_l light_pdf
        ndx, ndy, ndz = _normalize(sdx, sdy, sdz)
        cos_pdf = jnp.maximum(
            _dot(ndx, ndy, ndz, bwx, bwy, bwz) / PI, 0.0)
        pdf_sum = jnp.zeros_like(dx)
        for l in range(n_lights):
            kf = lt[l][0]
            cx, cy, cz, r = lt[l][1], lt[l][2], lt[l][3], lt[l][4]
            qx, qy, qz = lt[l][5], lt[l][6], lt[l][7]
            lux, luy, luz = lt[l][8], lt[l][9], lt[l][10]
            lvx, lvy, lvz = lt[l][11], lt[l][12], lt[l][13]
            # sphere solid-angle pdf (sphere.rs:101-112)
            ocx, ocy, ocz = px - cx, py - cy, pz - cz
            aa = _dot(sdx, sdy, sdz, sdx, sdy, sdz)
            bb = _dot(ocx, ocy, ocz, sdx, sdy, sdz)
            cc = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
            disc = bb * bb - aa * cc
            sq = _safe_sqrt(disc)
            aas = jnp.maximum(aa, EPS)
            r1 = (-bb - sq) / aas
            r2 = (-bb + sq) / aas
            hits_s = (disc > 0.0) & ((r1 >= 1e-4) | (r2 >= 1e-4))
            dist_sq = _dot(cx - px, cy - py, cz - pz,
                           cx - px, cy - py, cz - pz)
            cos_max = _safe_sqrt(
                1.0 - r * r / jnp.maximum(dist_sq, EPS))
            solid = 2.0 * PI * (1.0 - cos_max)
            pdf_s = jnp.where(hits_s,
                              1.0 / jnp.maximum(solid, EPS), 0.0)
            # quad area pdf (aarect.rs:123-132)
            wnx = luy * lvz - luz * lvy
            wny = luz * lvx - lux * lvz
            wnz = lux * lvy - luy * lvx
            n2 = wnx * wnx + wny * wny + wnz * wnz
            denom = _dot(sdx, sdy, sdz, wnx, wny, wnz)
            dsafe = jnp.where(jnp.abs(denom) < EPS,
                              jnp.where(denom < 0, -EPS, EPS), denom)
            tq = _dot(qx - px, qy - py, qz - pz, wnx, wny, wnz) / dsafe
            wx_ = px + tq * sdx - qx
            wy_ = py + tq * sdy - qy
            wz_ = pz + tq * sdz - qz
            inv_n2 = 1.0 / jnp.maximum(n2, EPS)
            al = _dot(wy_ * lvz - wz_ * lvy, wz_ * lvx - wx_ * lvz,
                      wx_ * lvy - wy_ * lvx, wnx, wny, wnz) * inv_n2
            be = _dot(luy * wz_ - luz * wy_, luz * wx_ - lux * wz_,
                      lux * wy_ - luy * wx_, wnx, wny, wnz) * inv_n2
            hits_q = ((tq >= 1e-3) & jnp.isfinite(tq)
                      & (al >= 0.0) & (al <= 1.0)
                      & (be >= 0.0) & (be <= 1.0))
            area = _safe_sqrt(n2)
            dlen2 = jnp.maximum(aa, EPS)
            distq = tq * tq * dlen2
            # guard BOTH divisions: a null quad row (n2 == 0 — e.g. a
            # sphere light's zeroed q/u/v) would otherwise make the
            # untaken branch 0/0 = NaN, which the where() masks in the
            # primal but which poisons the adjoint (NaN * 0 = NaN)
            cosq = jnp.abs(denom) / jnp.maximum(_safe_sqrt(n2), EPS) \
                / jnp.maximum(_safe_sqrt(dlen2), 1e-20)
            pdf_q = jnp.where(
                hits_q, distq / jnp.maximum(cosq * area, EPS), 0.0)
            kf_pdf = jnp.where(kf == float(LIGHT_SPHERE), pdf_s,
                               jnp.where(kf == float(LIGHT_QUAD),
                                         pdf_q, 0.0))
            pdf_sum = pdf_sum + kf_pdf
        pdf = 0.5 * cos_pdf + 0.5 * pdf_sum / n_lights
        lamx, lamy, lamz = sdx, sdy, sdz
    else:
        lamx = lax.stop_gradient(cosx)
        lamy = lax.stop_gradient(cosy)
        lamz = lax.stop_gradient(cosz)
        ndx, ndy, ndz = _normalize(lamx, lamy, lamz)
        pdf = jnp.maximum(_dot(ndx, ndy, ndz, bwx, bwy, bwz) / PI, 0.0)

    pdf = jnp.where(pdf > PDF_FLOOR, pdf, PDF_FLOOR)
    nlx, nly, nlz = _normalize(lamx, lamy, lamz)
    spdf = jnp.maximum(_dot(nx, ny, nz, nlx, nly, nlz) / PI, 0.0)
    lam_w = spdf / pdf

    # ---- Metal ------------------------------------------------------
    dn2 = 2.0 * _dot(udx, udy, udz, nx, ny, nz)
    rx, ry, rz = udx - dn2 * nx, udy - dn2 * ny, udz - dn2 * nz
    fbx, fby, fbz = _ball(g0, g1, g2, ufr)   # randoms only: detached
    fbx, fby, fbz = map(lax.stop_gradient, (fbx, fby, fbz))
    mx, my, mz = rx + fuzz * fbx, ry + fuzz * fby, rz + fuzz * fbz
    metal_ok = _dot(mx, my, mz, nx, ny, nz) > 0.0

    # ---- Dielectric -------------------------------------------------
    d_dot_n = _dot(dx, dy, dz, nx, ny, nz)
    exiting = d_dot_n > 0.0
    ratio = jnp.where(exiting, ior, 1.0 / ior)
    nox = jnp.where(exiting, -nx, nx)
    noy = jnp.where(exiting, -ny, ny)
    noz = jnp.where(exiting, -nz, nz)
    cos_t = jnp.minimum(-_dot(udx, udy, udz, nox, noy, noz), 1.0)
    sin_t = _safe_sqrt(1.0 - cos_t * cos_t)
    tir = ratio * sin_t > 1.0
    pox = ratio * (udx + cos_t * nox)
    poy = ratio * (udy + cos_t * noy)
    poz = ratio * (udz + cos_t * noz)
    kk = jnp.abs(1.0 - (pox * pox + poy * poy + poz * poz))
    sk = _safe_sqrt(kk)
    refx, refy, refz = pox - sk * nox, poy - sk * noy, poz - sk * noz
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    one_m = 1.0 - cos_t
    om2 = one_m * one_m
    schl = r0 + (1.0 - r0) * om2 * om2 * one_m
    do_refl = tir | (schl >= u2)
    dieux = jnp.where(do_refl, rx, refx)
    dieuy = jnp.where(do_refl, ry, refy)
    dieuz = jnp.where(do_refl, rz, refz)

    # ---- DiffuseLight / Isotropic ----------------------------------
    front = d_dot_n < 0.0
    ibx, iby, ibz = _ball(g3, g4, g5, uir)
    ibx, iby, ibz = map(lax.stop_gradient, (ibx, iby, ibz))

    # ---- select -----------------------------------------------------
    is_lam = kind == MAT_LAMBERTIAN
    is_met = kind == MAT_METAL
    is_die = kind == MAT_DIELECTRIC
    is_iso = kind == MAT_ISOTROPIC
    is_lig = kind == MAT_LIGHT

    def sel3(lamv, metv, diev, isov, default):
        return jnp.where(is_lam, lamv,
                         jnp.where(is_met, metv,
                                   jnp.where(is_die, diev,
                                             jnp.where(is_iso, isov,
                                                       default))))

    one = jnp.ones_like(dx)
    zero = jnp.zeros_like(dx)
    em = (jnp.where(is_lig & front, ax, zero),
          jnp.where(is_lig & front, ay, zero),
          jnp.where(is_lig & front, az, zero))
    wt = (sel3(ax * lam_w, ax, one, ax, zero),
          sel3(ay * lam_w, ay, one, ay, zero),
          sel3(az * lam_w, az, one, az, zero))
    # default (1,1,1) matches shade_core's one3 fallback exactly
    dr = (sel3(lamx, mx, dieux, ibx, one),
          sel3(lamy, my, dieuy, iby, one),
          sel3(lamz, mz, dieuz, ibz, one))
    # alive as float select (Mosaic rejects bool->f32 truncation)
    alive_f = jnp.where(is_met,
                        jnp.where(metal_ok, one, zero),
                        jnp.where(is_lig, zero, one))
    return em + wt + dr + (alive_f,)


def _read_lt(lt_ref, n_lights):
    return tuple(tuple(lt_ref[l, j] for j in range(LT_COLS))
                 for l in range(n_lights))


def _make_kernel(n_lights: int):
    def kernel(planes_ref, kind_ref, lt_ref, out_ref):
        P = planes_ref[:]                        # [N_DATA+N_RNG, BR, 128]
        data = tuple(P[i] for i in range(N_DATA))
        rng = tuple(P[N_DATA + i] for i in range(N_RNG))
        kind = kind_ref[:]                       # [BR, 128] int32

        outs = _plane_core(data, rng, kind, _read_lt(lt_ref, n_lights),
                           n_lights)
        for i, v in enumerate(outs):
            out_ref[i] = v

    return kernel


def _make_bwd_kernel(n_lights: int):
    """Fused plane-layout backward: jax.vjp of _plane_core, traced INSIDE
    the kernel, so primal recompute + all transposes compile to one
    Mosaic kernel with VMEM-resident residuals. Outputs: the N_DATA data
    plane cotangents and (first row of) a [8,128] plane holding the
    per-tile light-table gradient sums at lanes l*LT_COLS+j."""
    def kernel(planes_ref, kind_ref, lt_ref, g_ref, dpl_ref, dlt_ref):
        P = planes_ref[:]                        # [N_DATA+N_RNG, BR, 128]
        kind = kind_ref[:]
        g = g_ref[:]                             # [9, BR, 128]
        rng = tuple(lax.stop_gradient(P[N_DATA + i]) for i in range(N_RNG))
        lt = _read_lt(lt_ref, n_lights)

        def core(data, lt_):
            outs = _plane_core(data, rng, kind, lt_, n_lights)
            return jnp.stack(outs[:9])           # alive has no cotangent

        data = tuple(P[i] for i in range(N_DATA))
        _, vjp = jax.vjp(core, data, lt)
        d_data, d_lt = vjp(g)
        for i in range(N_DATA):
            dpl_ref[i] = d_data[i]

        acc = jnp.zeros((8, LANES), jnp.float32)
        if n_lights:
            row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            for l in range(n_lights):
                for j in range(LT_COLS):
                    s = d_lt[l][j]               # scalar (summed by vjp)
                    acc = acc + jnp.where(
                        (row == 0) & (col == l * LT_COLS + j), s, 0.0)
        dlt_ref[0] = acc

    return kernel


def _plane(x, pad, cp):
    return jnp.pad(x, (0, pad)).reshape(cp // LANES, LANES)


def _light_table(scene):
    # the backward kernel packs per-light gradient sums into lanes
    # l*LT_COLS+j of one 128-lane accumulator row (_make_bwd_kernel);
    # more lights than fit would silently drop gradients
    assert scene.n_lights * LT_COLS <= LANES, (
        f"pallas shade kernel supports at most {LANES // LT_COLS} sampled "
        f"lights (got {scene.n_lights}); use RRT_NO_PALLAS_SHADE=1 or "
        "widen the d_lt accumulator to more rows")
    if scene.n_lights:
        return jnp.concatenate(
            [scene.light_kind.astype(jnp.float32)[:, None],
             scene.light_c, scene.light_r[:, None],
             scene.light_q, scene.light_u, scene.light_v], axis=1)
    return jnp.zeros((1, LT_COLS), jnp.float32)


def _shade_pallas(scene, d_in, p, normal, albedo, kind, fuzz, ior,
                  ub, gb):
    """Run the forward kernel on XLA-drawn randoms. Returns a Scatter."""
    c = d_in.shape[0]
    L = scene.n_lights
    pad = (-c) % (8 * LANES)
    cp = c + pad

    feats = ([d_in[:, i] for i in range(3)]
             + [p[:, i] for i in range(3)]
             + [normal[:, i] for i in range(3)]
             + [albedo[:, i] for i in range(3)]
             + [fuzz, ior]
             + [ub[:, i] for i in range(9)]
             + [gb[:, i] for i in range(6)])
    planes = jnp.stack([_plane(x, pad, cp) for x in feats])
    kind_p = _plane(kind.astype(jnp.int32), pad, cp)

    lt = _light_table(scene)
    cr = cp // LANES
    br = _pick_br(cr)
    grid = (cr // br,)
    out = pl.pallas_call(
        _make_kernel(L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_DATA + N_RNG, br, LANES),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((10, br, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, cr, LANES), jnp.float32),
        interpret=_pi.INTERPRET,
    )(planes, kind_p, lt)

    flat = out.reshape(10, cp)[:, :c]
    return Scatter(
        emitted=flat[0:3].T, weight=flat[3:6].T,
        direction=flat[6:9].T, alive=flat[9] > 0.5)


def _shade_bwd_pallas(scene, d_in, p, normal, albedo, kind, fuzz, ior,
                      ub, gb, g: Scatter):
    """Fused backward. Returns (d_d_in, d_p, d_normal, d_albedo, d_fuzz,
    d_ior, d_lt [L, LT_COLS])."""
    c = d_in.shape[0]
    L = scene.n_lights
    pad = (-c) % (8 * LANES)
    cp = c + pad

    feats = ([d_in[:, i] for i in range(3)]
             + [p[:, i] for i in range(3)]
             + [normal[:, i] for i in range(3)]
             + [albedo[:, i] for i in range(3)]
             + [fuzz, ior]
             + [ub[:, i] for i in range(9)]
             + [gb[:, i] for i in range(6)])
    planes = jnp.stack([_plane(x, pad, cp) for x in feats])
    kind_p = _plane(kind.astype(jnp.int32), pad, cp)
    gplanes = jnp.stack(
        [_plane(x[:, i], pad, cp) for x in (g.emitted, g.weight,
                                            g.direction) for i in range(3)])
    lt = _light_table(scene)

    cr = cp // LANES
    br = _pick_br(cr)
    grid = (cr // br,)
    dpl, dlt = pl.pallas_call(
        _make_bwd_kernel(L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_DATA + N_RNG, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((9, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_DATA, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_DATA, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 8, LANES), jnp.float32),
        ],
        interpret=_pi.INTERPRET,
    )(planes, kind_p, lt, gplanes)

    flat = dpl.reshape(N_DATA, cp)[:, :c]
    d_d_in, d_p = flat[0:3].T, flat[3:6].T
    d_normal, d_albedo = flat[6:9].T, flat[9:12].T
    d_fuzz, d_ior = flat[12], flat[13]
    d_lt = dlt[:, 0, :L * LT_COLS].sum(0).reshape(L, LT_COLS) if L \
        else None
    return d_d_in, d_p, d_normal, d_albedo, d_fuzz, d_ior, d_lt


def _scene_cotangent(scene, d_lt):
    """SceneData cotangent from light-table gradients: float0 for
    integer leaves, zeros for float leaves, light_c/r/q/u/v filled."""
    _, vjp = jax.vjp(lambda s: jnp.concatenate(
        [s.light_c, s.light_r[:, None], s.light_q, s.light_u, s.light_v],
        axis=1), scene)
    cols = d_lt[:, 1:] if d_lt is not None else jnp.zeros(
        (scene.n_lights, LT_COLS - 1), jnp.float32)
    (scene_ct,) = vjp(cols)
    return scene_ct


@jax.custom_vjp
def shade_fused(scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb):
    return _shade_pallas(scene, d_in, p, normal, albedo, kind, fuzz, ior,
                         ub, gb)


def _fwd(scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb):
    out = _shade_pallas(scene, d_in, p, normal, albedo, kind, fuzz, ior,
                        ub, gb)
    # residuals are exactly the inputs: under a named-save remat policy
    # the backward never re-runs the forward kernel (ops/integrator.py)
    return out, (scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb)


def _bwd(res, g):
    # one fused plane-layout kernel: vjp of the identical plane core the
    # forward ran, around the identical sampled path (same random
    # blocks). ub/gb cotangents are never formed (detached sampling).
    scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb = res
    dd, dp, dn, da, df, di, d_lt = _shade_bwd_pallas(
        scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb, g)
    scene_ct = _scene_cotangent(scene, d_lt)
    kind_ct = np.zeros(jnp.shape(kind), jax.dtypes.float0)
    return (scene_ct, dd, dp, dn, da, kind_ct, df, di,
            jnp.zeros_like(ub), jnp.zeros_like(gb))


shade_fused.defvjp(_fwd, _bwd)
