"""Pallas TPU kernel: fused material shading (the whole shade_core).

One kernel evaluates all five materials + the light-mixture sampling for
a tile of rays, replacing ~40 XLA ops whose fusion boundaries round-trip
[C,3] intermediates through HBM (~38% of forward wave time measured by
ablation).

**Layout.** Scalars-as-planes: every per-ray quantity is a ``[Cr, 128]``
f32 plane (rays along lanes, full VPU utilization) and the kernel input
is the stack ``[F, BR, 128]``. A ``[C, 3]`` vector is three planes. The
tiny light table rides in SMEM and is looped over statically.

**RNG.** The bounce's random budget (9 uniforms + 6 normals per ray) is
generated INSIDE the kernel with the hardware PRNG (mantissa-bitcast
uniforms, Box–Muller normals), seeded by the bounce key + tile id — no
threefry sweeps on the hot path, still deterministic under any device or
chunk assignment. The kernel exports the randoms it consumed as a second
output.

**Gradients.** ``shade_fused`` is a ``jax.custom_vjp``: the primal runs
this kernel; the backward runs ``jax.vjp`` of the pure-XLA
:func:`ops.shade.shade_core` fed the EXPORTED randoms, so the
linearization is taken around the identical sampled path. The
detached-sampling discipline lives in shade_core's stop_gradients and is
therefore inherited.

Semantics: mirror of shade_core (material/mod.rs parity notes there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.models.scene import (
    LIGHT_QUAD, LIGHT_SPHERE, MAT_DIELECTRIC, MAT_ISOTROPIC,
    MAT_LAMBERTIAN, MAT_LIGHT, MAT_METAL)
from rust_ray_tracer_tpu.ops import pallas_intersect as _pi
from rust_ray_tracer_tpu.ops.shade import Scatter, shade_core

LANES = 128
BR = 32                 # plane rows per grid step (rays/step = BR*128)
PDF_FLOOR = 1e-5        # ray.rs:112
EPS = 1e-12
PI = 3.14159265358979


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


def _bits_to_unit(bits):
    """uint32 -> f32 in [0, 1) via mantissa bitcast (no int->float op)."""
    f = pltpu.bitcast(
        jnp.uint32(0x3F800000) | (bits >> jnp.uint32(9)), jnp.float32)
    return f - 1.0


def _make_kernel(n_lights: int, in_kernel_rng: bool):
    def kernel(planes_ref, kind_ref, lt_ref, seed_ref, out_ref, rng_ref):
        P = planes_ref[:]                        # [F, BR, 128]

        def f(i):
            return P[i]

        dx, dy, dz = f(0), f(1), f(2)
        px, py, pz = f(3), f(4), f(5)
        nx, ny, nz = f(6), f(7), f(8)
        ax, ay, az = f(9), f(10), f(11)
        fuzz, ior = f(12), f(13)
        kind = kind_ref[:]                       # [BR, 128] int32

        if in_kernel_rng:
            # per-(chunk-key, tile) deterministic seed: same chunk on any
            # device/loop assignment -> same randoms (utils/rng.py rules)
            # Mosaic allows at most 2 seed values: mix the tile id into
            # the second word (int32 mul wraps; deterministic)
            pltpu.prng_seed(
                seed_ref[0, 0],
                seed_ref[0, 1] + pl.program_id(0) * jnp.int32(-1640531527))
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((15,) + dx.shape), jnp.uint32)
            U = [_bits_to_unit(bits[i]) for i in range(15)]
            u0, u1, u2, u3, u4, ul0, ul1, ufr, uir = U[:9]
            # Box-Muller: 6 normals from 6 uniforms
            gs = []
            for k in range(3):
                r = jnp.sqrt(-2.0 * jnp.log(
                    jnp.maximum(U[9 + 2 * k], 1e-12)))
                th = 2.0 * PI * U[10 + 2 * k]
                gs += [r * jnp.cos(th), r * jnp.sin(th)]
            g0, g1, g2, g3, g4, g5 = gs
            # export the consumed randoms so the custom-VJP backward can
            # replay the identical sampled path through the XLA core
            for i, v in enumerate((u0, u1, u2, u3, u4, ul0, ul1, ufr,
                                   uir, g0, g1, g2, g3, g4, g5)):
                rng_ref[i] = v
        else:
            u0, u1, u2, u3, u4 = f(14), f(15), f(16), f(17), f(18)
            ul0, ul1, ufr, uir = f(19), f(20), f(21), f(22)
            g0, g1, g2 = f(23), f(24), f(25)
            g3, g4, g5 = f(26), f(27), f(28)
            for i in range(15):
                rng_ref[i] = f(14 + i)

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
                kf = lt_ref[l, 0]
                cx, cy, cz, r = (lt_ref[l, 1], lt_ref[l, 2], lt_ref[l, 3],
                                 lt_ref[l, 4])
                qx, qy, qz = lt_ref[l, 5], lt_ref[l, 6], lt_ref[l, 7]
                lux, luy, luz = lt_ref[l, 8], lt_ref[l, 9], lt_ref[l, 10]
                lvx, lvy, lvz = lt_ref[l, 11], lt_ref[l, 12], lt_ref[l, 13]
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
            sdx = jnp.where(mix, cosx, ldx)
            sdy = jnp.where(mix, cosy, ldy)
            sdz = jnp.where(mix, cosz, ldz)
            # mixture pdf = 0.5 cos_pdf + 0.5 mean_l light_pdf
            ndx, ndy, ndz = _normalize(sdx, sdy, sdz)
            cos_pdf = jnp.maximum(
                _dot(ndx, ndy, ndz, bwx, bwy, bwz) / PI, 0.0)
            pdf_sum = jnp.zeros_like(dx)
            for l in range(n_lights):
                kf = lt_ref[l, 0]
                cx, cy, cz, r = (lt_ref[l, 1], lt_ref[l, 2], lt_ref[l, 3],
                                 lt_ref[l, 4])
                qx, qy, qz = lt_ref[l, 5], lt_ref[l, 6], lt_ref[l, 7]
                lux, luy, luz = lt_ref[l, 8], lt_ref[l, 9], lt_ref[l, 10]
                lvx, lvy, lvz = lt_ref[l, 11], lt_ref[l, 12], lt_ref[l, 13]
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
                cosq = jnp.abs(denom / _safe_sqrt(n2)) \
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
            lamx, lamy, lamz = cosx, cosy, cosz
            ndx, ndy, ndz = _normalize(lamx, lamy, lamz)
            pdf = jnp.maximum(_dot(ndx, ndy, ndz, bwx, bwy, bwz) / PI, 0.0)

        pdf = jnp.where(pdf > PDF_FLOOR, pdf, PDF_FLOOR)
        nlx, nly, nlz = _normalize(lamx, lamy, lamz)
        spdf = jnp.maximum(_dot(nx, ny, nz, nlx, nly, nlz) / PI, 0.0)
        lam_w = spdf / pdf

        # ---- Metal ------------------------------------------------------
        dn2 = 2.0 * _dot(udx, udy, udz, nx, ny, nz)
        rx, ry, rz = udx - dn2 * nx, udy - dn2 * ny, udz - dn2 * nz
        fbx, fby, fbz = _ball(g0, g1, g2, ufr)
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
        out_ref[0] = jnp.where(is_lig & front, ax, zero)    # emitted
        out_ref[1] = jnp.where(is_lig & front, ay, zero)
        out_ref[2] = jnp.where(is_lig & front, az, zero)
        out_ref[3] = sel3(ax * lam_w, ax, one, ax, zero)    # weight
        out_ref[4] = sel3(ay * lam_w, ay, one, ay, zero)
        out_ref[5] = sel3(az * lam_w, az, one, az, zero)
        # default (1,1,1) matches shade_core's one3 fallback exactly
        out_ref[6] = sel3(lamx, mx, dieux, ibx, one)        # direction
        out_ref[7] = sel3(lamy, my, dieuy, iby, one)
        out_ref[8] = sel3(lamz, mz, dieuz, ibz, one)
        # alive as float select (Mosaic rejects bool->f32 truncation)
        out_ref[9] = jnp.where(is_met,
                               jnp.where(metal_ok, one, zero),
                               jnp.where(is_lig, zero, one))

    return kernel


def _shade_pallas(scene, d_in, p, normal, albedo, kind, fuzz, ior,
                  key=None, ub=None, gb=None):
    """Run the kernel. Returns (Scatter, ub, gb) where ub/gb are the
    randoms actually consumed — generated in-kernel from ``key`` when
    given (fast path), else echoed from the supplied blocks (interpret /
    validation path)."""
    c = d_in.shape[0]
    L = scene.n_lights
    in_rng = key is not None
    if in_rng and _pi.INTERPRET:
        # interpret mode has no pltpu.prng lowering on CPU: draw the
        # randoms on the host and use the echo path (the custom VJP is
        # agnostic — it replays whatever randoms come back)
        ub = jax.random.uniform(key, (c, 9), dtype=jnp.float32)
        gb = jax.random.normal(jax.random.fold_in(key, 1), (c, 6),
                               dtype=jnp.float32)
        in_rng = False
        key = None
    pad = (-c) % (BR * LANES)
    cp = c + pad

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(cp // LANES, LANES)

    feats = ([d_in[:, i] for i in range(3)]
             + [p[:, i] for i in range(3)]
             + [normal[:, i] for i in range(3)]
             + [albedo[:, i] for i in range(3)]
             + [fuzz, ior])
    if not in_rng:
        feats += [ub[:, i] for i in range(9)]
        feats += [gb[:, i] for i in range(6)]
    planes = jnp.stack([plane(x) for x in feats])   # [14 or 29, Cr, 128]
    kind_p = plane(kind.astype(jnp.int32))

    if L:
        lt = jnp.concatenate(
            [scene.light_kind.astype(jnp.float32)[:, None],
             scene.light_c, scene.light_r[:, None],
             scene.light_q, scene.light_u, scene.light_v], axis=1)
    else:
        lt = jnp.zeros((1, 14), jnp.float32)
    if in_rng:
        seed = lax.bitcast_convert_type(
            jnp.asarray(key, jnp.uint32), jnp.int32).reshape(1, -1)
    else:
        seed = jnp.zeros((1, 2), jnp.int32)

    nf = planes.shape[0]
    cr = cp // LANES
    grid = (cr // BR,)
    out, rng_out = pl.pallas_call(
        _make_kernel(L, in_rng),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nf, BR, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(seed.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((10, BR, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((15, BR, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((10, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((15, cr, LANES), jnp.float32),
        ],
        interpret=_pi.INTERPRET,
    )(planes, kind_p, lt, seed)

    flat = out.reshape(10, cp)[:, :c]
    rflat = rng_out.reshape(15, cp)[:, :c]
    sc = Scatter(
        emitted=flat[0:3].T, weight=flat[3:6].T,
        direction=flat[6:9].T, alive=flat[9] > 0.5)
    return sc, rflat[0:9].T, rflat[9:15].T


@jax.custom_vjp
def shade_fused(scene, d_in, p, normal, albedo, kind, fuzz, ior, key):
    return _shade_pallas(scene, d_in, p, normal, albedo, kind, fuzz, ior,
                         key=key)[0]


def _fwd(scene, d_in, p, normal, albedo, kind, fuzz, ior, key):
    out, ub, gb = _shade_pallas(scene, d_in, p, normal, albedo, kind,
                                fuzz, ior, key=key)
    return out, (scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb,
                 key)


def _bwd(res, g):
    scene, d_in, p, normal, albedo, kind, fuzz, ior, ub, gb, key = res
    # the XLA core is the differentiable reference; the kernel exported
    # the randoms it consumed, so the linearization is taken around the
    # identical sampled path. ub/gb cotangents are discarded (detached
    # sampling: randoms are constants of the estimator).
    _, vjp = jax.vjp(shade_core, scene, d_in, p, normal, albedo, kind,
                     fuzz, ior, ub, gb)
    grads = vjp(g)
    import numpy as _np
    key_ct = _np.zeros(jnp.shape(key), jax.dtypes.float0)
    return grads[:8] + (key_ct,)


shade_fused.defvjp(_fwd, _bwd)
