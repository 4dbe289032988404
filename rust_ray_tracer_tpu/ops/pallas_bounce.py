"""Pallas TPU megakernel: ONE fused kernel per wavefront bounce.

Round-2 tracing showed suzanne's wave time is *depth-independent* and has
no hot op — the cost is per-bounce machinery: the XLA fusion islands and
plane pack/unpack between the hit-attrs kernel, the shade kernel and the
estimator state update (each a [C,3]<->plane transpose + HBM round
trip). This module collapses phase 2 + shading + the whole state update
(``ray.rs:85-126`` estimator: miss/background add, emission add,
throughput multiply, scatter, kill) into a single plane-layout Pallas
kernel, so one bounce on the device is:

    phase-1 search kernel -> XLA gathers/threefry -> THIS kernel

The backward is a second kernel that takes ``jax.vjp`` of the SAME
composed plane core (hit-attrs core + shade core + update) at trace
time — the entire per-ray adjoint of a bounce runs fused in VMEM.

Eligibility (static, per compiled scene): every texture leaf is a solid
color (albedo is then a pure ``tex_color`` gather, done in XLA *before*
the kernel so its scatter-add transpose stays with XLA); checker-of-
solids is evaluated in-kernel (sin-product select at the freshly
computed hit point). Noise/image textures keep the split pipeline. The
light table + background row must fit the backward gradient accumulator
(``(n_lights+1) * LT_COLS <= 128``). suzanne, the Cornell scenes, the
glTF imports and ``random`` all qualify; ``final_scene``/composite
(noise/image) fall back to the split kernels.

Semantics: bitwise-identical sampled paths to the split path (same
threefry streams, same detached-sampling discipline); the state update
mirrors ops/integrator._bounce line for line.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.ad_checkpoint import checkpoint_name

from rust_ray_tracer_tpu.ops import pallas_intersect as _pi
from rust_ray_tracer_tpu.ops.pallas_hit import N_IN as N_HIT
from rust_ray_tracer_tpu.ops.pallas_hit import _hit_plane_core
from rust_ray_tracer_tpu.ops.pallas_shade import (
    LANES, LT_COLS, _light_table, _plane_core)
from rust_ray_tracer_tpu.utils import rng as rngu

# input plane indices (rows of the [N_IN_B, BR, 128] stack)
#   0..18  : pallas_hit layout (o3 d3 time tmin tmax pack9 tmed — the
#            winner's pack is unified across primitive kinds, see
#            pallas_hit.N_IN; round 4 collapsed the three 9-plane
#            sections into one)
#   19..21 : albedo (solid leaf / checker base)
#   22, 23 : fuzz, ior
#   24..26 : L (radiance accum)    27..29 : beta (throughput)
#   30..38 : ub (9 uniforms)       39..44 : gb (6 normals)
#   45     : alive (0/1 float)
#   46..51 : checker even / odd leaf colors (only when the scene has
#            checker textures — N_IN_B grows by 6; the sin-product
#            select runs in-kernel on the freshly computed hit p)
N_IN_B = 46
N_CHK = 6
N_OUT_B = 13   # o'(3) d'(3) L'(3) beta'(3) alive'


def _pick_br(cr: int) -> int:
    """Largest row-block in {32, 16, 8} dividing the plane row count.

    BR=32 forces 4096-lane granularity — at the tuned chunk 9216 that
    pads 33% dead lanes into every kernel; rows=72 divides by 8, so the
    adaptive pick makes the pad zero (host packers pad to 8*LANES).
    """
    for br in (32, 16, 8):
        if cr % br == 0:
            return br
    raise ValueError(f"plane rows {cr} not a multiple of 8")


def _read_lt(lt_ref, rows):
    return tuple(tuple(lt_ref[r, j] for j in range(LT_COLS))
                 for r in range(rows))


# ---------------------------------------------------------------------------
# in-kernel marble noise (texture.rs:74-82 / perlin.rs:58-105)
# ---------------------------------------------------------------------------
#
# The 256-entry perlin tables live in VMEM as ONE [8, 256] plane
# (rows 0-2 = gradient-vector x/y/z transposed; rows 4-6 = the three
# permutation tables as exact-integer f32). Per-lane table lookups have
# no Mosaic gather, so each lookup is a one-hot MXU contraction — the
# same trick as the uber winner-row fetch (pallas_uber._dot_onehot):
# build [256, 128] masks from an integer-valued f32 index row and
# contract the table against them. Permutation lookups ride DEFAULT
# (single-pass bf16 — integers <= 255 are exact in bf16); gradient
# lookups ride HIGHEST (6-pass reconstructs the f32 exactly for a
# one-hot weighting).
#
# Gradients: the vjp of this code (the bounce backward kernels trace
# jax.vjp over the whole plane core) flows through the Hermite weights
# and the grad·(uvw-corner) dot into the hit point — i.e. d(albedo)/dp
# reaches geometry parameters exactly as the XLA texture_value path.
# The table VALUES are deliberately detached (they enter as a closed-
# over kernel ref, not a vjp argument): the reference's tables are
# unseeded thread_rng noise (perlin.rs:14-30) — a fixed procedural
# basis, not a learnable parameter. PARITY.md documents the delta vs
# the XLA path (which, being plain jnp, happens to expose d perlin_vec).

_PN = 256   # perlin.rs:6


def _p_lookup(tab_rows, idx_f, precision):
    """tab_rows [R, 256] contracted with the one-hot of idx_f [1, 128]
    (integer-valued f32) -> [R, 128]."""
    from jax import lax

    iif = lax.broadcasted_iota(jnp.int32, (_PN, 128), 0).astype(
        jnp.float32)
    m = (iif == idx_f).astype(jnp.float32)            # [256, 128]
    return lax.dot_general(tab_rows, m, (((1,), (0,)), ((), ())),
                           precision=precision,
                           preferred_element_type=jnp.float32)


def _noise_row(ptab, x, y, z):
    """Gradient noise for one 128-lane row (perlin.rs:86-105); x/y/z
    [1, 128]. Mirrors ops/perlin.noise lane for lane."""
    from jax import lax

    fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    ux, uy, uz = x - fx, y - fy, z - fz
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    # Hermite smoothing (perlin.rs:87-89)
    sx = ux * ux * (3.0 - 2.0 * ux)
    sy = uy * uy * (3.0 - 2.0 * uy)
    sz = uz * uz * (3.0 - 2.0 * uz)

    def perm(row, ii):
        idx = jnp.bitwise_and(ii, _PN - 1).astype(jnp.float32)
        return _p_lookup(ptab[row:row + 1, :], idx,
                         lax.Precision.DEFAULT)[0:1].astype(jnp.int32)

    hx = [perm(4, ix), perm(4, ix + 1)]
    hy = [perm(5, iy), perm(5, iy + 1)]
    hz = [perm(6, iz), perm(6, iz + 1)]

    acc = jnp.zeros_like(x)
    for di in range(2):
        wi = sx if di else (1.0 - sx)
        for dj in range(2):
            wj = sy if dj else (1.0 - sy)
            for dk in range(2):
                wk = sz if dk else (1.0 - sz)
                h = jnp.bitwise_xor(jnp.bitwise_xor(hx[di], hy[dj]),
                                    hz[dk]).astype(jnp.float32)
                g = _p_lookup(ptab[0:3, :], h,
                              lax.Precision.HIGHEST)   # [3, 128]
                dot = (g[0:1] * (ux - di) + g[1:2] * (uy - dj)
                       + g[2:3] * (uz - dk))
                acc = acc + (wi * wj * wk) * dot
    return acc


def _marble_row(ptab, px, py, pz, scale):
    """0.5 * (1 + sin(scale*z + 10*turb(p, 7))) for one row
    (texture.rs:74-82; turb: perlin.rs:58-71)."""
    acc = jnp.zeros_like(px)
    w = 1.0
    for i in range(7):
        s = float(2.0 ** i)
        acc = acc + w * _noise_row(ptab, px * s, py * s, pz * s)
        w *= 0.5
    return 0.5 * (1.0 + jnp.sin(scale * pz + 10.0 * jnp.abs(acc)))


def _bounce_plane_core(P, pkind, mkind, flags, lt, n_lights,
                       has_checker=False, has_noise=False, ptab=None):
    """hit-attrs + shade + estimator update for one plane tile.

    Args:
      P: [N_IN_B(+N_CHK)(+1), BR, 128] float planes (layout above; the
        trailing plane, present when has_noise, is the winner's noise
        frequency scale).
      pkind: [BR,128] int32 primitive kind (intersect.KIND_*; NONE=miss).
      mkind: [BR,128] int32 material kind (scene MAT_*).
      flags: [BR,128] int32 — bit 0 FlipFace, bit 1 checker texture,
        bit 2 marble-noise texture.
      lt: tuple of n_lights+1 rows of LT_COLS scalars — light table plus
        a trailing background row (cols 0..2 = background RGB).
      n_lights: static light count.
      has_checker: static — evaluate the checker select in-kernel.
      has_noise: static — evaluate marble noise in-kernel (needs ptab,
        the [8, 256] perlin table plane; see the section comment above).

    Returns [N_OUT_B, BR, 128]. Detached sampling lives inside
    _plane_core; the winning-primitive recompute (_hit_plane_core) is
    differentiable — jax.vjp of this function is the bounce adjoint.
    """
    from rust_ray_tracer_tpu.ops.intersect import KIND_NONE

    hit_out = _hit_plane_core(P[:N_HIT], pkind, flags & 1)
    px, py, pz = hit_out[1], hit_out[2], hit_out[3]
    nx, ny, nz = hit_out[4], hit_out[5], hit_out[6]

    ax, ay, az = P[19], P[20], P[21]
    if has_checker:
        # checker (texture.rs:50-57): sin-product sign selects between
        # the two solid leaves, at the in-kernel hit point. The select
        # condition carries no gradient (same as the XLA texture_value).
        sines = (jnp.sin(10.0 * px) * jnp.sin(10.0 * py)
                 * jnp.sin(10.0 * pz))
        is_chk = (flags & 2) > 0
        odd = sines < 0.0
        ax = jnp.where(is_chk, jnp.where(odd, P[49], P[46]), ax)
        ay = jnp.where(is_chk, jnp.where(odd, P[50], P[47]), ay)
        az = jnp.where(is_chk, jnp.where(odd, P[51], P[48]), az)
    if has_noise:
        # marble noise at the in-kernel hit point. Miss lanes can carry
        # the default row's noise flag (material 0 may BE the noise
        # ground) with a garbage hit point, so gate by pkind and feed
        # the eval p=0 on non-noise lanes — keeps NaN out of the
        # forward AND the 0-cotangent backward products.
        is_nz = ((flags & 4) > 0) & (pkind != KIND_NONE)
        scale = P[N_IN_B + (N_CHK if has_checker else 0)]
        zero_ = jnp.zeros_like(px)
        gx = jnp.where(is_nz, px, zero_)
        gy = jnp.where(is_nz, py, zero_)
        gz = jnp.where(is_nz, pz, zero_)
        rows = []
        for r in range(px.shape[0]):
            rows.append(_marble_row(ptab, gx[r:r + 1], gy[r:r + 1],
                                    gz[r:r + 1], scale[r:r + 1]))
        marble = jnp.concatenate(rows, axis=0)        # [BR, 128]
        ax = jnp.where(is_nz, marble, ax)
        ay = jnp.where(is_nz, marble, ay)
        az = jnp.where(is_nz, marble, az)

    data = (P[3], P[4], P[5],       # d
            px, py, pz, nx, ny, nz,
            ax, ay, az,             # albedo
            P[22], P[23])           # fuzz, ior
    rng = tuple(P[30 + i] for i in range(15))
    (emx, emy, emz, wtx, wty, wtz,
     sdx, sdy, sdz, alive_f) = _plane_core(data, rng, mkind,
                                           lt[:n_lights], n_lights)

    ox, oy, oz = P[0], P[1], P[2]
    dx, dy, dz = P[3], P[4], P[5]
    Lx, Ly, Lz = P[24], P[25], P[26]
    bx, by, bz = P[27], P[28], P[29]
    alive_in = P[45] > 0.5
    bgx, bgy, bgz = lt[n_lights][0], lt[n_lights][1], lt[n_lights][2]

    is_hit = pkind != KIND_NONE
    miss = alive_in & ~is_hit
    live = alive_in & is_hit
    zero = jnp.zeros_like(ox)
    one = jnp.ones_like(ox)

    # L += miss ? beta*background : 0 ; += live ? beta*emitted : 0
    Lx = Lx + jnp.where(miss, bx * bgx, zero) + jnp.where(live, bx * emx,
                                                          zero)
    Ly = Ly + jnp.where(miss, by * bgy, zero) + jnp.where(live, by * emy,
                                                          zero)
    Lz = Lz + jnp.where(miss, bz * bgz, zero) + jnp.where(live, bz * emz,
                                                          zero)
    bx = jnp.where(live, bx * wtx, bx)
    by = jnp.where(live, by * wty, by)
    bz = jnp.where(live, bz * wtz, bz)
    alive2 = live & (alive_f > 0.5)
    ox = jnp.where(alive2, px, ox)
    oy = jnp.where(alive2, py, oy)
    oz = jnp.where(alive2, pz, oz)
    dx = jnp.where(alive2, sdx, dx)
    dy = jnp.where(alive2, sdy, dy)
    dz = jnp.where(alive2, sdz, dz)
    return jnp.stack([ox, oy, oz, dx, dy, dz, Lx, Ly, Lz, bx, by, bz,
                      jnp.where(alive2, one, zero)])


def _make_kernel(n_lights: int, has_checker: bool):
    def kernel(planes_ref, pkind_ref, mkind_ref, flags_ref, lt_ref,
               out_ref):
        out_ref[:] = _bounce_plane_core(
            planes_ref[:], pkind_ref[:], mkind_ref[:], flags_ref[:],
            _read_lt(lt_ref, n_lights + 1), n_lights, has_checker)

    return kernel


def _make_bwd_kernel(n_lights: int, has_checker: bool):
    """jax.vjp of the composed core, traced inside the kernel — primal
    recompute + all transposes fuse into one Mosaic kernel. Outputs the
    input-plane cotangents and (row 0 of) a [8,128] plane holding the
    per-tile light-table+background gradient sums at lanes
    r*LT_COLS + j."""
    def kernel(planes_ref, pkind_ref, mkind_ref, flags_ref, lt_ref, g_ref,
               dpl_ref, dlt_ref):
        P = planes_ref[:]
        pkind, mkind, flags = pkind_ref[:], mkind_ref[:], flags_ref[:]
        lt = _read_lt(lt_ref, n_lights + 1)

        def core(P_, lt_):
            return _bounce_plane_core(P_, pkind, mkind, flags, lt_,
                                      n_lights, has_checker)

        _, vjp = jax.vjp(core, P, lt)
        dP, dlt = vjp(g_ref[:])
        dpl_ref[:] = dP

        rows = n_lights + 1
        acc = jnp.zeros((8, LANES), jnp.float32)
        rr = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        for r in range(rows):
            for j in range(LT_COLS):
                s = dlt[r][j]                    # scalar (summed by vjp)
                acc = acc + jnp.where((rr == 0) & (cc == r * LT_COLS + j),
                                      s, 0.0)
        dlt_ref[0] = acc

    return kernel


@jax.custom_vjp
def _bounce_planes_call(planes, pkind_p, mkind_p, flags_p, lt):
    """[N_IN, Cr, 128] planes -> [N_OUT_B, Cr, 128] next-state planes.

    ``planes.shape[0]`` is N_IN_B (solid-only) or N_IN_B + N_CHK
    (checker leaves appended) — a static shape that selects the kernel
    variant."""
    n_lights = lt.shape[0] - 1
    n_in, cr = planes.shape[0], planes.shape[1]
    br = _pick_br(cr)
    return pl.pallas_call(
        _make_kernel(n_lights, n_in > N_IN_B),
        grid=(cr // br,),
        in_specs=[
            pl.BlockSpec((n_in, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT_B, br, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT_B, cr, LANES), jnp.float32),
        interpret=_pi.INTERPRET,
    )(planes, pkind_p, mkind_p, flags_p, lt)


def _bp_fwd(planes, pkind_p, mkind_p, flags_p, lt):
    out = _bounce_planes_call(planes, pkind_p, mkind_p, flags_p, lt)
    return out, (planes, pkind_p, mkind_p, flags_p, lt)


def _bp_bwd(res, g):
    planes, pkind_p, mkind_p, flags_p, lt = res
    n_lights = lt.shape[0] - 1
    n_in, cr = planes.shape[0], planes.shape[1]
    br = _pick_br(cr)
    dpl, dlt = pl.pallas_call(
        _make_bwd_kernel(n_lights, n_in > N_IN_B),
        grid=(cr // br,),
        in_specs=[
            pl.BlockSpec((n_in, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N_OUT_B, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_in, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_in, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cr // br, 8, LANES), jnp.float32),
        ],
        interpret=_pi.INTERPRET,
    )(planes, pkind_p, mkind_p, flags_p, lt, g)

    rows = lt.shape[0]
    d_lt = dpl.dtype.type(0) + dlt[:, 0, :rows * LT_COLS].sum(0).reshape(
        rows, LT_COLS)
    import numpy as np
    zk = np.zeros(jnp.shape(pkind_p), jax.dtypes.float0)
    return (dpl, zk, zk, zk, d_lt)


_bounce_planes_call.defvjp(_bp_fwd, _bp_bwd)


# ---- live-tile-gated megakernel (the uber-bounce path) -------------------
#
# Same plane core, but the grid prefetches a per-tile liveness list
# (any alive lane among the tile's BR*128): dead tiles skip the whole
# material/estimator evaluation and copy the carry state through —
# the reference recursion pays nothing for dead paths (ray.rs:85-126);
# here a dead tile costs one grid step + a 13-plane copy. BR is pinned
# to 8 (the finest sublane granularity) so the skip granularity matches
# ops/pallas_uber's select kernel.

def _make_kernel_live(n_lights: int, has_checker: bool):
    def kernel(tlive_ref, planes_ref, pkind_ref, mkind_ref, flags_ref,
               lt_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(tlive_ref[i] > 0)
        def _run():
            out_ref[:] = _bounce_plane_core(
                planes_ref[:], pkind_ref[:], mkind_ref[:], flags_ref[:],
                _read_lt(lt_ref, n_lights + 1), n_lights, has_checker)

        @pl.when(tlive_ref[i] == 0)
        def _skip():
            # all-dead tile: the core is the identity on state (every
            # update is alive-masked) — copy o,d,L,beta through and
            # alive (all zeros) verbatim
            out_ref[0:6] = planes_ref[0:6]
            out_ref[6:9] = planes_ref[24:27]
            out_ref[9:12] = planes_ref[27:30]
            out_ref[12:13] = planes_ref[45:46]

    return kernel


def _make_bwd_kernel_live(n_lights: int, has_checker: bool):
    def kernel(tlive_ref, planes_ref, pkind_ref, mkind_ref, flags_ref,
               lt_ref, g_ref, dpl_ref, dlt_ref):
        i = pl.program_id(0)

        @pl.when(tlive_ref[i] > 0)
        def _run():
            P = planes_ref[:]
            pkind, mkind, flags = (pkind_ref[:], mkind_ref[:],
                                   flags_ref[:])
            lt = _read_lt(lt_ref, n_lights + 1)

            def core(P_, lt_):
                return _bounce_plane_core(P_, pkind, mkind, flags, lt_,
                                          n_lights, has_checker)

            _, vjp = jax.vjp(core, P, lt)
            dP, dlt = vjp(g_ref[:])
            dpl_ref[:] = dP
            rows = n_lights + 1
            acc = jnp.zeros((8, LANES), jnp.float32)
            rr = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            for r in range(rows):
                for j in range(LT_COLS):
                    s = dlt[r][j]
                    acc = acc + jnp.where(
                        (rr == 0) & (cc == r * LT_COLS + j), s, 0.0)
            dlt_ref[0] = acc

        @pl.when(tlive_ref[i] == 0)
        def _skip():
            # vjp of the pass-through: state cotangents copy back, all
            # other plane cotangents (incl. alive — the live branch's
            # vjp also yields 0 there: it only feeds comparisons) are 0
            dpl_ref[:] = jnp.zeros_like(dpl_ref)
            dpl_ref[0:6] = g_ref[0:6]
            dpl_ref[24:27] = g_ref[6:9]
            dpl_ref[27:30] = g_ref[9:12]
            dlt_ref[0] = jnp.zeros((8, LANES), jnp.float32)

    return kernel


_LIVE_BR = 8


@jax.custom_vjp
def bounce_planes_live(planes, pkind_p, mkind_p, flags_p, lt, tlive):
    """Live-tile-gated ``_bounce_planes_call`` (see module docstring)."""
    n_lights = lt.shape[0] - 1
    n_in, cr = planes.shape[0], planes.shape[1]
    br = _LIVE_BR
    return pl.pallas_call(
        _make_kernel_live(n_lights, n_in > N_IN_B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cr // br,),
            in_specs=[
                pl.BlockSpec((n_in, br, LANES), lambda i, tl: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(lt.shape, lambda i, tl: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((N_OUT_B, br, LANES),
                                   lambda i, tl: (0, i, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((N_OUT_B, cr, LANES), jnp.float32),
        interpret=_pi.INTERPRET,
    )(tlive, planes, pkind_p, mkind_p, flags_p, lt)


def _bpl_fwd(planes, pkind_p, mkind_p, flags_p, lt, tlive):
    out = bounce_planes_live(planes, pkind_p, mkind_p, flags_p, lt, tlive)
    return out, (planes, pkind_p, mkind_p, flags_p, lt, tlive)


def _bpl_bwd(res, g):
    planes, pkind_p, mkind_p, flags_p, lt, tlive = res
    n_lights = lt.shape[0] - 1
    n_in, cr = planes.shape[0], planes.shape[1]
    br = _LIVE_BR
    dpl, dlt = pl.pallas_call(
        _make_bwd_kernel_live(n_lights, n_in > N_IN_B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cr // br,),
            in_specs=[
                pl.BlockSpec((n_in, br, LANES), lambda i, tl: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, LANES), lambda i, tl: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(lt.shape, lambda i, tl: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N_OUT_B, br, LANES),
                             lambda i, tl: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_in, br, LANES), lambda i, tl: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda i, tl: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((n_in, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cr // br, 8, LANES), jnp.float32),
        ],
        interpret=_pi.INTERPRET,
    )(tlive, planes, pkind_p, mkind_p, flags_p, lt, g)
    rows = lt.shape[0]
    d_lt = dlt[:, 0, :rows * LT_COLS].sum(0).reshape(rows, LT_COLS)
    import numpy as np
    zk = np.zeros(jnp.shape(pkind_p), jax.dtypes.float0)
    zt = np.zeros(jnp.shape(tlive), jax.dtypes.float0)
    return (dpl, zk, zk, zk, d_lt, zt)


bounce_planes_live.defvjp(_bpl_fwd, _bpl_bwd)


# ---- shade+update fused kernel (scenes the full megakernel can't take) ----
#
# Noise/image textures need table gathers the kernel can't do, so those
# scenes keep the split hit-attrs kernel + XLA texture_value — but the
# material evaluation AND the whole estimator state update still fuse
# into ONE kernel, eliminating the [C,3] select/multiply fusion islands
# between the shade kernel and the state update (ray.rs:85-126).
#
# SU plane layout ([N_SU, BR, 128]):
#   0..2 o   3..5 d   6..8 p   9..11 n   12..14 albedo   15 fuzz 16 ior
#   17..19 L   20..22 beta   23..31 ub(9)   32..37 gb(6)
#   38 alive(0/1)   39 hit(0/1)
N_SU = 40


def _su_plane_core(P, mkind, lt, n_lights):
    """_plane_core (material eval) + estimator update for one tile.

    Same update semantics as _bounce_plane_core, with (p, n, albedo)
    supplied as differentiable input planes instead of computed
    in-kernel. Returns [N_OUT_B, BR, 128].
    """
    data = (P[3], P[4], P[5], P[6], P[7], P[8], P[9], P[10], P[11],
            P[12], P[13], P[14], P[15], P[16])
    rng = tuple(P[23 + i] for i in range(15))
    (emx, emy, emz, wtx, wty, wtz,
     sdx, sdy, sdz, alive_f) = _plane_core(data, rng, mkind,
                                           lt[:n_lights], n_lights)

    ox, oy, oz = P[0], P[1], P[2]
    dx, dy, dz = P[3], P[4], P[5]
    px, py, pz = P[6], P[7], P[8]
    Lx, Ly, Lz = P[17], P[18], P[19]
    bx, by, bz = P[20], P[21], P[22]
    alive_in = P[38] > 0.5
    is_hit = P[39] > 0.5
    bgx, bgy, bgz = lt[n_lights][0], lt[n_lights][1], lt[n_lights][2]

    miss = alive_in & ~is_hit
    live = alive_in & is_hit
    zero = jnp.zeros_like(ox)
    one = jnp.ones_like(ox)
    Lx = Lx + jnp.where(miss, bx * bgx, zero) + jnp.where(live, bx * emx,
                                                          zero)
    Ly = Ly + jnp.where(miss, by * bgy, zero) + jnp.where(live, by * emy,
                                                          zero)
    Lz = Lz + jnp.where(miss, bz * bgz, zero) + jnp.where(live, bz * emz,
                                                          zero)
    bx = jnp.where(live, bx * wtx, bx)
    by = jnp.where(live, by * wty, by)
    bz = jnp.where(live, bz * wtz, bz)
    alive2 = live & (alive_f > 0.5)
    ox = jnp.where(alive2, px, ox)
    oy = jnp.where(alive2, py, oy)
    oz = jnp.where(alive2, pz, oz)
    dx = jnp.where(alive2, sdx, dx)
    dy = jnp.where(alive2, sdy, dy)
    dz = jnp.where(alive2, sdz, dz)
    return jnp.stack([ox, oy, oz, dx, dy, dz, Lx, Ly, Lz, bx, by, bz,
                      jnp.where(alive2, one, zero)])


def _make_su_kernel(n_lights: int):
    def kernel(planes_ref, mkind_ref, lt_ref, out_ref):
        out_ref[:] = _su_plane_core(planes_ref[:], mkind_ref[:],
                                    _read_lt(lt_ref, n_lights + 1),
                                    n_lights)

    return kernel


def _make_su_bwd_kernel(n_lights: int):
    def kernel(planes_ref, mkind_ref, lt_ref, g_ref, dpl_ref, dlt_ref):
        P = planes_ref[:]
        mkind = mkind_ref[:]
        lt = _read_lt(lt_ref, n_lights + 1)

        def core(P_, lt_):
            return _su_plane_core(P_, mkind, lt_, n_lights)

        _, vjp = jax.vjp(core, P, lt)
        dP, dlt = vjp(g_ref[:])
        dpl_ref[:] = dP

        rows = n_lights + 1
        acc = jnp.zeros((8, LANES), jnp.float32)
        rr = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        for r in range(rows):
            for j in range(LT_COLS):
                s = dlt[r][j]
                acc = acc + jnp.where((rr == 0) & (cc == r * LT_COLS + j),
                                      s, 0.0)
        dlt_ref[0] = acc

    return kernel


@jax.custom_vjp
def _su_planes_call(planes, mkind_p, lt):
    n_lights = lt.shape[0] - 1
    cr = planes.shape[1]
    br = _pick_br(cr)
    return pl.pallas_call(
        _make_su_kernel(n_lights),
        grid=(cr // br,),
        in_specs=[
            pl.BlockSpec((N_SU, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT_B, br, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT_B, cr, LANES), jnp.float32),
        interpret=_pi.INTERPRET,
    )(planes, mkind_p, lt)


def _su_fwd(planes, mkind_p, lt):
    return _su_planes_call(planes, mkind_p, lt), (planes, mkind_p, lt)


def _su_bwd(res, g):
    planes, mkind_p, lt = res
    n_lights = lt.shape[0] - 1
    cr = planes.shape[1]
    br = _pick_br(cr)
    dpl, dlt = pl.pallas_call(
        _make_su_bwd_kernel(n_lights),
        grid=(cr // br,),
        in_specs=[
            pl.BlockSpec((N_SU, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lt.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N_OUT_B, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_SU, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_SU, cr, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cr // br, 8, LANES), jnp.float32),
        ],
        interpret=_pi.INTERPRET,
    )(planes, mkind_p, lt, g)
    rows = lt.shape[0]
    d_lt = dlt[:, 0, :rows * LT_COLS].sum(0).reshape(rows, LT_COLS)
    import numpy as np
    zk = np.zeros(jnp.shape(mkind_p), jax.dtypes.float0)
    return (dpl, zk, d_lt)


_su_planes_call.defvjp(_su_fwd, _su_bwd)


def su_eligible(scene) -> bool:
    """shade+update fusion works for ANY texture set (albedo arrives as
    a plane); only the light-table row budget gates it."""
    import os

    if os.environ.get("RRT_NO_MEGAKERNEL", "") == "1":
        return False
    if os.environ.get("RRT_NO_PALLAS_SHADE", "") == "1":
        return False   # debugging isolation: keep shade() reachable
    return (scene.n_lights + 1) * LT_COLS <= LANES


def shade_update_fused(scene, bkey, o, d, time, L, beta, alive, hit,
                       albedo, rand=None):
    """Fused material eval + estimator update for a split-pipeline hit.

    Drop-in for the tail of ops/integrator._bounce.run when the full
    megakernel is ineligible (noise/image textures): ``hit`` comes from
    the usual intersect() (hit-attrs kernel), ``albedo`` from the XLA
    texture_value — both stay differentiable through this kernel's vjp.
    """
    c = o.shape[0]
    f32 = o.dtype
    mkind = scene.mat_kind[hit.mat]
    mat_pack = jnp.stack([scene.mat_fuzz, scene.mat_ior], axis=1)[hit.mat]

    if rand is None:
        ub = jax.random.uniform(rngu.stream(bkey, rngu.SCATTER), (c, 9),
                                dtype=f32)
        gb = jax.random.normal(rngu.stream(bkey, rngu.FUZZ), (c, 6),
                               dtype=f32)
    else:
        ub, gb = rand
    ub = checkpoint_name(ub, "shade_rand")
    gb = checkpoint_name(gb, "shade_rand")

    pad = (-c) % (8 * LANES)
    cp = c + pad

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(cp // LANES, LANES)

    feats = ([o[:, i] for i in range(3)] + [d[:, i] for i in range(3)]
             + [hit.p[:, i] for i in range(3)]
             + [hit.normal[:, i] for i in range(3)]
             + [albedo[:, i] for i in range(3)]
             + [mat_pack[:, 0], mat_pack[:, 1]]
             + [L[:, i] for i in range(3)]
             + [beta[:, i] for i in range(3)]
             + [ub[:, i] for i in range(9)]
             + [gb[:, i] for i in range(6)]
             + [alive.astype(f32), hit.hit.astype(f32)])
    planes = jnp.stack([plane(x) for x in feats])
    mkind_p = plane(mkind.astype(jnp.int32))

    lt = jnp.concatenate(
        [_light_table(scene) if scene.n_lights
         else jnp.zeros((0, LT_COLS), jnp.float32),
         jnp.pad(scene.background[None, :], ((0, 0), (0, LT_COLS - 3)))],
        axis=0)

    out = _su_planes_call(planes, mkind_p, lt)
    flat = out.reshape(N_OUT_B, cp)[:, :c]
    return (flat[0:3].T, flat[3:6].T, time, flat[6:9].T, flat[9:12].T,
            flat[12] > 0.5)


def eligible(scene) -> bool:
    """Static megakernel eligibility for a compiled scene (docstring)."""
    import os

    if os.environ.get("RRT_NO_MEGAKERNEL", "") == "1":
        return False
    if os.environ.get("RRT_NO_PALLAS_SHADE", "") == "1":
        return False   # debugging isolation: keep shade() reachable
    # no noise/image leaves (their albedo needs table lookups the kernel
    # can't do); checker-of-solids is evaluated in-kernel
    return (scene.perlin_vec.shape[0] == 0
            and scene.img_data.shape[0] == 0
            and (scene.n_lights + 1) * LT_COLS <= LANES)


def bounce_fused(scene, bkey, o, d, time, L, beta, alive, sel,
                 rand=None):
    """One full wavefront bounce for the detached selection ``sel``.

    Returns the next (o, d, time, L, beta, alive) carry — the drop-in
    body of ops/integrator._bounce.run for eligible scenes. ``rand``
    optionally supplies the (ub, gb) random blocks (compacting
    wavefront); drawn from ``bkey`` when None — same streams either way.
    """
    c = o.shape[0]
    f32 = o.dtype

    # the winner's material/texture attributes arrive pre-joined in
    # sel.attr (ONE wide row gather per kind in intersect_select —
    # replaces the old per-field mat_kind/mat_tex/tex_color/fuzz/ior
    # gather chain, ~130us of XLA gathers per live chunk-bounce on the
    # round-4 suzanne trace; same values, same streams)
    from rust_ray_tracer_tpu.ops.intersect import (
        MATTR_ALBEDO, MATTR_EVEN, MATTR_FUZZ, MATTR_IOR, MATTR_ISCHK,
        MATTR_MKIND, MATTR_ODD)
    mkind = sel.attr[:, MATTR_MKIND].astype(jnp.int32)
    albedo = checkpoint_name(sel.attr[:, MATTR_ALBEDO], "albedo")
    mat_pack = sel.attr[:, MATTR_FUZZ:MATTR_IOR + 1]
    has_checker = scene.tex_even.shape[0] > 0
    if has_checker:
        even = checkpoint_name(sel.attr[:, MATTR_EVEN], "albedo")
        odd = checkpoint_name(sel.attr[:, MATTR_ODD], "albedo")
        is_chk = sel.attr[:, MATTR_ISCHK] > 0.5

    # the bounce's random budget — identical streams to shade() so the
    # megakernel and split paths follow the same sampled trajectories
    if rand is None:
        ub = jax.random.uniform(rngu.stream(bkey, rngu.SCATTER), (c, 9),
                                dtype=f32)
        gb = jax.random.normal(rngu.stream(bkey, rngu.FUZZ), (c, 6),
                               dtype=f32)
    else:
        ub, gb = rand
    ub = checkpoint_name(ub, "shade_rand")
    gb = checkpoint_name(gb, "shade_rand")

    pad = (-c) % (8 * LANES)
    cp = c + pad

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(cp // LANES, LANES)

    feats = ([o[:, i] for i in range(3)] + [d[:, i] for i in range(3)]
             + [time, sel.t_min, sel.t_max]
             + [sel.pack[:, i] for i in range(9)]
             + [sel.t_med]
             + [albedo[:, i] for i in range(3)]
             + [mat_pack[:, 0], mat_pack[:, 1]]
             + [L[:, i] for i in range(3)]
             + [beta[:, i] for i in range(3)]
             + [ub[:, i] for i in range(9)]
             + [gb[:, i] for i in range(6)]
             + [alive.astype(f32)])
    flags = sel.flip.astype(jnp.int32)
    if has_checker:
        feats += ([even[:, i] for i in range(3)]
                  + [odd[:, i] for i in range(3)])
        flags = flags | (is_chk.astype(jnp.int32) << 1)
    planes = jnp.stack([plane(x) for x in feats])
    pkind_p = plane(sel.kind.astype(jnp.int32))
    mkind_p = plane(mkind.astype(jnp.int32))
    flags_p = plane(flags)

    lt = jnp.concatenate(
        [_light_table(scene) if scene.n_lights
         else jnp.zeros((0, LT_COLS), jnp.float32),
         jnp.pad(scene.background[None, :], ((0, 0), (0, LT_COLS - 3)))],
        axis=0)

    out = _bounce_planes_call(planes, pkind_p, mkind_p, flags_p, lt)
    flat = out.reshape(N_OUT_B, cp)[:, :c]
    return (flat[0:3].T, flat[3:6].T, time, flat[6:9].T, flat[9:12].T,
            flat[12] > 0.5)
