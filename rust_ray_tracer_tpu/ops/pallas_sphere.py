"""Pallas TPU kernel: fused sphere-intersection candidate search.

Spheres are *quadratic* in the ray, so unlike triangles
(ops/pallas_intersect.py) there is no Plücker matmul form — but the
per-(ray, sphere) arithmetic is ~35 VPU flops, and what kills the XLA
path for sphere-heavy scenes (``random``: ~830 spheres, ``final_scene``)
is the same thing that killed it for triangles: materialized ``[C,S]``
intermediates round-tripping HBM. This kernel evaluates a
``[BC, CLUSTER]`` tile entirely in VMEM with the running best folded in
place, reusing the Morton-cluster culling mask machinery (spheres are
Morton-ordered at compile time; swept AABBs cover motion blur).

Semantics match ``intersect._sph_candidates`` / the reference
(sphere.rs:52-95, 145-148): time-lerped center, ``disc > 0`` strict,
near root preferred if inside [t_min, t_max] else far root, lowest index
wins ties. Detached (phase-1) only — phase 2 recomputes differentiably.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.models.scene import CLUSTER
from rust_ray_tracer_tpu.ops.pallas_intersect import (
    BC, _pad_axis, _tile_cluster_mask)
from rust_ray_tracer_tpu.ops import pallas_intersect as _pi

BS = CLUSTER
EPS = 1e-12


def _kernel(mask_ref, ray_ref, sph_ref, best_t_ref, best_i_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _init():
        best_t_ref[:] = jnp.full_like(best_t_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    @pl.when(mask_ref[ti, tj] > 0)
    def _compute():
        rays = ray_ref[:]                     # [BC, 9]
        sph = sph_ref[:]                      # [9, BS]

        def rcol(i):
            return rays[:, i:i + 1]           # [BC, 1]

        def srow(i):
            return sph[i:i + 1, :]            # [1, BS]

        ox, oy, oz = rcol(0), rcol(1), rcol(2)
        dx, dy, dz = rcol(3), rcol(4), rcol(5)
        time, tmin, tmax = rcol(6), rcol(7), rcol(8)
        c0x, c0y, c0z = srow(0), srow(1), srow(2)
        e1x, e1y, e1z = srow(3), srow(4), srow(5)  # c1 - c0
        st0, inv_dt, r = srow(6), srow(7), srow(8)

        frac = (time - st0) * inv_dt          # [BC, BS]
        cx = c0x + frac * e1x
        cy = c0y + frac * e1y
        cz = c0z + frac * e1z
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz       # [BC, 1]
        b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - a * cc
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, EPS)) * (disc > 0)
        inv_a = 1.0 / jnp.maximum(a, EPS)
        root1 = (-b - sq) * inv_a
        root2 = (-b + sq) * inv_a
        ok1 = ok & (root1 >= tmin) & (root1 <= tmax)
        ok2 = ok & (root2 >= tmin) & (root2 <= tmax)
        t = jnp.where(ok1, root1, jnp.where(ok2, root2, jnp.inf))

        loc_t = jnp.min(t, axis=1, keepdims=True)
        loc_i = (jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
                 + tj * BS)
        better = loc_t < best_t_ref[:]
        best_i_ref[:] = jnp.where(better, loc_i, best_i_ref[:])
        best_t_ref[:] = jnp.where(better, loc_t, best_t_ref[:])


def sph_search(scene, o, d, time, t_min, t_max):
    """Best (t, sphere index) per ray — Pallas path.

    Returns (best_t [C] — inf on miss, best_idx [C] int32).
    """
    c = o.shape[0]
    s_n = scene.sph_c0.shape[0]

    # swept AABBs already padded/inverted for pad rows at compile time
    cl_min, cl_max = scene.sph_cluster_min, scene.sph_cluster_max

    rays = jnp.concatenate(
        [o, d, time[:, None], t_min[:, None], t_max[:, None]], axis=1)
    rays = _pad_axis(rays, BC, 0, 0.0)
    # pad rays get tmax 0 < tmin -> no window
    if rays.shape[0] != c:
        rays = rays.at[c:, 8].set(-1.0)

    dt = scene.sph_t1 - scene.sph_t0
    inv_dt = 1.0 / jnp.where(jnp.abs(dt) < EPS,
                             jnp.where(dt < 0, -EPS, EPS), dt)
    sph = jnp.stack([
        scene.sph_c0[:, 0], scene.sph_c0[:, 1], scene.sph_c0[:, 2],
        scene.sph_c1[:, 0] - scene.sph_c0[:, 0],
        scene.sph_c1[:, 1] - scene.sph_c0[:, 1],
        scene.sph_c1[:, 2] - scene.sph_c0[:, 2],
        scene.sph_t0, inv_dt, scene.sph_r], axis=0)     # [9, S]
    # pad spheres with r = 0 at origin -> disc = b^2 - a*|o|^2 ... may be
    # > 0 for rays toward the origin! Instead pad with c0 = 1e30, r = 0:
    # both b*b and a*cc overflow to +inf, so disc = inf - inf = NaN — and
    # NaN is rejected on every path (ok = NaN > 0 is False, and the NaN
    # roots fail the ok1/ok2 range comparisons), so t stays inf. Do NOT
    # "fix" the pad to finite large centers: f32 rounding of
    # (oc.d)^2 - |d|^2|oc|^2 can then yield a tiny positive disc and a
    # finite phantom root that beats a real miss.
    pad_s = (-(-s_n // BS) * BS) - s_n
    if pad_s:
        far = jnp.full((1, pad_s), 1e30, sph.dtype)
        zero = jnp.zeros((1, pad_s), sph.dtype)
        pad_block = jnp.concatenate(
            [far, far, far, zero, zero, zero, zero, zero, zero], axis=0)
        sph = jnp.concatenate([sph, pad_block], axis=1)

    cp = rays.shape[0]
    sp = sph.shape[1]
    grid = (cp // BC, sp // BS)

    mask = _tile_cluster_mask(
        rays[:, 0:3], rays[:, 3:6], cl_min, cl_max,
        rays[:, 7], jnp.where(rays[:, 8] < 0, -jnp.inf, rays[:, 8]))

    best_t, best_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(mask.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, BS), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BC, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, 1), jnp.int32),
        ],
        interpret=_pi.INTERPRET,
    )(mask, rays, sph)

    return best_t[:c, 0], jnp.minimum(best_i[:c, 0], s_n - 1)
