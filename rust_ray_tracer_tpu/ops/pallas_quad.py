"""Pallas TPU kernel: fused quad (parallelogram) intersection search.

Same design as the sphere kernel (ops/pallas_sphere.py): per-(ray, quad)
arithmetic is ~45 VPU flops evaluated tile-by-tile in VMEM with the
running best folded in place, Morton-cluster culling, dead-lane windows.
Matters for the quad-heavy scenes (``final_scene``: 1350 ground-box
faces; ``cornell_box``); the XLA path materializes [C,Q] in HBM.

Semantics match ``intersect._quad_candidates`` (aarect lowered to
parallelograms, both sides hittable, inclusive [0,1]^2 bounds,
aarect.rs:38-67). Detached phase-1 only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_ray_tracer_tpu.models.scene import CLUSTER
from rust_ray_tracer_tpu.ops import pallas_intersect as _pi
from rust_ray_tracer_tpu.ops.pallas_intersect import (
    BC, _pad_axis, _tile_cluster_mask)

BQ = CLUSTER
EPS = 1e-12


def _kernel(mask_ref, ray_ref, quad_ref, best_t_ref, best_i_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _init():
        best_t_ref[:] = jnp.full_like(best_t_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    @pl.when(mask_ref[ti, tj] > 0)
    def _compute():
        rays = ray_ref[:]                     # [BC, 8]
        qd = quad_ref[:]                      # [13, BQ]

        def rc(i):
            return rays[:, i:i + 1]

        def qr(i):
            return qd[i:i + 1, :]

        ox, oy, oz = rc(0), rc(1), rc(2)
        dx, dy, dz = rc(3), rc(4), rc(5)
        tmin, tmax = rc(6), rc(7)
        qx, qy, qz = qr(0), qr(1), qr(2)
        ux, uy, uz = qr(3), qr(4), qr(5)
        vx, vy, vz = qr(6), qr(7), qr(8)
        nx, ny, nz = qr(9), qr(10), qr(11)
        inv_n2 = qr(12)

        denom = dx * nx + dy * ny + dz * nz           # [BC, BQ]
        dsafe = jnp.where(jnp.abs(denom) < EPS,
                          jnp.where(denom < 0, -EPS, EPS), denom)
        t = ((qx - ox) * nx + (qy - oy) * ny + (qz - oz) * nz) / dsafe
        wx = ox + t * dx - qx
        wy = oy + t * dy - qy
        wz = oz + t * dz - qz
        # alpha = ((w x v) . n) / n^2, beta = ((u x w) . n) / n^2
        cwvx = wy * vz - wz * vy
        cwvy = wz * vx - wx * vz
        cwvz = wx * vy - wy * vx
        alpha = (cwvx * nx + cwvy * ny + cwvz * nz) * inv_n2
        cuwx = uy * wz - uz * wy
        cuwy = uz * wx - ux * wz
        cuwz = ux * wy - uy * wx
        beta = (cuwx * nx + cuwy * ny + cuwz * nz) * inv_n2

        valid = ((jnp.abs(denom) > 0.0)
                 & (t >= tmin) & (t <= tmax)
                 & (alpha >= 0.0) & (alpha <= 1.0)
                 & (beta >= 0.0) & (beta <= 1.0))
        tt = jnp.where(valid, t, jnp.inf)

        loc_t = jnp.min(tt, axis=1, keepdims=True)
        loc_i = (jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                 + tj * BQ)
        better = loc_t < best_t_ref[:]
        best_i_ref[:] = jnp.where(better, loc_i, best_i_ref[:])
        best_t_ref[:] = jnp.where(better, loc_t, best_t_ref[:])


def quad_search(scene, o, d, t_min, t_max):
    """Best (t, quad index) per ray — Pallas path."""
    c = o.shape[0]
    q_n = scene.quad_q.shape[0]

    rays = jnp.concatenate(
        [o, d, t_min[:, None], t_max[:, None]], axis=1)
    rays = _pad_axis(rays, BC, 0, 0.0)
    if rays.shape[0] != c:
        rays = rays.at[c:, 7].set(-1.0)

    n = jnp.cross(scene.quad_u, scene.quad_v)
    n2 = jnp.sum(n * n, axis=-1)
    inv_n2 = 1.0 / jnp.maximum(n2, EPS)
    qd = jnp.concatenate([
        scene.quad_q.T, scene.quad_u.T, scene.quad_v.T, n.T,
        inv_n2[None, :]], axis=0)            # [13, Q]
    pad_q = (-(-q_n // BQ) * BQ) - q_n
    if pad_q:
        # zero-edge quads: n = 0 -> denom 0 -> |denom| > 0 fails
        qd = jnp.concatenate(
            [qd, jnp.zeros((13, pad_q), qd.dtype)], axis=1)

    cp, qp = rays.shape[0], qd.shape[1]
    grid = (cp // BC, qp // BQ)

    mask = _tile_cluster_mask(
        rays[:, 0:3], rays[:, 3:6],
        scene.quad_cluster_min, scene.quad_cluster_max,
        rays[:, 6], jnp.where(rays[:, 7] < 0, -jnp.inf, rays[:, 7]))

    best_t, best_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(mask.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((13, BQ), lambda i, j: (0, j),
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
    )(mask, rays, qd)

    return best_t[:c, 0], jnp.minimum(best_i[:c, 0], q_n - 1)
