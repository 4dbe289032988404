"""Perlin gradient noise, batched over rays.

Counterpart of ``/root/reference/src/material/perlin.rs``: 256-entry random
gradient table + three xor-combined permutation tables (perlin.rs:44-51),
Hermite-smoothed trilinear gradient interpolation (perlin.rs:86-105), and the
``turb`` fractal sum (perlin.rs:58-71). The tables live in ``SceneData`` and
are seeded at scene compile time (the reference's are unseeded thread_rng —
irreproducible by construction, so tests inject fixed tables instead of
comparing images).

Everything here is elementwise VPU work plus 8 gathers into the 256-entry
tables per octave; XLA fuses it into the shading kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

_MASK = 255  # N - 1 for N=256 (perlin.rs:47-50)


def noise(perlin_vec, px, py, pz, p):
    """Gradient noise at points p [...,3] -> [...]. Range roughly [-1, 1]."""
    pf = jnp.floor(p)
    uvw = p - pf
    ijk = pf.astype(jnp.int32)

    # Hermite smoothing (perlin.rs:87-89)
    s = uvw * uvw * (3.0 - 2.0 * uvw)

    acc = jnp.zeros(p.shape[:-1], p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                hx = px[(ijk[..., 0] + di) & _MASK]
                hy = py[(ijk[..., 1] + dj) & _MASK]
                hz = pz[(ijk[..., 2] + dk) & _MASK]
                grad = perlin_vec[hx ^ hy ^ hz]           # [...,3]
                weight = uvw - jnp.asarray([di, dj, dk], p.dtype)
                w = ((di * s[..., 0] + (1 - di) * (1 - s[..., 0]))
                     * (dj * s[..., 1] + (1 - dj) * (1 - s[..., 1]))
                     * (dk * s[..., 2] + (1 - dk) * (1 - s[..., 2])))
                acc = acc + w * jnp.sum(grad * weight, axis=-1)
    return acc


def turb(perlin_vec, px, py, pz, p, depth: int = 7):
    """Fractal turbulence |sum w_i * noise(2^i p)| (perlin.rs:58-71)."""
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    temp_p = p
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * noise(perlin_vec, px, py, pz, temp_p)
        weight *= 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(acc)
