"""Branchless texture evaluation over the scene's texture table.

Counterpart of ``/root/reference/src/material/texture.rs``. The reference
dispatches through ``dyn Texture`` per hit; here every shaded ray evaluates
the *leaf* texture kinds that exist in the scene (solid / marble-noise /
image) and selects by the gathered texture kind — plus one level of checker
indirection (``Checker`` selects between two leaf textures by the sign of a
sine product, texture.rs:50-57).

Work that a scene doesn't use is skipped *statically*: compile_scene emits
zero-length perlin / atlas / checker tables when the feature is absent, and
shapes are trace-time constants.
"""

from __future__ import annotations

import jax.numpy as jnp

from rust_ray_tracer_tpu.models.scene import (
    TEX_CHECKER, TEX_IMAGE, TEX_NOISE)
from rust_ray_tracer_tpu.ops import perlin


def _leaf_value(scene, tid, u, v, p):
    """Evaluate non-checker texture kinds for texture ids tid [...]."""
    kind = scene.tex_kind[tid]
    out = scene.tex_color[tid]                      # TEX_SOLID default

    if scene.perlin_vec.shape[0]:
        # marble: 0.5*(1 + sin(scale*z + 10*turb(p,7))) (texture.rs:74-82)
        scale = scene.tex_scale[tid]
        t = perlin.turb(scene.perlin_vec, scene.perlin_px,
                        scene.perlin_py, scene.perlin_pz, p)
        marble = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * t))
        out = jnp.where((kind == TEX_NOISE)[..., None],
                        marble[..., None] * jnp.ones(3, p.dtype), out)

    if scene.img_data.shape[0]:
        # nearest-neighbour, v flipped (texture.rs:109-121)
        img_id = scene.tex_image[tid]
        h = scene.img_size[img_id, 0]
        w = scene.img_size[img_id, 1]
        cu = jnp.clip(u, 0.0, 1.0)
        cv = 1.0 - jnp.clip(v, 0.0, 1.0)
        x = jnp.clip((cu * w.astype(u.dtype)).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((cv * h.astype(u.dtype)).astype(jnp.int32), 0, h - 1)
        texel = scene.img_data[img_id, y, x]
        out = jnp.where((kind == TEX_IMAGE)[..., None], texel, out)

    return out


def texture_value(scene, tid, u, v, p):
    """Texture color for texture ids tid at (u, v, p) -> [..., 3]."""
    out = _leaf_value(scene, tid, u, v, p)

    if scene.tex_even.shape[0]:
        kind = scene.tex_kind[tid]
        even = _leaf_value(scene, scene.tex_even[tid], u, v, p)
        odd = _leaf_value(scene, scene.tex_odd[tid], u, v, p)
        sines = (jnp.sin(10.0 * p[..., 0]) * jnp.sin(10.0 * p[..., 1])
                 * jnp.sin(10.0 * p[..., 2]))        # texture.rs:52
        checker = jnp.where((sines < 0.0)[..., None], odd, even)
        out = jnp.where((kind == TEX_CHECKER)[..., None], checker, out)

    return out
