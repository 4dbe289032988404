"""Sample averaging + gamma-2 tonemap to u8.

Exact counterpart of ``get_color`` (``/root/reference/src/vec3.rs:30-53``):
divide the per-pixel color *sum* by the sample count, per-channel NaN -> 0
(checked on the raw sum, before scaling), gamma 2.0 via sqrt, clamp to
[0, 0.999], scale by 256 and truncate to u8.
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap_sum(color_sum, samples):
    """color_sum [...,3] (sum over `samples` draws) -> u8 [...,3]."""
    scale = 1.0 / samples
    scaled = jnp.sqrt(jnp.maximum(color_sum * scale, 0.0))
    ch = jnp.where(jnp.isnan(color_sum), 0.0, scaled)   # vec3.rs:35-46
    return (256.0 * jnp.clip(ch, 0.0, 0.999)).astype(jnp.uint8)


def tonemap_mean(color_mean, samples: int = 1):
    """Tonemap an already-averaged image. NaN channels still map to 0."""
    return tonemap_sum(color_mean * samples, samples)
