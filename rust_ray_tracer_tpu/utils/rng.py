"""Counter-based RNG discipline.

The reference uses unseeded ``rand::thread_rng`` per worker thread
(``/root/reference/src/main.rs:88``, ``vec3.rs:10``, ``pdf.rs:15``), so its
renders are irreproducible and depend on the thread schedule. Here every
random draw is derived from a root ``jax.random`` key by folding in structured
coordinates — (wave, bounce, purpose) — so renders are bitwise identical for a
given seed across any device count or sharding layout.

Purpose tags keep independent uses of randomness on independent streams even
when they share a (wave, bounce) coordinate.
"""

from __future__ import annotations

import jax

# Stable stream tags. Never renumber — that silently changes every render.
JITTER = 0       # per-sample pixel jitter (main.rs:92-93)
TIME = 1         # camera shutter time (camera.rs:67)
SCATTER = 2      # diffuse mixture sampling (pdf.rs:72-95)
FUZZ = 3         # metal fuzz ball sampling (material/mod.rs:96)
COIN = 4         # dielectric reflect/refract coin (material/mod.rs:130)
MEDIUM = 5       # constant-medium free-flight distance (constant_medium.rs:63)
ISO = 6          # isotropic uniform ball direction (material/mod.rs:209)
LIGHT_PICK = 7   # uniform light selection (geometry/mod.rs:122-125)
LIGHT_SAMPLE = 8  # per-light direction sampling (sphere.rs:114 / aarect.rs:134)
MIX_COIN = 9     # 50/50 mixture component choice (pdf.rs:87-94)
CHUNK = 10       # per-ray-chunk key derivation (integrator)


def wave_key(root: jax.Array, wave: int | jax.Array) -> jax.Array:
    """Key for one sample-wave (one spp pass over all pixels)."""
    return jax.random.fold_in(root, wave)


def bounce_key(wkey: jax.Array, bounce: int | jax.Array) -> jax.Array:
    return jax.random.fold_in(wkey, bounce)


def stream(key: jax.Array, purpose: int) -> jax.Array:
    return jax.random.fold_in(key, purpose)
