"""Small batched vector-math helpers shared by all kernels.

Mirrors the role of the reference's ``src/vec3.rs`` (component-wise ops on
``glam::Vec3A``, orthonormal bases) but for ``[..., 3]`` JAX arrays, with
gradient-safe guards (``safe_sqrt`` etc. keep NaNs out of *untaken* ``where``
branches, which would otherwise poison reverse-mode AD).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

EPS = 1e-12


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_sq(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return safe_sqrt(length_sq(a))


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped at 0 — and with a clamped *input* so the backward pass
    never sees d/dx sqrt(x) at x<=0 (which is inf/NaN even under a where)."""
    return jnp.sqrt(jnp.maximum(x, EPS)) * (x > 0)


def safe_div(a: jnp.ndarray, b: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """a/b with the denominator pushed away from zero, keeping its sign."""
    b_safe = jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)
    return a / b_safe


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Unit vector; returns 0 for (near-)zero input instead of NaN."""
    n2 = length_sq(a)
    inv = lax.rsqrt(jnp.maximum(n2, EPS))
    return a * jnp.where(n2 > 0, inv, 0.0)[..., None]


def orthonormal_basis(w: jnp.ndarray):
    """Build (u, v, w_hat) with w_hat = normalize(w).

    Counterpart of the reference's ``OrthNormBasis::from_w``
    (``/root/reference/src/vec3.rs:55-73``), which delegates to glam's
    ``any_orthonormal_pair``. We use the branchless Duff et al. (Pixar) frame,
    which is an equally valid orthonormal pair; the basis choice only rotates
    the azimuth of cosine samples and is statistically irrelevant.
    """
    w_hat = normalize(w)
    x, y, z = w_hat[..., 0], w_hat[..., 1], w_hat[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z + jnp.where(jnp.abs(sign + z) < 1e-8, 1e-8, 0.0))
    b = x * y * a
    u = jnp.stack([1.0 + sign * x * x * a, sign * b, -sign * x], axis=-1)
    v = jnp.stack([b, sign + y * y * a, -y], axis=-1)
    return u, v, w_hat


def basis_local(u, v, w, a: jnp.ndarray) -> jnp.ndarray:
    """a.x*u + a.y*v + a.z*w  (``OrthNormBasis::local``, vec3.rs:69-72)."""
    return a[..., 0:1] * u + a[..., 1:2] * v + a[..., 2:3] * w


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection (``material/mod.rs:150-152``)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, ratio: jnp.ndarray):
    """Snell refraction (``material/mod.rs:154-163``).

    Returns (refracted_dir, total_internal_reflection_mask). The direction is
    garbage (but finite) where TIR is true — callers must select it away.
    """
    cos_theta = jnp.minimum(-dot(uv, n), 1.0)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    tir = ratio * sin_theta > 1.0
    r_out_ortho = ratio[..., None] * (uv + cos_theta[..., None] * n)
    k = jnp.abs(1.0 - length_sq(r_out_ortho))
    r_out_para = -safe_sqrt(k)[..., None] * n
    return r_out_ortho + r_out_para, tir


def schlick(cosine: jnp.ndarray, ref_idx) -> jnp.ndarray:
    """Schlick reflectance (``material/mod.rs:165-169``).

    NOTE: the reference calls this with the *unoriented* ``self.ir`` even for
    exit rays (``material/mod.rs:130``) — we replicate that at the call site.
    """
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0s = r0 * r0
    return r0s + (1.0 - r0s) * (1.0 - cosine) ** 5
