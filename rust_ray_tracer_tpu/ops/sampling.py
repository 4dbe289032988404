"""Direction sampling and PDF evaluation (batched, branchless).

Counterpart of ``/root/reference/src/pdf.rs`` plus the light-geometry
sampling routines (``sphere.rs:101-119,217-228``, ``aarect.rs:123-143``).

The reference's ``MixturePDF`` recursion over ``Arc<dyn PDF>`` becomes:
sample both components for every ray, select by a coin, and evaluate the
mixture pdf in closed form. The light list (``HittablePDF`` over
``Hittables``) averages per-light pdfs and picks a light uniformly for
sampling — including the reference's quirk that only ``Sphere`` and
``XZRect`` implement sampling; all other hittables in a light list fall back
to the trait defaults pdf=0 / dir=(1,0,0) (``geometry/mod.rs:56-61``), which
we encode as LIGHT_NULL.
"""

from __future__ import annotations

import jax.numpy as jnp

from rust_ray_tracer_tpu.models.scene import LIGHT_QUAD, LIGHT_SPHERE
from rust_ray_tracer_tpu.ops import linalg as la

PI = jnp.pi


# ---------------------------------------------------------------------------
# Elementary samplers
# ---------------------------------------------------------------------------

def cosine_direction_local(u1, u2):
    """Cosine-weighted hemisphere sample in the local frame (pdf.rs:14-26)."""
    z = la.safe_sqrt(1.0 - u2)
    phi = 2.0 * PI * u1
    sr2 = la.safe_sqrt(u2)
    return jnp.stack([jnp.cos(phi) * sr2, jnp.sin(phi) * sr2, z], axis=-1)


def cosine_sample(normal, u1, u2):
    """World-space cosine sample about ``normal`` (CosinePDF::generate)."""
    u, v, w = la.orthonormal_basis(normal)
    return la.basis_local(u, v, w, cosine_direction_local(u1, u2))


def cosine_pdf_value(normal, direction):
    """max(cos(n, d)/pi, 0) (pdf.rs:43-46)."""
    cosine = la.dot(la.normalize(direction), la.normalize(normal))
    return jnp.maximum(cosine / PI, 0.0)


def uniform_in_ball(g3, u):
    """Uniform point in the unit ball — the exact distribution of the
    reference's rejection loop (vec3.rs:18-25) computed in closed form:
    isotropic direction (3 gaussians) times radius ~ U^(1/3)."""
    dirs = la.normalize(g3)
    r = jnp.cbrt(u)
    return dirs * r[..., None]


def random_to_sphere(radius, dist_sq, u1, u2):
    """Cone sample toward a sphere, local frame (sphere.rs:217-228)."""
    cos_max = la.safe_sqrt(1.0 - la.safe_div(radius * radius, dist_sq))
    z = 1.0 + u2 * (cos_max - 1.0)
    phi = 2.0 * PI * u1
    s = la.safe_sqrt(1.0 - z * z)
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s, z], axis=-1)


# ---------------------------------------------------------------------------
# Light list (HittablePDF over Hittables)
# ---------------------------------------------------------------------------

def _sphere_light_pdf(center, radius, origin, direction):
    """Solid-angle pdf if the ray hits the sphere, else 0
    (sphere.rs:101-112)."""
    oc = origin - center
    a = la.length_sq(direction)
    b = la.dot(oc, direction)
    cc = la.length_sq(oc) - radius * radius
    disc = b * b - a * cc
    sq = la.safe_sqrt(disc)
    root1 = la.safe_div(-b - sq, a)
    root2 = la.safe_div(-b + sq, a)
    hits = (disc > 0.0) & ((root1 >= 1e-4) | (root2 >= 1e-4))
    dist_sq = la.length_sq(center - origin)
    cos_max = la.safe_sqrt(1.0 - la.safe_div(radius * radius, dist_sq))
    solid_angle = 2.0 * PI * (1.0 - cos_max)
    return jnp.where(hits, la.safe_div(1.0, solid_angle), 0.0)


def _quad_light_pdf(q, u_e, v_e, origin, direction):
    """Area-light pdf dist^2/(cos*area) if the ray hits (aarect.rs:123-132;
    generalized from XZRect to any parallelogram — identical for XZRects)."""
    from rust_ray_tracer_tpu.ops.intersect import _quad_quants

    t, alpha, beta, n, denom, _p = _quad_quants(origin, direction, q, u_e, v_e)
    # the reference uses t_min 0.001 here, unlike the world's 1e-4
    hits = ((t >= 0.001) & jnp.isfinite(t)
            & (alpha >= 0.0) & (alpha <= 1.0)
            & (beta >= 0.0) & (beta <= 1.0))
    area = la.length(n)
    d_len_sq = la.length_sq(direction)
    dist_sq = t * t * d_len_sq
    n_hat = la.normalize(n)
    cosine = jnp.abs(la.dot(direction, n_hat)) / jnp.maximum(
        la.safe_sqrt(d_len_sq), 1e-20)
    return jnp.where(hits, la.safe_div(dist_sq, cosine * area), 0.0)


def lights_pdf_value(scene, origin, direction):
    """Uniform-mixture pdf over the light list (geometry/mod.rs:111-120).

    origin, direction: [C,3]. Returns [C]. Scene must have n_lights > 0.
    """
    nl = scene.n_lights
    o = origin[:, None, :]
    d = direction[:, None, :]
    pdf_s = _sphere_light_pdf(scene.light_c[None], scene.light_r[None], o, d)
    pdf_q = _quad_light_pdf(scene.light_q[None], scene.light_u[None],
                            scene.light_v[None], o, d)
    kind = scene.light_kind[None]
    per_light = jnp.where(kind == LIGHT_SPHERE, pdf_s,
                          jnp.where(kind == LIGHT_QUAD, pdf_q, 0.0))
    return jnp.mean(per_light, axis=1)


def lights_sample(scene, origin, pick_u, u1, u2):
    """Direction toward a uniformly chosen light (geometry/mod.rs:122-125).

    origin [C,3]; pick_u/u1/u2 [C] uniforms. Returns [C,3] (unnormalized).
    """
    nl = scene.n_lights
    idx = jnp.minimum((pick_u * nl).astype(jnp.int32), nl - 1)
    kind = scene.light_kind[idx]

    # sphere: cone sample toward the center (sphere.rs:114-119)
    center = scene.light_c[idx]
    radius = scene.light_r[idx]
    to_c = center - origin
    dist_sq = la.length_sq(to_c)
    bu, bv, bw = la.orthonormal_basis(to_c)
    dir_sphere = la.basis_local(bu, bv, bw,
                                random_to_sphere(radius, dist_sq, u1, u2))

    # quad: uniform point on the parallelogram (aarect.rs:134-143)
    point = (scene.light_q[idx] + u1[:, None] * scene.light_u[idx]
             + u2[:, None] * scene.light_v[idx])
    dir_quad = point - origin

    # null: the Hittable::random default (1,0,0) (geometry/mod.rs:59-61)
    dir_null = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], origin.dtype),
                                origin.shape)

    return jnp.where((kind == LIGHT_SPHERE)[:, None], dir_sphere,
                     jnp.where((kind == LIGHT_QUAD)[:, None], dir_quad,
                               dir_null))
