"""Branchless material shading + scatter sampling for one wavefront bounce.

Counterpart of ``/root/reference/src/material/mod.rs`` (the five materials)
and the scatter/PDF plumbing inside ``ray_color`` (``ray.rs:90-120``). The
reference virtual-dispatches per hit; on a vector machine we evaluate every
material's response for every ray and select by the gathered material kind —
five kinds is far cheaper than sorting rays by material.

Estimator mapping (recursive -> iterative): ``ray_color`` computes
``emitted + scattering_pdf * attenuation * L(next) / pdf`` for diffuse and
``attenuation * L(next)`` for specular (ray.rs:93-120). Iteratively the
integrator carries per-ray throughput ``beta`` and accumulates
``L += beta * emitted``; this module returns per-bounce (emitted, weight,
new direction, continue-mask) where ``weight`` is the factor multiplying
``beta``.

Gradient discipline (detached sampling): randomly *sampled* directions
(cosine / light / fuzz ball / isotropic ball draws) are detached, while
deterministic specular transforms (mirror reflection, Snell refraction) stay
attached — so material, camera and vertex gradients flow through BSDF values,
pdf evaluations and specular chains, and never through the sampling decisions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rust_ray_tracer_tpu.models.scene import (
    MAT_DIELECTRIC, MAT_ISOTROPIC, MAT_LAMBERTIAN, MAT_LIGHT, MAT_METAL)
from rust_ray_tracer_tpu.ops import linalg as la
from rust_ray_tracer_tpu.ops import sampling
from rust_ray_tracer_tpu.ops.texture import texture_value
from rust_ray_tracer_tpu.utils import rng as rngu

PDF_FLOOR = 1e-5  # ray.rs:112


class Scatter(NamedTuple):
    emitted: jnp.ndarray    # [C,3] radiance emitted at the hit
    weight: jnp.ndarray     # [C,3] multiplicative throughput factor
    direction: jnp.ndarray  # [C,3] next ray direction
    alive: jnp.ndarray      # [C] continue tracing?


def _rust_max_floor(pdf):
    """pdf.max(1e-5) with Rust's NaN semantics: f32::max(NaN, x) == x
    (ray.rs:112) — a NaN pdf clamps to the floor instead of propagating."""
    return jnp.where(pdf > PDF_FLOOR, pdf, PDF_FLOOR)


def shade(scene, key, d_in, time, hit) -> Scatter:
    """One bounce of material evaluation for rays that hit something.

    Args:
      scene: SceneData.
      key: per-(wave, chunk, bounce) PRNG key.
      d_in: [C,3] incoming (unnormalized) ray directions.
      time: [C] ray times (unused by materials, kept by scattered rays).
      hit: intersect.Hit for these rays.

    Outputs are only meaningful where ``hit.hit``; the integrator masks.
    """
    c = d_in.shape[0]
    f32 = d_in.dtype
    kind = scene.mat_kind[hit.mat]
    tex = scene.mat_tex[hit.mat]
    # one packed float gather (-> one scatter-add in backward)
    mat_pack = jnp.stack([scene.mat_fuzz, scene.mat_ior], axis=1)[hit.mat]
    albedo = texture_value(scene, tex, hit.u, hit.v, hit.p)
    normal = hit.normal
    unit_d = la.normalize(d_in)

    # ---- random draws: all streams drawn unconditionally, consumed by
    # kind. One uniform block + one normal block instead of seven keyed
    # draws — each threefry invocation costs a separate hash sweep, and
    # the per-bounce draw count is fixed, so column slices of a single
    # block keep the same determinism guarantees (keyed on the same
    # (wave, chunk, bounce) coordinate).
    ub = jax.random.uniform(rngu.stream(key, rngu.SCATTER), (c, 7),
                            dtype=f32)
    gb = jax.random.normal(rngu.stream(key, rngu.FUZZ), (c, 8), dtype=f32)
    u_scatter = ub[:, 0:2]
    u_coin = ub[:, 2]
    u_mix = ub[:, 3]
    u_pick = ub[:, 4]
    u_light = ub[:, 5:7]
    g_fuzz = gb[:, 0:4]
    g_iso = gb[:, 4:8]

    # =======================================================================
    # Lambertian (material/mod.rs:47-84) + the ray_color mixture
    # (ray.rs:102-120)
    # =======================================================================
    cos_dir = sampling.cosine_sample(normal, u_scatter[:, 0], u_scatter[:, 1])
    if scene.n_lights:
        light_dir = sampling.lights_sample(scene, hit.p, u_pick,
                                           u_light[:, 0], u_light[:, 1])
        lam_dir = jnp.where((u_mix < 0.5)[:, None], cos_dir, light_dir)
        lam_dir = lax.stop_gradient(lam_dir)
        pdf = (0.5 * sampling.cosine_pdf_value(normal, lam_dir)
               + 0.5 * sampling.lights_pdf_value(scene, hit.p, lam_dir))
    else:
        lam_dir = lax.stop_gradient(cos_dir)
        pdf = sampling.cosine_pdf_value(normal, lam_dir)
    pdf = _rust_max_floor(pdf)
    # scattering_pdf = max(cos(n, scattered)/pi, 0) (material/mod.rs:80-83)
    spdf = jnp.maximum(
        la.dot(normal, la.normalize(lam_dir)) / jnp.pi, 0.0)
    lam_weight = albedo * (spdf / pdf)[:, None]

    # =======================================================================
    # Metal (material/mod.rs:86-108)
    # =======================================================================
    reflected = la.reflect(unit_d, normal)
    fuzz = mat_pack[:, 0]
    fuzz_vec = lax.stop_gradient(
        sampling.uniform_in_ball(g_fuzz[:, :3], g_fuzz[:, 3]))
    metal_dir = reflected + fuzz[:, None] * fuzz_vec
    metal_ok = la.dot(metal_dir, normal) > 0.0   # else absorbed (mod.rs:99)

    # =======================================================================
    # Dielectric (material/mod.rs:110-148)
    # =======================================================================
    ior = mat_pack[:, 1]
    exiting = la.dot(d_in, normal) > 0.0
    ratio = jnp.where(exiting, ior, 1.0 / ior)
    n_orient = jnp.where(exiting[:, None], -normal, normal)
    cos_theta = jnp.minimum(-la.dot(unit_d, n_orient), 1.0)
    refracted, tir = la.refract(unit_d, n_orient, ratio)
    # QUIRK (replicated): Schlick is fed the unoriented self.ir even for
    # exit rays (mod.rs:130).
    reflect_prob = la.schlick(cos_theta, ior)
    do_reflect = tir | (reflect_prob >= u_coin)
    # reflect() is sign(n)-invariant, so using the outward normal matches
    # the reference's reflect(unit_d, rec.normal) (mod.rs:141).
    diel_dir = jnp.where(do_reflect[:, None], la.reflect(unit_d, normal),
                         refracted)

    # =======================================================================
    # DiffuseLight (material/mod.rs:171-194): emit on front face only
    # =======================================================================
    front = la.dot(d_in, normal) < 0.0
    emitted = jnp.where(((kind == MAT_LIGHT) & front)[:, None], albedo, 0.0)

    # =======================================================================
    # Isotropic (material/mod.rs:196-216): uniform-ball specular scatter
    # =======================================================================
    iso_dir = lax.stop_gradient(
        sampling.uniform_in_ball(g_iso[:, :3], g_iso[:, 3]))

    # ---- select by material kind -----------------------------------------
    one3 = jnp.ones((c, 3), f32)
    direction = jnp.where((kind == MAT_LAMBERTIAN)[:, None], lam_dir,
                jnp.where((kind == MAT_METAL)[:, None], metal_dir,
                jnp.where((kind == MAT_DIELECTRIC)[:, None], diel_dir,
                jnp.where((kind == MAT_ISOTROPIC)[:, None], iso_dir,
                          one3))))
    weight = jnp.where((kind == MAT_LAMBERTIAN)[:, None], lam_weight,
             jnp.where((kind == MAT_METAL)[:, None], albedo,
             jnp.where((kind == MAT_DIELECTRIC)[:, None], one3,
             jnp.where((kind == MAT_ISOTROPIC)[:, None], albedo,
                       jnp.zeros((c, 3), f32)))))
    alive = jnp.where(kind == MAT_METAL, metal_ok, kind != MAT_LIGHT)

    return Scatter(emitted=emitted, weight=weight, direction=direction,
                   alive=alive)
