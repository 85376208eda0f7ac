"""Branchless material response: scatter + emission over a type-coded table.

Reference trait ``Material::{scatter, emitted}`` (src/material.rs:11-16) with
dynamic dispatch per hit; here all five material families are computed
vectorized and selected by type code — the TPU-native form of the reference's
``dyn Material`` (SURVEY.md §1).

Fidelity notes (see SURVEY.md fidelity traps):
- Lambertian: normal + random_unit_vector with near-zero fallback to the
  normal (material.rs:26-42, vec3.rs near_zero eps 1e-8);
- Metal: mirror of the *normalized* incoming direction + fuzz * point in unit
  ball; absorbed when the fuzzed ray dips below the surface (material.rs:53-64);
- Dielectric: Schlick reflectance coin + total internal reflection, unit
  attenuation (material.rs:74-104);
- DiffuseLight: never scatters, emits its texture unconditionally of
  front_face (material.rs:114-122, renderer.rs:145);
- Isotropic: uniform sphere phase function (material.rs:132-138).
All scattered rays inherit the parent ray's time (material.rs `with_time`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import NEAR_ZERO_EPS
from ..models.scene import DIELECTRIC, DIFFUSE_LIGHT, ISOTROPIC, LAMBERTIAN, METAL
from . import hashrng
from . import linalg as la
from .textures import texture_value


class Scatter(NamedTuple):
    direction: jnp.ndarray  # (R,3) new ray direction
    attenuation: jnp.ndarray  # (R,3)
    scattered: jnp.ndarray  # (R,) bool — False = absorbed / pure emitter
    emitted: jnp.ndarray  # (R,3)


def scatter_and_emit(scene, rngb, d_in, hit) -> Scatter:
    """Evaluate all material families for rays with hit records ``hit``.

    ``rngb`` is the per-bounce CounterRng scope (ops/hashrng.py); the draw
    sites here mirror the megakernel's exactly, so both paths consume
    identical random streams."""
    dtype = d_in.dtype
    R = d_in.shape[0]
    mtype = scene.mat_type[hit.mat_id]
    tex_id = scene.mat_tex[hit.mat_id]

    unit_vec = jnp.stack(
        rngb.unit_vector(hashrng.SITE_SCATTER_Z, hashrng.SITE_SCATTER_PHI),
        axis=-1).astype(dtype)
    fuzz_vec = jnp.stack(
        rngb.in_unit_sphere(hashrng.SITE_FUZZ_Z, hashrng.SITE_FUZZ_PHI,
                            hashrng.SITE_FUZZ_R),
        axis=-1).astype(dtype)
    coin = rngb.uniform(hashrng.SITE_SCHLICK).astype(dtype)

    n = hit.normal
    tex_val = texture_value(scene, tex_id, hit.u, hit.v, hit.p)

    # --- Lambertian (material.rs:26-42)
    lam_dir = n + unit_vec
    near_zero = jnp.all(jnp.abs(lam_dir) < NEAR_ZERO_EPS, axis=-1)
    lam_dir = jnp.where(near_zero[:, None], n, lam_dir)

    # --- Metal (material.rs:53-64)
    d_unit = la.normalize(d_in, eps=1e-30)
    fuzz = scene.mat_fuzz[hit.mat_id]
    metal_dir = la.reflect(d_unit, n) + fuzz[:, None] * fuzz_vec
    metal_ok = la.dot(metal_dir, n) > 0.0

    # --- Dielectric (material.rs:80-104)
    ir = scene.mat_ir[hit.mat_id]
    ratio = jnp.where(hit.front_face, 1.0 / ir, ir)
    cos_theta = jnp.minimum(la.dot(-d_unit, n), 1.0)
    sin_sq = 1.0 - cos_theta * cos_theta
    sin_theta = jnp.sqrt(jnp.where(sin_sq > 0, sin_sq, 1.0)) * (sin_sq > 0)
    cannot_refract = ratio * sin_theta > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2  # Schlick (material.rs:74-78)
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    do_reflect = cannot_refract | (reflectance > coin)
    diel_dir = jnp.where(
        do_reflect[:, None],
        la.reflect(d_unit, n),
        la.refract(d_unit, n, ratio),
    )

    # --- Isotropic (material.rs:132-138): fresh uniform direction.
    iso_dir = unit_vec

    is_lam = mtype == LAMBERTIAN
    is_metal = mtype == METAL
    is_diel = mtype == DIELECTRIC
    is_light = mtype == DIFFUSE_LIGHT
    is_iso = mtype == ISOTROPIC

    direction = jnp.where(
        is_lam[:, None],
        lam_dir,
        jnp.where(
            is_metal[:, None],
            metal_dir,
            jnp.where(is_diel[:, None], diel_dir, iso_dir),
        ),
    )

    attenuation = jnp.where(
        is_metal[:, None],
        scene.mat_albedo[hit.mat_id],
        jnp.where(is_diel[:, None], jnp.ones((R, 3), dtype), tex_val),
    )

    scattered = jnp.where(is_metal, metal_ok, ~is_light)

    # Emission (material.rs:114-122): only DiffuseLight, ignores front_face.
    emitted = jnp.where(is_light[:, None], tex_val, jnp.zeros((R, 3), dtype))

    return Scatter(direction=direction, attenuation=attenuation,
                   scattered=scattered, emitted=emitted)
