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

The implementation is COMPONENT FORM (``scatter_and_emit_c``: dense ``(R,)``
lanes — TPU XLA pads a trailing 3-axis to 128 vector lanes, so the wavefront
hot paths never materialize ``(R, 3)``); :func:`scatter_and_emit` is the thin
array wrapper used by the oracle/XLA integrator.

Family pruning is static (scene.has_metal / has_dielectric / has_isotropic,
models/compile.py): a Cornell box never computes the fuzz-ball sampler or the
Schlick/refract subgraph — the equivalent of the reference only calling the
dyn Material actually hit. Draws are site-addressed (not sequential), so
skipping an absent family's draws cannot shift any other stream.

RNG draws are checkpoint-named ('rt_rng'): under the replay remat policy
(ops/replay.py) the backward pass stores these few dense tensors instead of
re-deriving their transcendental chains — they have no parameter
dependencies, so recomputing them is pure waste.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import NEAR_ZERO_EPS
from ..models.scene import DIELECTRIC, DIFFUSE_LIGHT, ISOTROPIC, LAMBERTIAN, METAL
from . import hashrng
from . import linalg as la
from .textures import texture_value_c
from .tgather import tgather


class Scatter(NamedTuple):
    direction: jnp.ndarray  # (R,3) new ray direction
    attenuation: jnp.ndarray  # (R,3)
    scattered: jnp.ndarray  # (R,) bool — False = absorbed / pure emitter
    emitted: jnp.ndarray  # (R,3)


class ScatterC(NamedTuple):
    """Component-form scatter result: ten dense (R,) lanes."""

    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    ar: jnp.ndarray
    ag: jnp.ndarray
    ab: jnp.ndarray
    scattered: jnp.ndarray
    er: jnp.ndarray
    eg: jnp.ndarray
    eb: jnp.ndarray


def scatter_and_emit_c(scene, rngb, d_in_x, d_in_y, d_in_z,
                       nx, ny, nz, front_face, mat_id, u, v,
                       px, py, pz) -> ScatterC:
    """Component-form material evaluation for rays with hit components.

    ``rngb`` is the per-bounce CounterRng scope (ops/hashrng.py); the draw
    sites here mirror the megakernel's exactly, so both paths consume
    identical random streams.
    """
    dtype = d_in_x.dtype
    # int lookups via tgather too — its TPU lowering avoids XLA's
    # nondeterministic serial gather (ops/lanegather.py)
    mtype = tgather(scene.mat_type, mat_id)
    tex_id = tgather(scene.mat_tex, mat_id)

    uvx, uvy, uvz = rngb.unit_vector(hashrng.SITE_SCATTER_Z,
                                     hashrng.SITE_SCATTER_PHI)
    uvx = checkpoint_name(uvx.astype(dtype), "rt_rng")
    uvy = checkpoint_name(uvy.astype(dtype), "rt_rng")
    uvz = checkpoint_name(uvz.astype(dtype), "rt_rng")

    tex_r, tex_g, tex_b = texture_value_c(scene, tex_id, u, v, px, py, pz)

    # --- Lambertian (material.rs:26-42)
    ldx, ldy, ldz = nx + uvx, ny + uvy, nz + uvz
    near_zero = ((jnp.abs(ldx) < NEAR_ZERO_EPS)
                 & (jnp.abs(ldy) < NEAR_ZERO_EPS)
                 & (jnp.abs(ldz) < NEAR_ZERO_EPS))
    ldx = jnp.where(near_zero, nx, ldx)
    ldy = jnp.where(near_zero, ny, ldy)
    ldz = jnp.where(near_zero, nz, ldz)

    is_metal = mtype == METAL
    is_diel = mtype == DIELECTRIC
    is_light = mtype == DIFFUSE_LIGHT
    is_iso = mtype == ISOTROPIC

    if scene.has_metal or scene.has_dielectric:
        inv_len = 1.0 / jnp.maximum(
            jnp.sqrt(d_in_x * d_in_x + d_in_y * d_in_y + d_in_z * d_in_z),
            1e-30)
        udx, udy, udz = d_in_x * inv_len, d_in_y * inv_len, d_in_z * inv_len
        rdot = udx * nx + udy * ny + udz * nz
        rlx = udx - 2.0 * rdot * nx  # reflect (vec3.rs:91-93)
        rly = udy - 2.0 * rdot * ny
        rlz = udz - 2.0 * rdot * nz

    dir_x, dir_y, dir_z = ldx, ldy, ldz
    if scene.has_isotropic:
        # Isotropic (material.rs:132-138): fresh uniform direction.
        dir_x = jnp.where(is_iso, uvx, dir_x)
        dir_y = jnp.where(is_iso, uvy, dir_y)
        dir_z = jnp.where(is_iso, uvz, dir_z)
    if scene.has_dielectric:
        # Dielectric (material.rs:80-104)
        coin = checkpoint_name(
            rngb.uniform(hashrng.SITE_SCHLICK).astype(dtype), "rt_rng")
        ir = tgather(scene.mat_ir, mat_id)
        ratio = jnp.where(front_face, 1.0 / ir, ir)
        cos_theta = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
        sin_sq = 1.0 - cos_theta * cos_theta
        sin_theta = jnp.sqrt(jnp.where(sin_sq > 0, sin_sq, 1.0)) * (sin_sq > 0)
        cannot_refract = ratio * sin_theta > 1.0
        r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2  # Schlick (material.rs:74-78)
        reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
        do_reflect = cannot_refract | (reflectance > coin)
        # refract (vec3.rs:96-101) with the TIR-boundary grad guard
        rpx = ratio * (udx + cos_theta * nx)
        rpy = ratio * (udy + cos_theta * ny)
        rpz = ratio * (udz + cos_theta * nz)
        s = jnp.abs(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz))
        ok = s > 1e-20
        par = -jnp.sqrt(jnp.where(ok, s, 1.0)) * ok
        rfx = rpx + par * nx
        rfy = rpy + par * ny
        rfz = rpz + par * nz
        dir_x = jnp.where(is_diel, jnp.where(do_reflect, rlx, rfx), dir_x)
        dir_y = jnp.where(is_diel, jnp.where(do_reflect, rly, rfy), dir_y)
        dir_z = jnp.where(is_diel, jnp.where(do_reflect, rlz, rfz), dir_z)
    if scene.has_metal:
        # Metal (material.rs:53-64)
        fx, fy, fz = rngb.in_unit_sphere(hashrng.SITE_FUZZ_Z,
                                         hashrng.SITE_FUZZ_PHI,
                                         hashrng.SITE_FUZZ_R)
        fx = checkpoint_name(fx.astype(dtype), "rt_rng")
        fy = checkpoint_name(fy.astype(dtype), "rt_rng")
        fz = checkpoint_name(fz.astype(dtype), "rt_rng")
        fuzz = tgather(scene.mat_fuzz, mat_id)
        mdx = rlx + fuzz * fx
        mdy = rly + fuzz * fy
        mdz = rlz + fuzz * fz
        metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0
        dir_x = jnp.where(is_metal, mdx, dir_x)
        dir_y = jnp.where(is_metal, mdy, dir_y)
        dir_z = jnp.where(is_metal, mdz, dir_z)

    ar, ag, ab = tex_r, tex_g, tex_b
    if scene.has_metal:
        ar = jnp.where(is_metal, tgather(scene.mat_albedo[:, 0], mat_id), ar)
        ag = jnp.where(is_metal, tgather(scene.mat_albedo[:, 1], mat_id), ag)
        ab = jnp.where(is_metal, tgather(scene.mat_albedo[:, 2], mat_id), ab)
    if scene.has_dielectric:
        one = jnp.ones_like(ar)
        ar = jnp.where(is_diel, one, ar)
        ag = jnp.where(is_diel, one, ag)
        ab = jnp.where(is_diel, one, ab)

    scattered = ~is_light
    if scene.has_metal:
        scattered = jnp.where(is_metal, metal_ok, scattered)

    # Emission (material.rs:114-122): only DiffuseLight, ignores front_face.
    # Statically pruned like the other families: a lightless scene (sky
    # backgrounds) emits constant zeros and XLA drops the selects entirely.
    zero = jnp.zeros_like(ar)
    if scene.has_lights:
        er = jnp.where(is_light, tex_r, zero)
        eg = jnp.where(is_light, tex_g, zero)
        eb = jnp.where(is_light, tex_b, zero)
    else:
        er = eg = eb = zero

    return ScatterC(dir_x, dir_y, dir_z, ar, ag, ab, scattered, er, eg, eb)


def scatter_and_emit(scene, rngb, d_in, hit) -> Scatter:
    """Array wrapper over :func:`scatter_and_emit_c` for the ``[..., 3]``
    integrator path — values are identical to the component path bitwise
    (same per-lane arithmetic; stacking does not round)."""
    s = scatter_and_emit_c(
        scene, rngb, d_in[..., 0], d_in[..., 1], d_in[..., 2],
        hit.normal[..., 0], hit.normal[..., 1], hit.normal[..., 2],
        hit.front_face, hit.mat_id, hit.u, hit.v,
        hit.p[..., 0], hit.p[..., 1], hit.p[..., 2])
    return Scatter(
        direction=jnp.stack([s.dx, s.dy, s.dz], axis=-1),
        attenuation=jnp.stack([s.ar, s.ag, s.ab], axis=-1),
        scattered=s.scattered,
        emitted=jnp.stack([s.er, s.eg, s.eb], axis=-1),
    )
