"""Wavefront path-tracing integrator: ``lax.scan`` over bounce depth.

The reference integrator is the recursion ``ray_color`` (src/renderer.rs:139-155)
whose radiance is the product-sum L = E0 + A0*(E1 + A1*(...)). The iterative
reformulation carried through the scan (exact — see SURVEY.md §3.4):

    carry = (origin, direction, throughput, radiance, alive)
    per step: radiance += throughput * emitted        (renderer.rs:145)
              miss     -> radiance += throughput * background; kill
              absorb   -> kill                        (scatter None, :150)
              else       throughput *= attenuation; advance ray (:148)
    depth exhausted with live rays -> contributes nothing (black, :140-142)

Ray time is fixed per sample across all bounces (scattered rays inherit it —
material.rs ``with_time(ray.time)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import hashrng, intersect
from . import linalg as la
from .materials import scatter_and_emit

# Scale-aware secondary-ray origin offset (f32 self-intersection guard).
_ORIGIN_EPS_ABS = 1e-4
_ORIGIN_EPS_REL = 2e-4


def trace(scene, origin, direction, time, rng_idx, max_depth: int,
          closest_hit_fn=None, remat: bool = False,
          with_occupancy: bool = False):
    """Trace a flat batch of rays to completion.

    Args:
      scene: CompiledScene.
      origin, direction: (R,3); time: (R,).
      rng_idx: ``(seed, pixel_ids, sample)`` address prefix for the
        counter-based RNG (ops/hashrng.py); the per-bounce scope is
        ``CounterRng(seed, pixel_id, sample, bounce)``, making every draw a
        pure function of its address — renders are bitwise independent of
        chunking/mesh shape and share streams with the Pallas megakernel.
      max_depth: static bounce budget (reference camera.max_depth).
      closest_hit_fn: optional override for the closest-hit kernel
        (e.g. the BVH traversal path); defaults to brute force.
      remat: rematerialize each bounce in reverse-mode autodiff — backward
        recomputes the (rays x primitives) intersection instead of storing it,
        trading FLOPs for HBM (jax.checkpoint over the scan step).

    Returns:
      radiance (R,3), bounces_used (R,) int32 — number of scene queries each
      ray performed (for rays/s accounting). With ``with_occupancy``, also a
      (max_depth,) int32 vector of live-ray counts entering each bounce — the
      wavefront-divergence telemetry of SURVEY.md §7 (hard part #1).
    """
    R = origin.shape[0]
    dtype = origin.dtype
    hit_fn = closest_hit_fn or intersect.closest_hit
    seed, pixel_ids, sample = rng_idx

    # init values derived from the inputs (ones_like/zeros_like) so their
    # device-varying type matches the step outputs under shard_map
    init = (
        origin,
        direction,
        jnp.ones_like(origin),  # throughput
        jnp.zeros_like(origin),  # radiance
        time < jnp.inf,  # alive (all True)
        jnp.zeros_like(time, dtype=jnp.int32),  # bounce counter
    )

    def step(carry, depth_i):
        o, d, tp, rad, alive, nb = carry
        rngb = hashrng.CounterRng(seed, pixel_ids, sample, depth_i)
        n_live = jnp.sum(alive.astype(jnp.int32))

        hit = hit_fn(scene, o, d, time, rngb)
        nb = nb + alive.astype(jnp.int32)

        miss = alive & ~hit.hit
        rad = rad + jnp.where(miss[:, None], tp * scene.background, 0.0)

        s = scatter_and_emit(scene, rngb, d, hit)
        live_hit = alive & hit.hit
        rad = rad + jnp.where(live_hit[:, None], tp * s.emitted, 0.0)

        scat = live_hit & s.scattered
        tp = jnp.where(scat[:, None], tp * s.attenuation, tp)

        # f32 robustness (SURVEY.md §7 "f32 vs f64"): the reference leans on
        # f64 + t_min=0.001 (renderer.rs:144) to avoid self-intersection; at
        # f32 and Cornell's 555-unit scale that loses bounces to false
        # self-hits. Offset the new origin along the geometric normal, signed
        # by which side the scattered ray leaves (refraction goes through),
        # with a scale-aware epsilon. Media scatter mid-flight: no offset.
        side = jnp.sign(la.dot(s.direction, hit.normal))[:, None]
        scale = jnp.max(jnp.abs(hit.p), axis=-1, keepdims=True)
        eps = _ORIGIN_EPS_ABS + _ORIGIN_EPS_REL * scale
        new_o = hit.p + jnp.where(hit.is_surface[:, None],
                                  side * hit.normal * eps, 0.0)

        o = jnp.where(scat[:, None], new_o, o)
        d = jnp.where(scat[:, None], s.direction, d)
        alive = scat
        return (o, d, tp, rad, alive, nb), n_live

    depths = jnp.arange(max_depth, dtype=jnp.int32)
    step_fn = jax.checkpoint(step) if remat else step
    (o, d, tp, rad, alive, nb), occ = jax.lax.scan(step_fn, init, depths)
    # Depth exhausted -> black contribution (renderer.rs:140-142): nothing to add.
    if with_occupancy:
        return rad, nb, occ
    return rad, nb
