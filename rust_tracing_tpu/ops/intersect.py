"""Closest-hit kernels: brute-force vectorized sphere/quad/media intersection.

TPU-native redesign of the reference's polymorphic ``Hittable::hit`` dispatch
(src/hittable.rs:45-79): each primitive *type* is intersected as one batched
array op over (rays x primitives); the winner is a masked argmin. Constant
media (src/constant_medium.rs:34-71) are handled with closed-form entry/exit
of their convex boundaries instead of re-walking the scene twice per query.

The brute-force path is the workhorse for small scenes (Cornell box has 18
quads; most scenes are < 1k primitives) where divergent tree traversal would
waste a lockstep vector machine. Large scenes use the BVH path in
``bvh_traverse.py``.

Semantics preserved from the reference (see SURVEY.md fidelity traps):
- shadow epsilon t_min = 0.001 (renderer.rs:144);
- sphere root selection tries the near root then the far root with *strict*
  interval bounds (sphere.rs:59-89);
- quad parallel-ray rejection |denom| < 1e-8, inside test on [0,1]^2, no
  back-face culling (quad.rs:96-133);
- moving sphere center lerped by ray time (sphere.rs:53-55,60-64);
- sphere UV from the outward normal (sphere.rs:48-52), quad UV = (alpha, beta)
  (quad.rs:131);
- normal always flipped toward the ray with front_face recorded
  (hittable.rs:22-37).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import T_MIN, QUAD_DENOM_EPS
from . import hashrng
from . import linalg as la

BIG = jnp.inf


class Hit(NamedTuple):
    """Vectorized HitRecord (reference: src/hittable.rs:11-19)."""

    hit: jnp.ndarray  # (R,) bool — any surface or medium hit
    t: jnp.ndarray  # (R,)
    p: jnp.ndarray  # (R,3)
    normal: jnp.ndarray  # (R,3) — flipped toward the ray
    front_face: jnp.ndarray  # (R,) bool
    mat_id: jnp.ndarray  # (R,) int32
    u: jnp.ndarray  # (R,)
    v: jnp.ndarray  # (R,)
    is_surface: jnp.ndarray  # (R,) bool — False for medium scatter events


def _safe_div(a, b, eps=1e-30):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def _safe_sqrt(x, valid):
    """sqrt with NaN-free gradients: lanes where ``valid`` is False compute
    sqrt(1) so reverse-mode never sees d/dx sqrt(0) = inf (the classic
    where/sqrt autodiff trap — the masked branch still backpropagates)."""
    return jnp.sqrt(jnp.where(valid, x, 1.0))


def sphere_closest(scene, origin, direction, time, t_max):
    """Closest valid sphere hit per ray.

    Returns (t (R,), idx (R,) int32). t == +inf where no sphere hit.
    reference: src/sphere.rs:59-89 with the moving-center lerp :60-64.

    Autodiff structure: the (R,S) search — which sphere wins and which root is
    taken — is DETACHED (stop_gradient; the selection is piecewise-constant in
    the scene parameters, SURVEY.md §7 "gradients through discrete events"),
    and the winner's t is recomputed from its gathered parameters, O(R). The
    backward pass therefore never transposes through the (rays x spheres)
    broadcast — the custom-VJP-shaped argmin that makes full-frame fwd+bwd
    tractable.
    """
    sg = jax.lax.stop_gradient
    # ---- detached discrete search over the full (R,S) candidate matrix
    o_, d_, t_ = sg(origin), sg(direction), sg(time)
    center_t = sg(scene.sph_center)[None, :, :] + (
        sg(scene.sph_cvec)[None, :, :] * t_[:, None, None]
    )
    oc = o_[:, None, :] - center_t
    a = la.length_squared(d_)[:, None]  # (R,1)
    half_b = jnp.sum(oc * d_[:, None, :], axis=-1)  # (R,S)
    c = la.length_squared(oc) - sg(scene.sph_radius**2)[None, :]
    disc = half_b * half_b - a * c
    sqrtd = _safe_sqrt(disc, disc > 0.0)

    root1 = _safe_div(-half_b - sqrtd, a)
    root2 = _safe_div(-half_b + sqrtd, a)
    # strict `surrounds` (interval.rs:44-46, used by sphere.rs:77-83)
    ok1 = (root1 > T_MIN) & (root1 < t_max[:, None])
    ok2 = (root2 > T_MIN) & (root2 < t_max[:, None])
    root = jnp.where(ok1, root1, root2)
    valid = (disc > 0.0) & (ok1 | ok2) & scene.sph_valid[None, :]

    t = jnp.where(valid, root, BIG)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    take = lambda arr: jnp.take_along_axis(arr, idx[:, None], axis=-1)[:, 0]
    has_hit = take(valid)
    far_root = ~take(ok1)

    # ---- differentiable O(R) recompute of the winner's t
    cw = scene.sph_center[idx] + scene.sph_cvec[idx] * time[:, None]
    ocw = origin - cw
    aw = la.length_squared(direction)
    hbw = la.dot(ocw, direction)
    cwq = la.length_squared(ocw) - scene.sph_radius[idx] ** 2
    discw = hbw * hbw - aw * cwq
    sqw = _safe_sqrt(discw, has_hit & (discw > 0))
    sign = jnp.where(far_root, 1.0, -1.0)
    t_w = _safe_div(-hbw + sign * sqw, aw)
    t_best = jnp.where(has_hit, t_w, BIG)
    return t_best, idx


def quad_closest(scene, origin, direction, time, t_max):
    """Closest valid quad hit per ray.

    Returns (t, idx, alpha, beta) with t == +inf on miss.
    reference: src/quad.rs:96-133 (no back-face culling, inclusive bounds).

    Same autodiff structure as sphere_closest: detached (R,Q) search,
    differentiable O(R) recompute of the winner's (t, alpha, beta).
    """
    sg = jax.lax.stop_gradient
    normal, d_plane, w = scene.quad_frame()  # (Q,3),(Q,),(Q,3)
    n_, dp_, w_ = sg(normal), sg(d_plane), sg(w)
    o_, d_ = sg(origin), sg(direction)
    # NB: 3-element contractions stay as explicit VPU multiply-sums — an
    # einsum would be lowered onto the MXU in bf16 (K=3 is MXU-hostile and
    # the precision loss at 555-unit scenes breaks hit tests).
    denom = jnp.sum(n_[None, :, :] * d_[:, None, :], axis=-1)
    n_dot_o = jnp.sum(n_[None, :, :] * o_[:, None, :], axis=-1)
    t = _safe_div(dp_[None, :] - n_dot_o, denom)

    p = o_[:, None, :] + t[..., None] * d_[:, None, :]
    planar = p - sg(scene.quad_q)[None, :, :]
    alpha = jnp.sum(w_[None, :, :] * la.cross(planar, sg(scene.quad_v)[None, :, :]), axis=-1)
    beta = jnp.sum(w_[None, :, :] * la.cross(sg(scene.quad_u)[None, :, :], planar), axis=-1)

    # inclusive `contains` (interval.rs:41-43, used by quad.rs:115)
    valid = (
        (jnp.abs(denom) >= QUAD_DENOM_EPS)
        & (t >= T_MIN)
        & (t <= t_max[:, None])
        & (alpha >= 0.0)
        & (alpha <= 1.0)
        & (beta >= 0.0)
        & (beta <= 1.0)
        & scene.quad_valid[None, :]
    )
    t = jnp.where(valid, t, BIG)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    take = lambda arr: jnp.take_along_axis(arr, idx[:, None], axis=-1)[:, 0]
    has_hit = take(valid)

    # ---- differentiable O(R) recompute for the winning quad
    nw = normal[idx]
    ww = w[idx]
    denw = la.dot(nw, direction)
    tw = _safe_div(d_plane[idx] - la.dot(nw, origin), denw)
    pw = origin + tw[:, None] * direction
    plw = pw - scene.quad_q[idx]
    alw = la.dot(ww, la.cross(plw, scene.quad_v[idx]))
    bew = la.dot(ww, la.cross(scene.quad_u[idx], plw))
    t_best = jnp.where(has_hit, tw, BIG)
    return t_best, idx, alw, bew


def medium_candidates(scene, origin, direction, time, t_surf, rngb):
    """Stochastic scatter candidates for every constant medium.

    reference: src/constant_medium.rs:34-71 — entry/exit of the convex
    boundary, entry clamped to t_min=0.001, exit clamped to the closest
    surface hit, exponential free-flight sampling with -ln(U)/rho.
    ``rngb`` is the per-bounce CounterRng; medium ``i`` draws at site
    ``SITE_MEDIUM + i`` (same contract as the megakernel).

    Returns (t (R,), mat (R,) int32) with t == +inf when no medium scatters.
    """
    M = scene.med_neg_inv_density.shape[0]
    R = origin.shape[0]

    # Sphere boundaries: both quadratic roots (closed form for the reference's
    # double boundary.hit, constant_medium.rs:35-39).
    oc = origin[:, None, :] - scene.med_sph_center[None, :, :]
    a = la.length_squared(direction)[:, None]
    half_b = jnp.sum(oc * direction[:, None, :], axis=-1)
    c = la.length_squared(oc) - (scene.med_sph_radius**2)[None, :]
    disc = half_b * half_b - a * c
    sqrtd = _safe_sqrt(disc, disc > 0.0)
    s_entry = _safe_div(-half_b - sqrtd, a)
    s_exit = _safe_div(-half_b + sqrtd, a)
    s_ok = disc > 0.0

    # Box boundaries: slab test in the boundary's local frame (closed form for
    # the 6-quad cube + RotateY + Translate chain in cornell_smoke).
    # Explicit mul-sum, not einsum: keeps the 3x3 rotate on the VPU in f32.
    o_rel = origin[:, None, :] - scene.med_trans[None, :, :]  # (R,M,3)
    o_l = jnp.sum(scene.med_rot[None, :, :, :] * o_rel[:, :, None, :], axis=-1)
    d_l = jnp.sum(scene.med_rot[None, :, :, :] * direction[:, None, None, :], axis=-1)
    inv_d = _safe_div(jnp.ones_like(d_l), d_l)
    t0 = (scene.med_lo[None, :, :] - o_l) * inv_d
    t1 = (scene.med_hi[None, :, :] - o_l) * inv_d
    b_entry = jnp.max(jnp.minimum(t0, t1), axis=-1)
    b_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    b_ok = b_entry < b_exit

    is_box = scene.med_type[None, :] == 1
    entry = jnp.where(is_box, b_entry, s_entry)
    exit_ = jnp.where(is_box, b_exit, s_exit)
    ok = jnp.where(is_box, b_ok, s_ok) & scene.med_valid[None, :]

    # Clamp: entry to ray window min (constant_medium.rs:40, ray_t.min=0.001),
    # exit to the closest surface hit (the closest_so_far interval).
    entry = jnp.maximum(entry, T_MIN)
    exit_ = jnp.minimum(exit_, t_surf[:, None])
    ok = ok & (entry < exit_)

    ray_len = la.length(direction)[:, None]
    dist_inside = (exit_ - entry) * ray_len
    u = jnp.stack(
        [rngb.uniform(hashrng.SITE_MEDIUM + i) for i in range(M)], axis=-1,
    ).astype(origin.dtype)
    u = jnp.maximum(u, 1e-12)
    hit_dist = scene.med_neg_inv_density[None, :] * jnp.log(u)
    ok = ok & (hit_dist <= dist_inside)

    t = jnp.where(ok, entry + hit_dist / ray_len, BIG)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    mat = scene.med_mat[idx]
    return t_best, mat


def _sphere_uv(n):
    """reference: src/sphere.rs:48-52. Pole/axis-degenerate lanes are
    where-guarded so gradients stay finite (arccos'(+-1) and atan2(0,0))."""
    y = jnp.clip(-n[..., 1], -1.0, 1.0)
    interior = jnp.abs(y) < 1.0 - 1e-7
    theta = jnp.where(
        interior,
        jnp.arccos(jnp.where(interior, y, 0.0)),
        jnp.where(y > 0, 0.0, jnp.pi),
    )
    xz_deg = (jnp.abs(n[..., 0]) + jnp.abs(n[..., 2])) < 1e-12
    phi = jnp.where(
        xz_deg,
        0.0,
        jnp.arctan2(
            jnp.where(xz_deg, 0.0, -n[..., 2]),
            jnp.where(xz_deg, 1.0, n[..., 0]),
        ),
    ) + jnp.pi
    return phi / (2.0 * jnp.pi), theta / jnp.pi


def closest_hit(scene, origin, direction, time, rngb) -> Hit:
    """Full closest-hit query: spheres + quads + constant media, brute force.

    Equivalent to the reference's top-level ``world.hit(r, (0.001, inf))``
    (renderer.rs:144) over a HittableList/BVH that may contain ConstantMedium
    wrappers — restructured order-independently: surfaces first, then medium
    candidates clamped by the surface hit (see SURVEY.md §3.5).
    """
    R = origin.shape[0]
    t_max0 = jnp.full((R,), BIG, dtype=origin.dtype)

    t_sph, i_sph = sphere_closest(scene, origin, direction, time, t_max0)
    t_quad, i_quad, alpha, beta = quad_closest(scene, origin, direction, time, t_max0)
    return assemble_hit(scene, origin, direction, time, rngb,
                        t_sph, i_sph, t_quad, i_quad, alpha, beta)


def assemble_hit(scene, origin, direction, time, rngb,
                 t_sph, i_sph, t_quad, i_quad, alpha, beta) -> Hit:
    """Combine per-type winners with media sampling into a full Hit record.

    Shared tail of the brute-force and BVH closest-hit paths.
    """
    t_surf = jnp.minimum(t_sph, t_quad)
    t_med, med_mat = medium_candidates(scene, origin, direction, time, t_surf, rngb)

    # Priority: medium wins iff strictly closer than the surface winner (its
    # candidate is already clamped to the surface window).
    med_wins = t_med < t_surf
    sph_wins = (~med_wins) & (t_sph <= t_quad) & jnp.isfinite(t_sph)
    quad_wins = (~med_wins) & (~sph_wins) & jnp.isfinite(t_quad)
    any_hit = med_wins | sph_wins | quad_wins

    t = jnp.where(med_wins, t_med, jnp.where(sph_wins, t_sph, t_quad))
    t = jnp.where(any_hit, t, jnp.zeros_like(t))  # keep grads finite on miss
    p = la.ray_at(origin, direction, t)

    # --- sphere attributes for winners
    c_best = scene.sph_center[i_sph] + scene.sph_cvec[i_sph] * time[:, None]
    r_best = jnp.maximum(scene.sph_radius[i_sph], 1e-12)
    sph_outward = (p - c_best) / r_best[:, None]
    sph_u, sph_v = _sphere_uv(sph_outward)

    # --- quad attributes for winners
    normal_all, _, _ = scene.quad_frame()
    quad_outward = normal_all[i_quad]

    outward = jnp.where(sph_wins[:, None], sph_outward, quad_outward)
    # Medium: outward normal is the ray direction itself
    # (constant_medium.rs:50-58) — front_face false, normal = -direction.
    outward = jnp.where(med_wins[:, None], direction, outward)

    front_face = la.dot(direction, outward) < 0.0  # hittable.rs:22-37
    normal = jnp.where(front_face[:, None], outward, -outward)

    u = jnp.where(sph_wins, sph_u, jnp.where(quad_wins, alpha, 0.0))
    v = jnp.where(sph_wins, sph_v, jnp.where(quad_wins, beta, 0.0))

    mat_id = jnp.where(
        med_wins,
        med_mat,
        jnp.where(sph_wins, scene.sph_mat[i_sph], scene.quad_mat[i_quad]),
    ).astype(jnp.int32)

    return Hit(hit=any_hit, t=t, p=p, normal=normal, front_face=front_face,
               mat_id=mat_id, u=u, v=v, is_surface=~med_wins)
