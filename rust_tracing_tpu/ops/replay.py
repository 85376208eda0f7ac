"""Search-free differentiable path replay from recorded hit winners.

The expensive part of differentiable rendering is not the derivative — it is
re-running the (rays x primitives) closest-hit SEARCH under autodiff. But the
search is piecewise-constant in the scene parameters (the detached-argmin
semantics of ops/intersect.py): its only differentiable output is WHICH
primitive won. So the pipeline splits:

  1. **Record** (fast, non-differentiable): the Pallas megakernel traces the
     paths and emits one packed int32 per (pixel, sample, bounce) — the
     winning primitive kind/index (ops/megakernel.record_paths). On hosts
     without the kernel, records_xla() produces identical records via the
     XLA search (same RNG addresses, same winners).
  2. **Replay** (differentiable, O(rays)): this module re-derives every
     continuous quantity — winner t, hit point, normal, UV, medium scatter
     distance, scatter directions, attenuations, emission — from the recorded
     winner's parameters and the same counter-RNG draws, with NO search.
     Reverse-mode stores/transposes only O(rays) tensors.

Because both passes address randomness by (seed, pixel, sample, bounce,
site), the replay reproduces the direct estimator exactly (tested bitwise on
CPU), and its gradient is the same detached-discrete gradient the direct path
computes — at a fraction of the cost.

Record encoding (int32): kind * 2^24 + idx, with kind 0 = miss, 1 = sphere,
2 = quad, 3 + m = constant medium m.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import T_MIN
from . import hashrng, intersect
from . import linalg as la
from .materials import scatter_and_emit

KIND_MISS = 0
KIND_SPHERE = 1
KIND_QUAD = 2
KIND_MEDIUM = 3  # kind = KIND_MEDIUM + medium index
_IDX_BITS = 24
_IDX_MASK = (1 << _IDX_BITS) - 1


def pack_record(kind, idx):
    return (kind.astype(jnp.int32) << _IDX_BITS) | (idx.astype(jnp.int32)
                                                    & _IDX_MASK)


def unpack_record(rec):
    return rec >> _IDX_BITS, rec & _IDX_MASK


def record_from_hitfn(scene, origin, direction, time, rngb, hit_fn=None):
    """One bounce's record via the XLA search (CPU fallback / oracle)."""
    hit_fn = hit_fn or intersect.closest_hit
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree_util.tree_map(sg, scene)
    h = hit_fn(scene_sg, sg(origin), sg(direction), sg(time), rngb)

    # classify the winner the way assemble_hit did: medium / sphere / quad
    t_sph, i_sph = intersect.sphere_closest(scene_sg, sg(origin),
                                            sg(direction), sg(time),
                                            jnp.full_like(time, intersect.BIG))
    t_quad, i_quad, _, _ = intersect.quad_closest(
        scene_sg, sg(origin), sg(direction), sg(time),
        jnp.full_like(time, intersect.BIG))
    t_surf = jnp.minimum(t_sph, t_quad)
    t_med, _ = intersect.medium_candidates(scene_sg, sg(origin),
                                           sg(direction), sg(time), t_surf,
                                           rngb)
    med_wins = t_med < t_surf
    sph_wins = (~med_wins) & (t_sph <= t_quad) & jnp.isfinite(t_sph)
    quad_wins = (~med_wins) & (~sph_wins) & jnp.isfinite(t_quad)

    # which medium won: argmin over candidates (re-derive like
    # medium_candidates does internally)
    med_idx = _winning_medium(scene_sg, sg(origin), sg(direction), sg(time),
                              t_surf, rngb)

    kind = jnp.where(
        med_wins, KIND_MEDIUM + med_idx,
        jnp.where(sph_wins, KIND_SPHERE,
                  jnp.where(quad_wins, KIND_QUAD, KIND_MISS)))
    idx = jnp.where(sph_wins, i_sph, jnp.where(quad_wins, i_quad, 0))
    return pack_record(kind, idx)


def _winning_medium(scene, origin, direction, time, t_surf, rngb):
    """Index of the medium with the smallest valid scatter t (argmin clone of
    intersect.medium_candidates's internal selection)."""
    M = scene.med_neg_inv_density.shape[0]
    oc = origin[:, None, :] - scene.med_sph_center[None, :, :]
    a = la.length_squared(direction)[:, None]
    half_b = jnp.sum(oc * direction[:, None, :], axis=-1)
    c = la.length_squared(oc) - (scene.med_sph_radius**2)[None, :]
    disc = half_b * half_b - a * c
    sqrtd = intersect._safe_sqrt(disc, disc > 0.0)
    s_entry = intersect._safe_div(-half_b - sqrtd, a)
    s_exit = intersect._safe_div(-half_b + sqrtd, a)
    s_ok = disc > 0.0

    o_rel = origin[:, None, :] - scene.med_trans[None, :, :]
    o_l = jnp.sum(scene.med_rot[None, :, :, :] * o_rel[:, :, None, :], axis=-1)
    d_l = jnp.sum(scene.med_rot[None, :, :, :]
                  * direction[:, None, None, :], axis=-1)
    inv_d = intersect._safe_div(jnp.ones_like(d_l), d_l)
    t0 = (scene.med_lo[None, :, :] - o_l) * inv_d
    t1 = (scene.med_hi[None, :, :] - o_l) * inv_d
    b_entry = jnp.max(jnp.minimum(t0, t1), axis=-1)
    b_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    b_ok = b_entry < b_exit

    is_box = scene.med_type[None, :] == 1
    entry = jnp.where(is_box, b_entry, s_entry)
    exit_ = jnp.where(is_box, b_exit, s_exit)
    ok = jnp.where(is_box, b_ok, s_ok) & scene.med_valid[None, :]
    entry = jnp.maximum(entry, T_MIN)
    exit_ = jnp.minimum(exit_, t_surf[:, None])
    ok = ok & (entry < exit_)
    ray_len = la.length(direction)[:, None]
    dist_inside = (exit_ - entry) * ray_len
    u = jnp.stack([rngb.uniform(hashrng.SITE_MEDIUM + i) for i in range(M)],
                  axis=-1).astype(origin.dtype)
    u = jnp.maximum(u, 1e-12)
    hit_dist = scene.med_neg_inv_density[None, :] * jnp.log(u)
    ok = ok & (hit_dist <= dist_inside)
    t = jnp.where(ok, entry + hit_dist / ray_len, intersect.BIG)
    return jnp.argmin(t, axis=-1).astype(jnp.int32)


def hit_from_record(scene, origin, direction, time, rngb, rec) -> intersect.Hit:
    """Differentiable O(R) Hit reconstruction for recorded winners."""
    kind, idx = unpack_record(rec)
    is_sph = kind == KIND_SPHERE
    is_quad = kind == KIND_QUAD
    is_med = kind >= KIND_MEDIUM
    med_idx = jnp.where(is_med, kind - KIND_MEDIUM, 0)
    any_hit = kind != KIND_MISS

    i_sph = jnp.where(is_sph, idx, 0)
    i_quad = jnp.where(is_quad, idx, 0)

    # --- sphere winner t (near root if valid else far; sphere.rs:59-89)
    cw = scene.sph_center[i_sph] + scene.sph_cvec[i_sph] * time[:, None]
    ocw = origin - cw
    a = la.length_squared(direction)
    hb = la.dot(ocw, direction)
    cq = la.length_squared(ocw) - scene.sph_radius[i_sph] ** 2
    disc = hb * hb - a * cq
    sq = intersect._safe_sqrt(disc, is_sph & (disc > 0))
    r1 = intersect._safe_div(-hb - sq, a)
    r2 = intersect._safe_div(-hb + sq, a)
    t_s = jnp.where(r1 > T_MIN, r1, r2)

    # --- quad winner t, alpha, beta (quad.rs:96-133)
    normal_all, d_plane, w_all = scene.quad_frame()
    nw = normal_all[i_quad]
    denw = la.dot(nw, direction)
    t_q = intersect._safe_div(d_plane[i_quad] - la.dot(nw, origin), denw)
    pw = origin + t_q[:, None] * direction
    plw = pw - scene.quad_q[i_quad]
    alpha = la.dot(w_all[i_quad], la.cross(plw, scene.quad_v[i_quad]))
    beta = la.dot(w_all[i_quad], la.cross(scene.quad_u[i_quad], plw))

    # --- medium winner t (constant_medium.rs:34-71, recorded medium only)
    t_m = _medium_t(scene, origin, direction, rngb, med_idx, t_s, t_q,
                    is_sph, is_quad)

    t = jnp.where(is_med, t_m, jnp.where(is_sph, t_s,
                                         jnp.where(is_quad, t_q, 0.0)))
    p = la.ray_at(origin, direction, t)

    r_best = jnp.maximum(scene.sph_radius[i_sph], 1e-12)
    sph_outward = (p - cw) / r_best[:, None]
    sph_u, sph_v = intersect._sphere_uv(sph_outward)

    outward = jnp.where(is_sph[:, None], sph_outward, nw)
    outward = jnp.where(is_med[:, None], direction, outward)
    front_face = la.dot(direction, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)

    u = jnp.where(is_sph, sph_u, jnp.where(is_quad, alpha, 0.0))
    v = jnp.where(is_sph, sph_v, jnp.where(is_quad, beta, 0.0))
    mat_id = jnp.where(
        is_med, scene.med_mat[med_idx],
        jnp.where(is_sph, scene.sph_mat[i_sph], scene.quad_mat[i_quad]),
    ).astype(jnp.int32)

    return intersect.Hit(hit=any_hit, t=t, p=p, normal=normal,
                         front_face=front_face, mat_id=mat_id, u=u, v=v,
                         is_surface=~is_med)


def _medium_t(scene, origin, direction, rngb, med_idx, t_s, t_q,
              is_sph, is_quad):
    """Recorded medium's scatter t: entry/exit of ITS boundary, exit clamped
    by the surface window (which, for a medium win, is the closest surface —
    not recorded, so recompute the unclamped surface t is unnecessary: the
    kernel guaranteed t_m < t_surf, and t_m depends on t_surf only through
    the dist_inside rejection, which the record already resolved)."""
    # gather the recorded medium's parameters
    rot = scene.med_rot[med_idx]
    o_rel = origin - scene.med_trans[med_idx]
    o_l = jnp.sum(rot * o_rel[:, None, :], axis=-1)
    d_l = jnp.sum(rot * direction[:, None, :], axis=-1)
    inv_d = intersect._safe_div(jnp.ones_like(d_l), d_l)
    t0 = (scene.med_lo[med_idx] - o_l) * inv_d
    t1 = (scene.med_hi[med_idx] - o_l) * inv_d
    b_entry = jnp.max(jnp.minimum(t0, t1), axis=-1)
    b_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)

    oc = origin - scene.med_sph_center[med_idx]
    a = la.length_squared(direction)
    half_b = la.dot(oc, direction)
    c = la.length_squared(oc) - scene.med_sph_radius[med_idx] ** 2
    disc = half_b * half_b - a * c
    sq = intersect._safe_sqrt(disc, disc > 0)
    s_entry = intersect._safe_div(-half_b - sq, a)
    s_exit = intersect._safe_div(-half_b + sq, a)

    is_box = scene.med_type[med_idx] == 1
    entry = jnp.maximum(jnp.where(is_box, b_entry, s_entry),
                        jnp.asarray(T_MIN, origin.dtype))

    ray_len = la.length(direction)
    # same draw the search consumed for this medium (site = SITE_MEDIUM + m).
    # med_idx is data-dependent but draws are cheap: evaluate the recorded
    # medium's site via a masked select over the (small, static) medium count.
    M = scene.med_neg_inv_density.shape[0]
    u = jnp.zeros_like(entry)
    for m in range(M):
        u = jnp.where(med_idx == m, rngb.uniform(hashrng.SITE_MEDIUM + m), u)
    u = jnp.maximum(u, 1e-12).astype(origin.dtype)
    hd = scene.med_neg_inv_density[med_idx] * jnp.log(u)
    return entry + hd / jnp.maximum(ray_len, 1e-30)


def trace_replay(scene, origin, direction, time, rng_idx, records,
                 max_depth: int):
    """Search-free differentiable clone of integrator.trace: per-bounce hits
    come from ``records`` (max_depth, R) int32 instead of a scene search.

    Returns (radiance (R,3), bounces (R,) int32) like integrator.trace.
    """
    seed, pixel_ids, sample = rng_idx

    init = (
        origin,
        direction,
        jnp.ones_like(origin),
        jnp.zeros_like(origin),
        time < jnp.inf,
        jnp.zeros_like(time, dtype=jnp.int32),
    )

    def step(carry, xs):
        depth_i, rec = xs
        o, d, tp, rad, alive, nb = carry
        rngb = hashrng.CounterRng(seed, pixel_ids, sample, depth_i)

        hit = hit_from_record(scene, o, d, time, rngb, rec)
        nb = nb + alive.astype(jnp.int32)

        miss = alive & ~hit.hit
        rad = rad + jnp.where(miss[:, None], tp * scene.background, 0.0)

        s = scatter_and_emit(scene, rngb, d, hit)
        live_hit = alive & hit.hit
        rad = rad + jnp.where(live_hit[:, None], tp * s.emitted, 0.0)

        scat = live_hit & s.scattered
        tp = jnp.where(scat[:, None], tp * s.attenuation, tp)

        side = jnp.sign(jnp.sum(s.direction * hit.normal, axis=-1,
                                keepdims=True))
        scale = jnp.max(jnp.abs(hit.p), axis=-1, keepdims=True)
        eps = 1e-4 + 2e-4 * scale
        new_o = hit.p + jnp.where(hit.is_surface[:, None],
                                  side * hit.normal * eps, 0.0)
        o = jnp.where(scat[:, None], new_o, o)
        d = jnp.where(scat[:, None], s.direction, d)
        alive = scat
        return (o, d, tp, rad, alive, nb), None

    depths = jnp.arange(max_depth, dtype=jnp.int32)
    (o, d, tp, rad, alive, nb), _ = jax.lax.scan(step, init,
                                                 (depths, records))
    return rad, nb


def records_xla(scene, cam, pixel_ids, seed, spp: int, max_depth: int,
                hit_fn=None):
    """(spp, max_depth, R) records via the XLA search — the CPU fallback and
    the oracle the kernel recorder is tested against."""
    from ..camera import get_rays

    def per_sample(s):
        o, d, t = get_rays(cam, seed, pixel_ids, s)

        def step(carry, depth_i):
            o, d, tp_alive = carry
            rngb = hashrng.CounterRng(seed, pixel_ids, s, depth_i)
            rec = record_from_hitfn(scene, o, d, t, rngb, hit_fn)
            hit = hit_from_record(scene, o, d, t, rngb, rec)
            sc = scatter_and_emit(scene, rngb, d, hit)
            scat = tp_alive & hit.hit & sc.scattered
            side = jnp.sign(jnp.sum(sc.direction * hit.normal, axis=-1,
                                    keepdims=True))
            scale = jnp.max(jnp.abs(hit.p), axis=-1, keepdims=True)
            eps = 1e-4 + 2e-4 * scale
            new_o = hit.p + jnp.where(hit.is_surface[:, None],
                                      side * hit.normal * eps, 0.0)
            o = jnp.where(scat[:, None], new_o, o)
            d = jnp.where(scat[:, None], sc.direction, d)
            # dead lanes keep producing records; mask them to MISS so the
            # replay treats them identically
            rec = jnp.where(tp_alive, rec, 0)
            return (o, d, scat), rec

        depths = jnp.arange(max_depth, dtype=jnp.int32)
        _, recs = jax.lax.scan(step, (o, d, t < jnp.inf), depths)
        return recs  # (max_depth, R)

    return jnp.stack([per_sample(s) for s in range(spp)])
