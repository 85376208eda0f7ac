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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import T_MIN
from . import hashrng, intersect
from . import linalg as la
from .materials import scatter_and_emit, scatter_and_emit_c
from .tgather import tgather, tgather_group

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
    if scene.has_media:
        t_med, _ = intersect.medium_candidates(scene_sg, sg(origin),
                                               sg(direction), sg(time),
                                               t_surf, rngb)
        med_wins = t_med < t_surf
        # which medium won: argmin over candidates (re-derive like
        # medium_candidates does internally)
        med_idx = _winning_medium(scene_sg, sg(origin), sg(direction),
                                  sg(time), t_surf, rngb)
    else:
        med_wins = jnp.zeros(time.shape, bool)
        med_idx = jnp.zeros(time.shape, jnp.int32)
    sph_wins = (~med_wins) & (t_sph <= t_quad) & jnp.isfinite(t_sph)
    quad_wins = (~med_wins) & (~sph_wins) & jnp.isfinite(t_quad)

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


class HitC(NamedTuple):
    """Component-form hit record: dense (R,) lanes (no (R,3) arrays — TPU XLA
    pads a trailing 3-axis to 128 vector lanes, a 42x waste)."""

    hit: jnp.ndarray
    t: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    front_face: jnp.ndarray
    mat_id: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    is_surface: jnp.ndarray


def _sphere_uv_c(nx, ny, nz):
    """Component form of intersect._sphere_uv (sphere.rs:48-52) with the same
    pole/axis degeneracy guards."""
    y = jnp.clip(-ny, -1.0, 1.0)
    interior = jnp.abs(y) < 1.0 - 1e-7
    theta = jnp.where(
        interior,
        jnp.arccos(jnp.where(interior, y, 0.0)),
        jnp.where(y > 0, 0.0, jnp.pi),
    )
    xz_deg = (jnp.abs(nx) + jnp.abs(nz)) < 1e-12
    phi = jnp.where(
        xz_deg,
        0.0,
        jnp.arctan2(
            jnp.where(xz_deg, 0.0, -nz),
            jnp.where(xz_deg, 1.0, nx),
        ),
    ) + jnp.pi
    return phi / (2.0 * jnp.pi), theta / jnp.pi


def hit_from_record_c(scene, ox, oy, oz, dx, dy, dz, time, rngb,
                      rec) -> HitC:
    """Differentiable O(R) component-form hit reconstruction for recorded
    winners."""
    kind, idx = unpack_record(rec)
    is_sph = kind == KIND_SPHERE
    is_quad = kind == KIND_QUAD
    is_med = kind >= KIND_MEDIUM
    med_idx = jnp.where(is_med, kind - KIND_MEDIUM, 0)
    any_hit = kind != KIND_MISS

    i_sph = jnp.where(is_sph, idx, 0)
    i_quad = jnp.where(is_quad, idx, 0)

    a = dx * dx + dy * dy + dz * dz
    zero = jnp.zeros_like(ox)

    # --- sphere winner t (near root if valid else far; sphere.rs:59-89);
    # statically pruned when the scene has no spheres (cornell: the whole
    # quadratic + normal + UV subgraph AND its transpose disappear)
    if scene.has_spheres:
        # one packed gather for every sphere column (incl. the material id
        # as an exactly-representable f32): ONE index pass instead of 9
        c0x, c0y, c0z, cvx, cvy, cvz, r_s, mat_sph_f = tgather_group(
            (scene.sph_center[:, 0], scene.sph_center[:, 1],
             scene.sph_center[:, 2], scene.sph_cvec[:, 0],
             scene.sph_cvec[:, 1], scene.sph_cvec[:, 2],
             scene.sph_radius,
             jax.lax.stop_gradient(scene.sph_mat.astype(jnp.float32))),
            i_sph)
        cwx = c0x + cvx * time
        cwy = c0y + cvy * time
        cwz = c0z + cvz * time
        ocx, ocy, ocz = ox - cwx, oy - cwy, oz - cwz
        hb = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r_s ** 2
        disc = hb * hb - a * cq
        sq = intersect._safe_sqrt(disc, is_sph & (disc > 0))
        r1 = intersect._safe_div(-hb - sq, a)
        r2 = intersect._safe_div(-hb + sq, a)
        t_s = jnp.where(r1 > T_MIN, r1, r2)
    else:
        cwx = cwy = cwz = zero
        r_s = zero
        t_s = zero

    # --- quad winner t, alpha, beta (quad.rs:96-133); pruned likewise
    if scene.has_quads:
        normal_all, d_plane, w_all = scene.quad_frame()
        (nwx, nwy, nwz, dpl, qqx, qqy, qqz, qux, quy, quz,
         qvx, qvy, qvz, wx, wy, wz, mat_quad_f) = tgather_group(
            (normal_all[:, 0], normal_all[:, 1], normal_all[:, 2], d_plane,
             scene.quad_q[:, 0], scene.quad_q[:, 1], scene.quad_q[:, 2],
             scene.quad_u[:, 0], scene.quad_u[:, 1], scene.quad_u[:, 2],
             scene.quad_v[:, 0], scene.quad_v[:, 1], scene.quad_v[:, 2],
             w_all[:, 0], w_all[:, 1], w_all[:, 2],
             jax.lax.stop_gradient(scene.quad_mat.astype(jnp.float32))),
            i_quad)
        denw = nwx * dx + nwy * dy + nwz * dz
        t_q = intersect._safe_div(
            dpl - (nwx * ox + nwy * oy + nwz * oz), denw)
        plx = ox + t_q * dx - qqx
        ply = oy + t_q * dy - qqy
        plz = oz + t_q * dz - qqz
        alpha = (wx * (ply * qvz - plz * qvy) + wy * (plz * qvx - plx * qvz)
                 + wz * (plx * qvy - ply * qvx))
        beta = (wx * (quy * plz - quz * ply) + wy * (quz * plx - qux * plz)
                + wz * (qux * ply - quy * plx))
    else:
        nwx = nwy = nwz = zero
        t_q = alpha = beta = zero
        mat_quad_f = zero

    # --- medium winner t (constant_medium.rs:34-71, recorded medium only);
    # statically pruned for media-free scenes (no medium is ever recorded)
    if scene.has_media:
        t_m = _medium_t_c(scene, ox, oy, oz, dx, dy, dz, a, rngb, med_idx)
    else:
        t_m = jnp.zeros_like(t_s)

    t = jnp.where(is_med, t_m, jnp.where(is_sph, t_s,
                                         jnp.where(is_quad, t_q, 0.0)))
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz

    if scene.has_spheres:
        # division (not reciprocal-multiply): bitwise-matches the direct
        # path's assemble_hit (intersect.py) for the replay==direct tests
        r_best = jnp.maximum(r_s, 1e-12)
        sox = (px - cwx) / r_best
        soy = (py - cwy) / r_best
        soz = (pz - cwz) / r_best
        sph_u, sph_v = _sphere_uv_c(sox, soy, soz)
    else:
        sox = soy = soz = zero
        sph_u = sph_v = zero

    outx = jnp.where(is_med, dx, jnp.where(is_sph, sox, nwx))
    outy = jnp.where(is_med, dy, jnp.where(is_sph, soy, nwy))
    outz = jnp.where(is_med, dz, jnp.where(is_sph, soz, nwz))
    front_face = (dx * outx + dy * outy + dz * outz) < 0.0
    sign = jnp.where(front_face, 1.0, -1.0)
    nx, ny, nz = sign * outx, sign * outy, sign * outz

    u = jnp.where(is_sph, sph_u, jnp.where(is_quad, alpha, 0.0))
    v = jnp.where(is_sph, sph_v, jnp.where(is_quad, beta, 0.0))
    # material ids rode the packed gathers as exactly-representable f32
    # (ids < 2^24); round-trip is exact
    mat_sph = (mat_sph_f.astype(jnp.int32) if scene.has_spheres else i_sph)
    mat_quad = (mat_quad_f.astype(jnp.int32) if scene.has_quads else i_quad)
    mat_id = jnp.where(
        is_med, tgather(scene.med_mat, med_idx),
        jnp.where(is_sph, mat_sph, mat_quad),
    ).astype(jnp.int32)

    return HitC(hit=any_hit, t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
                front_face=front_face, mat_id=mat_id, u=u, v=v,
                is_surface=~is_med)


def hit_from_record(scene, origin, direction, time, rngb,
                    rec) -> intersect.Hit:
    """Array wrapper over :func:`hit_from_record_c` (oracle/test API)."""
    h = hit_from_record_c(scene, origin[:, 0], origin[:, 1], origin[:, 2],
                          direction[:, 0], direction[:, 1], direction[:, 2],
                          time, rngb, rec)
    return intersect.Hit(
        hit=h.hit, t=h.t,
        p=jnp.stack([h.px, h.py, h.pz], axis=-1),
        normal=jnp.stack([h.nx, h.ny, h.nz], axis=-1),
        front_face=h.front_face, mat_id=h.mat_id, u=h.u, v=h.v,
        is_surface=h.is_surface)


def _medium_t_c(scene, ox, oy, oz, dx, dy, dz, a, rngb, med_idx):
    """Recorded medium's scatter t, component form: entry of ITS boundary
    plus the exponential free flight. The kernel guaranteed t_m < t_surf and
    resolved the dist_inside rejection, so no surface window recompute is
    needed (constant_medium.rs:34-71)."""
    orx = ox - tgather(scene.med_trans[:, 0], med_idx)
    ory = oy - tgather(scene.med_trans[:, 1], med_idx)
    orz = oz - tgather(scene.med_trans[:, 2], med_idx)
    rot = scene.med_rot.reshape(-1, 9)
    b_entry = jnp.full_like(ox, -jnp.inf)
    b_exit = jnp.full_like(ox, jnp.inf)
    for ax in range(3):
        r0 = tgather(rot[:, 3 * ax + 0], med_idx)
        r1 = tgather(rot[:, 3 * ax + 1], med_idx)
        r2 = tgather(rot[:, 3 * ax + 2], med_idx)
        o_l = r0 * orx + r1 * ory + r2 * orz
        d_l = r0 * dx + r1 * dy + r2 * dz
        inv_d = intersect._safe_div(jnp.ones_like(d_l), d_l)
        t0 = (tgather(scene.med_lo[:, ax], med_idx) - o_l) * inv_d
        t1 = (tgather(scene.med_hi[:, ax], med_idx) - o_l) * inv_d
        b_entry = jnp.maximum(b_entry, jnp.minimum(t0, t1))
        b_exit = jnp.minimum(b_exit, jnp.maximum(t0, t1))

    mcx = ox - tgather(scene.med_sph_center[:, 0], med_idx)
    mcy = oy - tgather(scene.med_sph_center[:, 1], med_idx)
    mcz = oz - tgather(scene.med_sph_center[:, 2], med_idx)
    half_b = mcx * dx + mcy * dy + mcz * dz
    c = (mcx * mcx + mcy * mcy + mcz * mcz
         - tgather(scene.med_sph_radius, med_idx) ** 2)
    disc = half_b * half_b - a * c
    sq = intersect._safe_sqrt(disc, disc > 0)
    s_entry = intersect._safe_div(-half_b - sq, a)

    is_box = tgather(scene.med_type, med_idx) == 1
    entry = jnp.maximum(jnp.where(is_box, b_entry, s_entry),
                        jnp.asarray(T_MIN, ox.dtype))

    ray_len = jnp.sqrt(a)
    # same draw the search consumed for this medium (site = SITE_MEDIUM + m).
    # med_idx is data-dependent but draws are cheap: evaluate the recorded
    # medium's site via a masked select over the (small, static) medium count.
    M = scene.med_neg_inv_density.shape[0]
    u = jnp.zeros_like(entry)
    for m in range(M):
        u = jnp.where(med_idx == m, rngb.uniform(hashrng.SITE_MEDIUM + m), u)
    u = jnp.maximum(u, 1e-12).astype(ox.dtype)
    hd = tgather(scene.med_neg_inv_density, med_idx) * jnp.log(u)
    return entry + hd / jnp.maximum(ray_len, 1e-30)


def bounce_c(scene, rngb, rec, ox, oy, oz, dx, dy, dz, time,
             tr, tg, tb, rr, rg, rb, alive):
    """One replay bounce in component form: reconstruct the recorded winner,
    shade, advance the path. Shared by the bounce scan (:func:`trace_replay`)
    and the sorted-wavefront renderer (ops/wavefront.py) — ONE definition so
    both paths are bitwise-identical per lane.

    Returns (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, scat) where
    ``scat`` is the lane's aliveness after this bounce.
    """
    h = hit_from_record_c(scene, ox, oy, oz, dx, dy, dz, time, rngb, rec)

    miss = alive & ~h.hit
    bg_r, bg_g, bg_b = (scene.background[0], scene.background[1],
                        scene.background[2])
    rr = rr + jnp.where(miss, tr * bg_r, 0.0)
    rg = rg + jnp.where(miss, tg * bg_g, 0.0)
    rb = rb + jnp.where(miss, tb * bg_b, 0.0)

    s = scatter_and_emit_c(scene, rngb, dx, dy, dz,
                           h.nx, h.ny, h.nz, h.front_face, h.mat_id,
                           h.u, h.v, h.px, h.py, h.pz)
    live_hit = alive & h.hit
    rr = rr + jnp.where(live_hit, tr * s.er, 0.0)
    rg = rg + jnp.where(live_hit, tg * s.eg, 0.0)
    rb = rb + jnp.where(live_hit, tb * s.eb, 0.0)

    scat = live_hit & s.scattered
    tr = jnp.where(scat, tr * s.ar, tr)
    tg = jnp.where(scat, tg * s.ag, tg)
    tb = jnp.where(scat, tb * s.ab, tb)

    # f32 origin offset (see ops/integrator.py), media excluded
    side = jnp.sign(s.dx * h.nx + s.dy * h.ny + s.dz * h.nz)
    scale = jnp.maximum(jnp.abs(h.px),
                        jnp.maximum(jnp.abs(h.py), jnp.abs(h.pz)))
    eps = 1e-4 + 2e-4 * scale
    off = jnp.where(h.is_surface, side * eps, 0.0)
    ox = jnp.where(scat, h.px + off * h.nx, ox)
    oy = jnp.where(scat, h.py + off * h.ny, oy)
    oz = jnp.where(scat, h.pz + off * h.nz, oz)
    dx = jnp.where(scat, s.dx, dx)
    dy = jnp.where(scat, s.dy, dy)
    dz = jnp.where(scat, s.dz, dz)
    return ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, scat


def trace_replay(scene, origin, direction, time, rng_idx, records,
                 max_depth: int, remat: bool = False):
    """Search-free differentiable clone of integrator.trace: per-bounce hits
    come from ``records`` (max_depth, R) int32 instead of a scene search.

    Fully COMPONENT FORM internally: the scan carry is 14 dense (R,) lanes —
    never an (R,3) array, whose trailing axis TPU XLA pads to 128 vector
    lanes (a 42x memory/bandwidth expansion, measured: the (R,3)-carry
    version OOM'd at 8 samples and ran 42x under VPU speed).

    ``remat`` rematerializes each bounce in reverse mode (jax.checkpoint on
    the scan step) under a save-the-RNG policy ('rt_rng' names): backward
    recomputes the cheap O(R) select/product chain but not the
    transcendental samplers — the memory knob that lets the whole spp batch
    flatten into one wavefront (grad.radiance_mean_replay_rays).

    Returns (radiance (R,3), bounces (R,) int32) like integrator.trace.
    """
    seed, pixel_ids, sample = rng_idx
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)

    init = (ox, oy, oz, dx, dy, dz,
            one, one, one,  # throughput
            zero, zero, zero,  # radiance
            time < jnp.inf,  # alive
            jnp.zeros_like(time, dtype=jnp.int32))  # bounce counter

    def step(carry, xs):
        depth_i, rec = xs
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive, nb) = carry
        rngb = hashrng.CounterRng(seed, pixel_ids, sample, depth_i)
        nb = nb + alive.astype(jnp.int32)
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = bounce_c(
            scene, rngb, rec, ox, oy, oz, dx, dy, dz, time,
            tr, tg, tb, rr, rg, rb, alive)
        return (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive,
                nb), None

    depths = jnp.arange(max_depth, dtype=jnp.int32)
    if remat:
        # Save the checkpoint-named RNG tensors (ops/materials.py 'rt_rng'):
        # they are pure functions of counters — no parameter dependencies —
        # so re-deriving their transcendental chains in the backward segment
        # would be pure waste. Everything else is recomputed.
        policy = jax.checkpoint_policies.save_only_these_names("rt_rng")
        step_fn = jax.checkpoint(step, policy=policy)
    else:
        step_fn = step
    # UNROLL the bounce scan: a rolled scan materializes the full 14-lane
    # carry through HBM at every bounce boundary, which dominates the replay
    # wall-time. Unrolling lets XLA fuse across bounces (measured on v5e,
    # cornell 600x600@8spp d8: fwd 231 -> 919 Mrays/s, fwd+bwd 144 -> 388
    # at unroll=8). Capped so final_scene's depth-40 graph stays compilable;
    # per-step jax.checkpoint semantics (and numerics) are unchanged.
    carry, _ = jax.lax.scan(step_fn, init, (depths, records),
                            unroll=min(max_depth, 8))
    rr, rg, rb, nb = carry[9], carry[10], carry[11], carry[13]
    return jnp.stack([rr, rg, rb], axis=-1), nb


def records_xla(scene, cam, pixel_ids, seed, spp: int, max_depth: int,
                hit_fn=None, sample_offset: int = 0):
    """(max_depth, spp, R) records via the XLA search — the CPU fallback and
    the oracle the kernel recorder is tested against. Covers global samples
    ``sample_offset .. sample_offset + spp``.

    DEPTH-MAJOR layout: the replay scan consumes one bounce row per step, so
    a (depth, spp*R) view is a free reshape — no runtime transpose of the
    multi-hundred-MB record volume (measured 1.5x on the whole fwd+bwd when
    the transpose sat inside the jit)."""
    from ..camera import get_rays

    def per_sample(s):
        s = s + sample_offset
        o, d, t = get_rays(cam, seed, pixel_ids, s)

        def step(carry, depth_i):
            o, d, tp_alive = carry
            rngb = hashrng.CounterRng(seed, pixel_ids, s, depth_i)
            rec = record_from_hitfn(scene, o, d, t, rngb, hit_fn)
            hit = hit_from_record(scene, o, d, t, rngb, rec)
            sc = scatter_and_emit(scene, rngb, d, hit)
            scat = tp_alive & hit.hit & sc.scattered
            side = jnp.sign(la.dot(sc.direction, hit.normal))[:, None]
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

    return jnp.stack([per_sample(s) for s in range(spp)], axis=1)
