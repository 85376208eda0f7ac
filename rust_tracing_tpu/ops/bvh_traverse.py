"""Stackless BVH traversal, vectorized over rays.

The reference traverses its pointer tree recursively per ray, tightening the
search interval with each found hit (src/bvh.rs:91-112). Here every ray walks
the flattened skip-link tree (models/bvh.py) in lockstep inside one
``lax.while_loop``: a node-box hit advances to the next node (DFS preorder =
left child), a miss jumps the subtree via the skip link, and leaf primitives
are tested inline with the running best-t as the pruning window — the
stackless equivalent of bvh.rs:99's ``[min, hit_left.t]`` tightening.

Divergence note (SURVEY.md §7): rays finish their walks at different times;
the loop runs until every lane's pointer passes the end. Cost per iteration is
a handful of gathers + one sphere and one quad test, so even the lockstep
worst case beats brute force once scenes pass a few hundred primitives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import T_MIN, QUAD_DENOM_EPS
from . import linalg as la
from .intersect import BIG, Hit, _safe_div, _safe_sqrt, assemble_hit


def _slab_hit(o, inv_d, nmin, nmax, t_lo, t_hi):
    """AABB slab test (reference: src/aabb.rs:64-84) with per-axis swap and
    strict ``t_max <= t_min`` failure, against window [t_lo, t_hi)."""
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    tmn = jnp.maximum(jnp.max(near, axis=-1), t_lo)
    tmx = jnp.minimum(jnp.min(far, axis=-1), t_hi)
    return tmx > tmn


def _sphere_hit_one(scene, origin, direction, time, idx, t_best):
    """Per-ray single-sphere test for gathered indices (sphere.rs:59-89)."""
    center = scene.sph_center[idx] + scene.sph_cvec[idx] * time[:, None]
    oc = origin - center
    a = la.length_squared(direction)
    half_b = la.dot(oc, direction)
    c = la.length_squared(oc) - scene.sph_radius[idx] ** 2
    disc = half_b * half_b - a * c
    sq = _safe_sqrt(disc, disc > 0.0)
    root1 = _safe_div(-half_b - sq, a)
    root2 = _safe_div(-half_b + sq, a)
    ok1 = (root1 > T_MIN) & (root1 < t_best)
    ok2 = (root2 > T_MIN) & (root2 < t_best)
    root = jnp.where(ok1, root1, root2)
    valid = (disc > 0.0) & (ok1 | ok2)
    return jnp.where(valid, root, BIG)


def _quad_hit_one(scene, origin, direction, idx, t_best):
    """Per-ray single-quad test for gathered indices (quad.rs:96-133)."""
    normal, d_plane, w = scene.quad_frame()
    n = normal[idx]
    denom = la.dot(n, direction)
    t = _safe_div(d_plane[idx] - la.dot(n, origin), denom)
    p = origin + t[:, None] * direction
    planar = p - scene.quad_q[idx]
    alpha = la.dot(w[idx], la.cross(planar, scene.quad_v[idx]))
    beta = la.dot(w[idx], la.cross(scene.quad_u[idx], planar))
    valid = (
        (jnp.abs(denom) >= QUAD_DENOM_EPS)
        & (t >= T_MIN) & (t <= t_best)
        & (alpha >= 0.0) & (alpha <= 1.0)
        & (beta >= 0.0) & (beta <= 1.0)
    )
    return jnp.where(valid, t, BIG)


def traverse(scene, origin, direction, time):
    """Walk the BVH for a flat ray batch.

    Returns (t_best, type_best, idx_best): type -1 = miss, 0 sphere, 1 quad.
    """
    R = origin.shape[0]
    N = scene.bvh_skip.shape[0]
    inv_d = _safe_div(jnp.ones_like(direction), direction)

    init = (
        jnp.zeros_like(time, dtype=jnp.int32),  # node pointer
        jnp.full_like(time, BIG),  # best t
        jnp.zeros_like(time, dtype=jnp.int32) - 1,  # best type (-1 = miss)
        jnp.zeros_like(time, dtype=jnp.int32),  # best idx
    )

    def cond(state):
        ptr, _, _, _ = state
        return jnp.any(ptr < N)

    def body(state):
        ptr, t_best, ty_best, ix_best = state
        ptr_c = jnp.minimum(ptr, N - 1)
        nmin = scene.bvh_min[ptr_c]
        nmax = scene.bvh_max[ptr_c]
        skip = scene.bvh_skip[ptr_c]
        ptype = scene.bvh_ptype[ptr_c]
        pidx = scene.bvh_pidx[ptr_c]

        active = ptr < N
        box_hit = active & _slab_hit(origin, inv_d, nmin, nmax, T_MIN, t_best)

        is_sph = box_hit & (ptype == 0)
        is_quad = box_hit & (ptype == 1)
        t_s = _sphere_hit_one(scene, origin, direction, time, pidx, t_best)
        t_q = _quad_hit_one(scene, origin, direction, pidx, t_best)
        t_cand = jnp.where(is_sph, t_s, jnp.where(is_quad, t_q, BIG))
        better = t_cand < t_best

        t_best = jnp.where(better, t_cand, t_best)
        ty_best = jnp.where(better, ptype, ty_best)
        ix_best = jnp.where(better, pidx, ix_best)

        ptr = jnp.where(active, jnp.where(box_hit, ptr + 1, skip), ptr)
        return ptr, t_best, ty_best, ix_best

    _, t_best, ty_best, ix_best = jax.lax.while_loop(cond, body, init)
    return t_best, ty_best, ix_best


def closest_hit_bvh(scene, origin, direction, time, rngb) -> Hit:
    """BVH-accelerated replacement for intersect.closest_hit (same result).

    Autodiff: ``lax.while_loop`` is not reverse-differentiable, and the walk
    is a discrete search anyway — so the traversal runs fully DETACHED
    (stop_gradient), and the winner's (t, alpha, beta) are recomputed from
    the gathered primitive parameters, O(R) and differentiable. Same
    detached-argmin structure as intersect.sphere_closest/quad_closest.
    """
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree_util.tree_map(sg, scene)
    t_sg, ty_best, ix_best = traverse(scene_sg, sg(origin), sg(direction),
                                      sg(time))

    sph_win = ty_best == 0
    quad_win = ty_best == 1
    i_sph = jnp.where(sph_win, ix_best, 0)
    i_quad = jnp.where(quad_win, ix_best, 0)

    # differentiable winner recompute against a window just past the found t
    window = jnp.where(jnp.isfinite(t_sg), t_sg * (1 + 1e-5) + 1e-5, BIG)
    t_s = _sphere_hit_one(scene, origin, direction, time, i_sph, window)
    t_q = _quad_hit_one(scene, origin, direction, i_quad, window)
    t_sph = jnp.where(sph_win, t_s, BIG)
    t_quad = jnp.where(quad_win, t_q, BIG)

    # recompute the winning quad's (alpha, beta) for UVs (quad.rs:131)
    normal, d_plane, w = scene.quad_frame()
    t_w = jnp.where(quad_win, t_q, jnp.where(sph_win, t_s, 0.0))
    p = origin + t_w[:, None] * direction
    planar = p - scene.quad_q[i_quad]
    alpha = la.dot(w[i_quad], la.cross(planar, scene.quad_v[i_quad]))
    beta = la.dot(w[i_quad], la.cross(scene.quad_u[i_quad], planar))

    return assemble_hit(scene, origin, direction, time, rngb,
                        t_sph, i_sph, t_quad, i_quad, alpha, beta)


def auto_closest_hit(scene):
    """Pick the hit kernel for a compiled scene (static decision)."""
    if scene.has_bvh:
        return closest_hit_bvh
    return None  # integrator defaults to brute force
