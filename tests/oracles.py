"""Pure-numpy float64 oracle implementations of the reference formulas.

Each function is transcribed from the cited reference file:line semantics
(NOT from the framework under test) so kernel tests have an independent
ground truth.
"""

from __future__ import annotations

import numpy as np


def sphere_hit(o, d, center, radius, t_min, t_max):
    """Quadratic + near/far root selection with strict bounds
    (reference: src/sphere.rs:59-89). Returns (hit, t)."""
    oc = o - center
    a = d @ d
    half_b = oc @ d
    c = oc @ oc - radius * radius
    disc = half_b * half_b - a * c
    if disc < 0:
        return False, np.inf
    sq = np.sqrt(disc)
    root = (-half_b - sq) / a
    if not (t_min < root < t_max):
        root = (-half_b + sq) / a
        if not (t_min < root < t_max):
            return False, np.inf
    return True, root


def sphere_uv(n):
    """reference: src/sphere.rs:48-52."""
    theta = np.arccos(-n[1])
    phi = np.arctan2(-n[2], n[0]) + np.pi
    return phi / (2 * np.pi), theta / np.pi


def quad_hit(o, d, q, u, v, t_min, t_max):
    """Plane hit + inside test with inclusive bounds
    (reference: src/quad.rs:96-133). Returns (hit, t, alpha, beta)."""
    n = np.cross(u, v)
    normal = n / np.linalg.norm(n)
    dpl = normal @ q
    w = n / (n @ n)
    denom = normal @ d
    if abs(denom) < 1e-8:
        return False, np.inf, 0, 0
    t = (dpl - normal @ o) / denom
    if not (t_min <= t <= t_max):
        return False, np.inf, 0, 0
    p = o + t * d
    planar = p - q
    alpha = w @ np.cross(planar, v)
    beta = w @ np.cross(u, planar)
    if alpha < 0 or alpha > 1 or beta < 0 or beta > 1:
        return False, np.inf, 0, 0
    return True, t, alpha, beta


def aabb_hit(o, d, lo, hi, t_min, t_max):
    """Slab test with per-axis swap, fail on t_max <= t_min
    (reference: src/aabb.rs:64-84)."""
    for a in range(3):
        inv_d = 1.0 / d[a]
        t0 = (lo[a] - o[a]) * inv_d
        t1 = (hi[a] - o[a]) * inv_d
        if inv_d < 0.0:
            t0, t1 = t1, t0
        tmn = max(t0, t_min)
        tmx = min(t1, t_max)
        if tmx <= tmn:
            return False
    return True


def reflect(v, n):
    """reference: src/vec3.rs:91-93."""
    return v - 2.0 * (v @ n) * n


def refract(uv, n, etai_over_etat):
    """reference: src/vec3.rs:96-101."""
    cos_theta = min(-(uv @ n), 1.0)
    r_out_perp = etai_over_etat * (uv + cos_theta * n)
    r_out_par = -np.sqrt(abs(1.0 - r_out_perp @ r_out_perp)) * n
    return r_out_perp + r_out_par


def schlick(cosine, ref_idx):
    """reference: src/material.rs:74-78."""
    r0 = ((1 - ref_idx) / (1 + ref_idx)) ** 2
    return r0 + (1 - r0) * (1 - cosine) ** 5


def perlin_noise(ranvec, px, py, pz, p):
    """reference: src/perlin.rs:27-49,81-100."""
    i, j, k = (int(np.floor(p[c])) for c in range(3))
    u, v, w = (p[c] - np.floor(p[c]) for c in range(3))
    uu, vv, ww = (x * x * (3 - 2 * x) for x in (u, v, w))
    acc = 0.0
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                g = ranvec[px[(i + di) & 255] ^ py[(j + dj) & 255] ^ pz[(k + dk) & 255]]
                weight = np.array([u - di, v - dj, w - dk])
                acc += (
                    (di * uu + (1 - di) * (1 - uu))
                    * (dj * vv + (1 - dj) * (1 - vv))
                    * (dk * ww + (1 - dk) * (1 - ww))
                    * (g @ weight)
                )
    return acc


def perlin_turbulence(ranvec, px, py, pz, p, depth=7):
    """reference: src/perlin.rs:52-64."""
    acc, q, w = 0.0, np.array(p, np.float64), 1.0
    for _ in range(depth):
        acc += w * perlin_noise(ranvec, px, py, pz, q)
        w *= 0.5
        q = q * 2.0
    return abs(acc)


def camera_constants(settings):
    """reference: src/camera.rs:54-110. settings is a RenderSettings-like."""
    s = settings
    image_height = int(s.image_width / s.aspect_ratio)
    look_from = np.array(s.look_from, np.float64)
    look_at = np.array(s.look_at, np.float64)
    vup = np.array(s.vup, np.float64)
    theta = np.deg2rad(s.vfov)
    h = np.tan(theta / 2)
    vp_h = 2.0 * h * s.focus_dist
    vp_w = vp_h * (s.image_width / image_height)
    w = look_from - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(vup, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    viewport_u = vp_w * u
    viewport_v = -vp_h * v
    center = look_from
    pdu = viewport_u / s.image_width
    pdv = viewport_v / image_height
    upper_left = center - s.focus_dist * w - viewport_u / 2 - viewport_v / 2
    pixel00 = upper_left + 0.5 * (pdu + pdv)
    return dict(center=center, pixel00=pixel00, pdu=pdu, pdv=pdv,
                image_height=image_height)
