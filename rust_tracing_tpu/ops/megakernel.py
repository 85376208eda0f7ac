"""Fused Pallas path-tracing megakernel (forward speed-of-light path).

The XLA wavefront path (ops/integrator.py) is correct and differentiable but
streams (rays x prims) intermediates through HBM every bounce. This kernel
fuses the ENTIRE render loop — camera ray generation, all primitive tests,
material scatter, medium sampling, spp accumulation — into one Pallas program
per pixel tile:

- per-ray state lives in registers/VMEM as component-form (ROWS,128) lanes
  (no [...,3] axis, pure VPU elementwise);
- the frozen scene is baked into the program as compile-time immediates
  (the reference's Arc-frozen world taken to its logical extreme): zero
  memory traffic for scene access, full unrolling of the primitive loop;
- RNG is the on-core PRNG (pltpu.prng_seed / prng_random_bits), seeded per
  (tile, seed) — deterministic, independent lanes;
- spp and bounce loops are fori_loops inside the kernel: radiance never
  leaves the chip until the final accumulated tile is written.

Coverage: scenes without image/noise textures (gathers; see texture fallback
note in render_fast). Differentiable rendering stays on the XLA path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import T_MIN, QUAD_DENOM_EPS
from ..models.scene import (DIELECTRIC, DIFFUSE_LIGHT, ISOTROPIC, LAMBERTIAN,
                            METAL, MED_BOX, MED_SPHERE, TEX_CHECKER, TEX_SOLID)

ROWS = 8  # sublanes per tile; tile = (ROWS, 128) rays
LANES = 128
TILE = ROWS * LANES

_TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------- RNG helpers
# Stateless counter-based RNG: murmur3 finalizer over
# (seed, pixel id, sample, bounce, call site). ~10 VPU int ops per draw,
# deterministic, identical on hardware and in the Pallas interpreter (the
# interpreter stubs pltpu.prng_random_bits to zeros, so the stateful on-core
# PRNG is not portable), and trivially independent across all indices.
def _mix(h):
    h = jax.lax.bitwise_xor(h, jax.lax.shift_right_logical(h, jnp.uint32(16)))
    h = h * jnp.uint32(0x85EBCA6B)
    h = jax.lax.bitwise_xor(h, jax.lax.shift_right_logical(h, jnp.uint32(13)))
    h = h * jnp.uint32(0xC2B2AE35)
    h = jax.lax.bitwise_xor(h, jax.lax.shift_right_logical(h, jnp.uint32(16)))
    return h


class _Rng:
    """Per-scope RNG: fresh decorrelated draws keyed by a base counter plus a
    trace-time call-site salt."""

    def __init__(self, *indices):
        base = jnp.uint32(0)
        for i, ix in enumerate(indices):
            base = base + jnp.asarray(ix).astype(jnp.uint32) * jnp.uint32(
                [0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1][i])
        self.base = base
        self.salt = 0

    def uniform(self, shape=None):
        self.salt += 1
        h = _mix(self.base + jnp.uint32(self.salt * 0x01000193))
        mant = jax.lax.bitwise_or(
            jax.lax.shift_right_logical(h, jnp.uint32(9)),
            jnp.uint32(0x3F800000),
        )
        return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0

    def unit_vector(self):
        """Uniform direction on S^2 (closed form, no rejection)."""
        z = 1.0 - 2.0 * self.uniform()
        phi = _TWO_PI * self.uniform()
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        return s * jnp.cos(phi), s * jnp.sin(phi), z

    def in_unit_sphere(self):
        ux, uy, uz = self.unit_vector()
        # U^(1/3) via exp/log (no cbrt in the Pallas TPU lowering)
        u = jnp.maximum(self.uniform(), 1e-30)
        r = jnp.exp(jnp.log(u) * (1.0 / 3.0))
        return r * ux, r * uy, r * uz


# ------------------------------------------------------------- scene snapshot
def _np(scene_field):
    return np.asarray(scene_field, np.float64)


@dataclasses.dataclass
class _SceneConst:
    """Host-side numpy snapshot of a CompiledScene, baked into the kernel."""

    sph_center: np.ndarray
    sph_radius: np.ndarray
    sph_cvec: np.ndarray
    sph_mat: np.ndarray
    sph_valid: np.ndarray
    quad_q: np.ndarray
    quad_u: np.ndarray
    quad_v: np.ndarray
    quad_normal: np.ndarray
    quad_d: np.ndarray
    quad_w: np.ndarray
    quad_mat: np.ndarray
    quad_valid: np.ndarray
    med_type: np.ndarray
    med_sph_center: np.ndarray
    med_sph_radius: np.ndarray
    med_rot: np.ndarray
    med_trans: np.ndarray
    med_lo: np.ndarray
    med_hi: np.ndarray
    med_neg_inv_density: np.ndarray
    med_mat: np.ndarray
    med_valid: np.ndarray
    mat_type: np.ndarray
    mat_tex: np.ndarray
    mat_albedo: np.ndarray
    mat_fuzz: np.ndarray
    mat_ir: np.ndarray
    tex_type: np.ndarray
    tex_rgb: np.ndarray
    tex_inv_scale: np.ndarray
    tex_even: np.ndarray
    tex_odd: np.ndarray
    background: np.ndarray

    @staticmethod
    def from_scene(scene) -> "_SceneConst":
        normal, d_plane, w = scene.quad_frame()
        return _SceneConst(
            sph_center=_np(scene.sph_center), sph_radius=_np(scene.sph_radius),
            sph_cvec=_np(scene.sph_cvec),
            sph_mat=np.asarray(scene.sph_mat), sph_valid=np.asarray(scene.sph_valid),
            quad_q=_np(scene.quad_q), quad_u=_np(scene.quad_u),
            quad_v=_np(scene.quad_v), quad_normal=_np(normal),
            quad_d=_np(d_plane), quad_w=_np(w),
            quad_mat=np.asarray(scene.quad_mat), quad_valid=np.asarray(scene.quad_valid),
            med_type=np.asarray(scene.med_type),
            med_sph_center=_np(scene.med_sph_center),
            med_sph_radius=_np(scene.med_sph_radius),
            med_rot=_np(scene.med_rot), med_trans=_np(scene.med_trans),
            med_lo=_np(scene.med_lo), med_hi=_np(scene.med_hi),
            med_neg_inv_density=_np(scene.med_neg_inv_density),
            med_mat=np.asarray(scene.med_mat), med_valid=np.asarray(scene.med_valid),
            mat_type=np.asarray(scene.mat_type), mat_tex=np.asarray(scene.mat_tex),
            mat_albedo=_np(scene.mat_albedo), mat_fuzz=_np(scene.mat_fuzz),
            mat_ir=_np(scene.mat_ir),
            tex_type=np.asarray(scene.tex_type), tex_rgb=_np(scene.tex_rgb),
            tex_inv_scale=_np(scene.tex_inv_scale),
            tex_even=np.asarray(scene.tex_even), tex_odd=np.asarray(scene.tex_odd),
            background=_np(scene.background),
        )


def supports(scene) -> bool:
    """Megakernel coverage: no image/noise textures (vector gathers)."""
    return not (scene.has_image or scene.has_noise)


# ----------------------------------------------------------------- the kernel
def _make_kernel(sc: _SceneConst, cam, width, height, spp, max_depth,
                 origin_eps_abs=1e-4, origin_eps_rel=2e-4):
    S = len(sc.sph_radius)
    Q = len(sc.quad_d)
    M = len(sc.med_neg_inv_density)
    NMAT = len(sc.mat_type)

    cx, cy, cz = (float(v) for v in cam.center)
    p00x, p00y, p00z = (float(v) for v in cam.pixel00_loc)
    dux, duy, duz = (float(v) for v in cam.pixel_delta_u)
    dvx, dvy, dvz = (float(v) for v in cam.pixel_delta_v)
    ddux, dduy, dduz = (float(v) for v in cam.defocus_disk_u)
    ddvx, ddvy, ddvz = (float(v) for v in cam.defocus_disk_v)
    has_defocus = cam.defocus_angle > 0.0
    bg_r, bg_g, bg_b = (float(v) for v in sc.background)

    def tex_value(tid_arr, px, py, pz):
        """Solid/checker texture value for per-lane texture ids (immediates)."""
        r = jnp.zeros_like(px)
        g = jnp.zeros_like(px)
        bl = jnp.zeros_like(px)
        for t in range(len(sc.tex_type)):
            tt = int(sc.tex_type[t])
            if tt == TEX_SOLID:
                vr, vg, vb = (float(c) for c in sc.tex_rgb[t])
                vr = jnp.full_like(px, vr)
                vg = jnp.full_like(px, vg)
                vb = jnp.full_like(px, vb)
            elif tt == TEX_CHECKER:
                inv = float(sc.tex_inv_scale[t])
                fsum = (jnp.floor(inv * px) + jnp.floor(inv * py)
                        + jnp.floor(inv * pz))
                even = jnp.mod(fsum, 2.0) == 0.0
                er, eg, eb = (float(c) for c in sc.tex_rgb[int(sc.tex_even[t])])
                orr, og, ob = (float(c) for c in sc.tex_rgb[int(sc.tex_odd[t])])
                vr = jnp.where(even, er, orr)
                vg = jnp.where(even, eg, og)
                vb = jnp.where(even, eb, ob)
            else:  # image/noise unsupported here (supports() guards)
                vr = vg = vb = jnp.zeros_like(px)
            sel = tid_arr == t
            r = jnp.where(sel, vr, r)
            g = jnp.where(sel, vg, g)
            bl = jnp.where(sel, vb, bl)
        return r, g, bl

    def kernel(seed_ref, out_r, out_g, out_b):
        tile = pl.program_id(0)
        seed_val = seed_ref[0]

        lane = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
        pid = jnp.minimum(tile * TILE + lane, width * height - 1)
        # ray id unique per lane even for clamped padding lanes
        rid = tile * TILE + lane
        pi = (pid % width).astype(jnp.float32)
        pj = (pid // width).astype(jnp.float32)

        shape = (ROWS, LANES)

        def one_sample(s, acc):
            acc_r, acc_g, acc_b = acc
            rng = _Rng(seed_val, rid, s)
            # --- camera ray (camera.rs:112-137 semantics)
            jx = rng.uniform() - 0.5
            jy = rng.uniform() - 0.5
            sx = p00x + (pi + jx) * dux + (pj + jy) * dvx
            sy = p00y + (pi + jx) * duy + (pj + jy) * dvy
            sz = p00z + (pi + jx) * duz + (pj + jy) * dvz
            if has_defocus:
                rr = jnp.sqrt(rng.uniform())
                th = _TWO_PI * rng.uniform()
                ca, sa = rr * jnp.cos(th), rr * jnp.sin(th)
                ox = cx + ca * ddux + sa * ddvx
                oy = cy + ca * dduy + sa * ddvy
                oz = cz + ca * dduz + sa * ddvz
            else:
                ox = jnp.full(shape, cx)
                oy = jnp.full(shape, cy)
                oz = jnp.full(shape, cz)
            dx, dy, dz = sx - ox, sy - oy, sz - oz
            rtime = rng.uniform()

            tp_r = jnp.ones(shape, jnp.float32)
            tp_g = jnp.ones(shape, jnp.float32)
            tp_b = jnp.ones(shape, jnp.float32)
            rad_r = jnp.zeros(shape, jnp.float32)
            rad_g = jnp.zeros(shape, jnp.float32)
            rad_b = jnp.zeros(shape, jnp.float32)
            # alive carried as f32 (Mosaic rejects i1 vectors as loop state)
            alive_f = jnp.ones(shape, jnp.float32)

            def bounce(depth_i, st):
                (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                 rad_r, rad_g, rad_b, alive_f) = st
                alive = alive_f > 0.0
                rngb = _Rng(seed_val, rid, s, depth_i)

                big = jnp.float32(jnp.inf)
                t_best = jnp.full(shape, big)
                # winner attributes accumulated during the unrolled prim loop
                w_mat = jnp.zeros(shape, jnp.int32)
                w_nx = jnp.zeros(shape, jnp.float32)
                w_ny = jnp.zeros(shape, jnp.float32)
                w_nz = jnp.ones(shape, jnp.float32)
                w_is_med = jnp.zeros(shape, jnp.bool_)

                a_len = dx * dx + dy * dy + dz * dz
                inv_a = 1.0 / jnp.maximum(a_len, 1e-30)

                # ---- spheres (sphere.rs:59-89), fully unrolled
                for i in range(S):
                    if not sc.sph_valid[i]:
                        continue
                    ccx, ccy, ccz = (float(v) for v in sc.sph_center[i])
                    mvx, mvy, mvz = (float(v) for v in sc.sph_cvec[i])
                    rad2 = float(sc.sph_radius[i] ** 2)
                    inv_r = float(1.0 / max(sc.sph_radius[i], 1e-12))
                    if mvx or mvy or mvz:
                        ctx = ccx + mvx * rtime
                        cty = ccy + mvy * rtime
                        ctz = ccz + mvz * rtime
                    else:
                        ctx, cty, ctz = ccx, ccy, ccz
                    ocx, ocy, ocz = ox - ctx, oy - cty, oz - ctz
                    half_b = ocx * dx + ocy * dy + ocz * dz
                    c = ocx * ocx + ocy * ocy + ocz * ocz - rad2
                    disc = half_b * half_b - a_len * c
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    r1 = (-half_b - sq) * inv_a
                    r2 = (-half_b + sq) * inv_a
                    ok1 = (r1 > T_MIN) & (r1 < t_best)
                    ok2 = (r2 > T_MIN) & (r2 < t_best)
                    root = jnp.where(ok1, r1, r2)
                    hit = (disc > 0.0) & (ok1 | ok2)
                    t_best = jnp.where(hit, root, t_best)
                    w_mat = jnp.where(hit, int(sc.sph_mat[i]), w_mat)
                    # outward normal = (p - c) / r
                    w_nx = jnp.where(hit, (ox + root * dx - ctx) * inv_r, w_nx)
                    w_ny = jnp.where(hit, (oy + root * dy - cty) * inv_r, w_ny)
                    w_nz = jnp.where(hit, (oz + root * dz - ctz) * inv_r, w_nz)
                    w_is_med = jnp.where(hit, False, w_is_med)

                # ---- quads (quad.rs:96-133), fully unrolled
                for i in range(Q):
                    if not sc.quad_valid[i]:
                        continue
                    nx, ny, nz = (float(v) for v in sc.quad_normal[i])
                    qx, qy, qz = (float(v) for v in sc.quad_q[i])
                    ux, uy, uz = (float(v) for v in sc.quad_u[i])
                    vx, vy, vz = (float(v) for v in sc.quad_v[i])
                    wx, wy, wz = (float(v) for v in sc.quad_w[i])
                    dpl = float(sc.quad_d[i])
                    denom = nx * dx + ny * dy + nz * dz
                    safe = jnp.where(jnp.abs(denom) < 1e-30,
                                     jnp.float32(1e-30), denom)
                    t = (dpl - (nx * ox + ny * oy + nz * oz)) / safe
                    hx = ox + t * dx - qx
                    hy = oy + t * dy - qy
                    hz = oz + t * dz - qz
                    # alpha = w . (h x v); beta = w . (u x h)
                    alpha = (wx * (hy * vz - hz * vy)
                             + wy * (hz * vx - hx * vz)
                             + wz * (hx * vy - hy * vx))
                    beta = (wx * (uy * hz - uz * hy)
                            + wy * (uz * hx - ux * hz)
                            + wz * (ux * hy - uy * hx))
                    hit = ((jnp.abs(denom) >= QUAD_DENOM_EPS)
                           & (t >= T_MIN) & (t < t_best)
                           & (alpha >= 0.0) & (alpha <= 1.0)
                           & (beta >= 0.0) & (beta <= 1.0))
                    t_best = jnp.where(hit, t, t_best)
                    w_mat = jnp.where(hit, int(sc.quad_mat[i]), w_mat)
                    w_nx = jnp.where(hit, nx, w_nx)
                    w_ny = jnp.where(hit, ny, w_ny)
                    w_nz = jnp.where(hit, nz, w_nz)
                    w_is_med = jnp.where(hit, False, w_is_med)

                # ---- constant media (constant_medium.rs:34-71), unrolled
                for i in range(M):
                    if not sc.med_valid[i]:
                        continue
                    nid = float(sc.med_neg_inv_density[i])
                    if int(sc.med_type[i]) == MED_SPHERE:
                        ccx, ccy, ccz = (float(v) for v in sc.med_sph_center[i])
                        rad2 = float(sc.med_sph_radius[i] ** 2)
                        ocx, ocy, ocz = ox - ccx, oy - ccy, oz - ccz
                        half_b = ocx * dx + ocy * dy + ocz * dz
                        c = ocx * ocx + ocy * ocy + ocz * ocz - rad2
                        disc = half_b * half_b - a_len * c
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        entry = (-half_b - sq) * inv_a
                        exit_ = (-half_b + sq) * inv_a
                        okb = disc > 0.0
                    else:  # MED_BOX: slab test in the local frame
                        R = [[float(v) for v in row] for row in sc.med_rot[i]]
                        tx, ty, tz = (float(v) for v in sc.med_trans[i])
                        rx, ry, rz = ox - tx, oy - ty, oz - tz
                        lox = R[0][0] * rx + R[0][1] * ry + R[0][2] * rz
                        loy = R[1][0] * rx + R[1][1] * ry + R[1][2] * rz
                        loz = R[2][0] * rx + R[2][1] * ry + R[2][2] * rz
                        ldx = R[0][0] * dx + R[0][1] * dy + R[0][2] * dz
                        ldy = R[1][0] * dx + R[1][1] * dy + R[1][2] * dz
                        ldz = R[2][0] * dx + R[2][1] * dy + R[2][2] * dz
                        entry = jnp.full(shape, -jnp.inf)
                        exit_ = jnp.full(shape, jnp.inf)
                        for ax, (lo_a, hi_a, oo, dd2) in enumerate(
                            ((float(sc.med_lo[i][0]), float(sc.med_hi[i][0]), lox, ldx),
                             (float(sc.med_lo[i][1]), float(sc.med_hi[i][1]), loy, ldy),
                             (float(sc.med_lo[i][2]), float(sc.med_hi[i][2]), loz, ldz))):
                            invd = 1.0 / jnp.where(jnp.abs(dd2) < 1e-30,
                                                   jnp.float32(1e-30), dd2)
                            t0 = (lo_a - oo) * invd
                            t1 = (hi_a - oo) * invd
                            entry = jnp.maximum(entry, jnp.minimum(t0, t1))
                            exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
                        okb = entry < exit_
                    entry = jnp.maximum(entry, jnp.float32(T_MIN))
                    exit_ = jnp.minimum(exit_, t_best)
                    okb = okb & (entry < exit_)
                    ray_len = jnp.sqrt(a_len)
                    dist_in = (exit_ - entry) * ray_len
                    u = jnp.maximum(rngb.uniform(), 1e-12)
                    hd = nid * jnp.log(u)
                    okb = okb & (hd <= dist_in)
                    t_m = entry + hd / ray_len
                    hit = okb & (t_m < t_best)
                    t_best = jnp.where(hit, t_m, t_best)
                    w_mat = jnp.where(hit, int(sc.med_mat[i]), w_mat)
                    w_is_med = jnp.where(hit, True, w_is_med)

                hit_any = jnp.isfinite(t_best)
                miss = alive & ~hit_any

                # background on miss (renderer.rs:152-154)
                rad_r = rad_r + jnp.where(miss, tp_r * bg_r, 0.0)
                rad_g = rad_g + jnp.where(miss, tp_g * bg_g, 0.0)
                rad_b = rad_b + jnp.where(miss, tp_b * bg_b, 0.0)

                t_safe = jnp.where(hit_any, t_best, 0.0)
                px_ = ox + t_safe * dx
                py_ = oy + t_safe * dy
                pz_ = oz + t_safe * dz

                # flip normal toward the ray (hittable.rs:22-37); medium normal
                # is the ray direction -> front_face False
                ndotd = w_nx * dx + w_ny * dy + w_nz * dz
                mx = jnp.where(w_is_med, dx, w_nx)
                my = jnp.where(w_is_med, dy, w_ny)
                mz = jnp.where(w_is_med, dz, w_nz)
                ndotd = jnp.where(w_is_med, a_len, ndotd)
                front = ndotd < 0.0
                sign = jnp.where(front, 1.0, -1.0)
                nx_ = sign * mx
                ny_ = sign * my
                nz_ = sign * mz

                # ---- material tables via immediate selects
                m_type = jnp.zeros(shape, jnp.int32)
                m_tex = jnp.zeros(shape, jnp.int32)
                al_r = jnp.zeros(shape, jnp.float32)
                al_g = jnp.zeros(shape, jnp.float32)
                al_b = jnp.zeros(shape, jnp.float32)
                fuzz = jnp.zeros(shape, jnp.float32)
                ir = jnp.ones(shape, jnp.float32)
                for msel in range(NMAT):
                    is_m = w_mat == msel
                    m_type = jnp.where(is_m, int(sc.mat_type[msel]), m_type)
                    m_tex = jnp.where(is_m, int(sc.mat_tex[msel]), m_tex)
                    ar, ag, ab = (float(v) for v in sc.mat_albedo[msel])
                    al_r = jnp.where(is_m, ar, al_r)
                    al_g = jnp.where(is_m, ag, al_g)
                    al_b = jnp.where(is_m, ab, al_b)
                    fuzz = jnp.where(is_m, float(sc.mat_fuzz[msel]), fuzz)
                    ir = jnp.where(is_m, float(sc.mat_ir[msel]), ir)

                tex_r, tex_g, tex_b = tex_value(m_tex, px_, py_, pz_)

                is_lam = m_type == LAMBERTIAN
                is_metal = m_type == METAL
                is_diel = m_type == DIELECTRIC
                is_light = m_type == DIFFUSE_LIGHT
                is_iso = m_type == ISOTROPIC

                # emission (material.rs:114-122) — uses pre-scatter throughput
                live_hit = alive & hit_any
                em = live_hit & is_light
                rad_r = rad_r + jnp.where(em, tp_r * tex_r, 0.0)
                rad_g = rad_g + jnp.where(em, tp_g * tex_g, 0.0)
                rad_b = rad_b + jnp.where(em, tp_b * tex_b, 0.0)

                # ---- scatter
                uvx, uvy, uvz = rngb.unit_vector()
                inv_len = jax.lax.rsqrt(jnp.maximum(a_len, 1e-30))
                udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len

                # Lambertian: n + unit, near-zero fallback (material.rs:26-42)
                ldx_, ldy_, ldz_ = nx_ + uvx, ny_ + uvy, nz_ + uvz
                nz_fb = ((jnp.abs(ldx_) < 1e-8) & (jnp.abs(ldy_) < 1e-8)
                         & (jnp.abs(ldz_) < 1e-8))
                ldx_ = jnp.where(nz_fb, nx_, ldx_)
                ldy_ = jnp.where(nz_fb, ny_, ldy_)
                ldz_ = jnp.where(nz_fb, nz_, ldz_)

                # Metal: mirror + fuzz ball (material.rs:53-64)
                fx, fy, fz = rngb.in_unit_sphere()
                rdot = udx * nx_ + udy * ny_ + udz * nz_
                mdx = udx - 2.0 * rdot * nx_ + fuzz * fx
                mdy = udy - 2.0 * rdot * ny_ + fuzz * fy
                mdz = udz - 2.0 * rdot * nz_ + fuzz * fz
                metal_ok = (mdx * nx_ + mdy * ny_ + mdz * nz_) > 0.0

                # Dielectric (material.rs:80-104)
                ratio = jnp.where(front, 1.0 / ir, ir)
                cos_t = jnp.minimum(-(udx * nx_ + udy * ny_ + udz * nz_), 1.0)
                sin_sq = jnp.maximum(1.0 - cos_t * cos_t, 0.0)
                cannot = ratio * ratio * sin_sq > 1.0
                r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
                refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
                coin = rngb.uniform()
                do_refl = cannot | (refl > coin)
                # refract components (vec3.rs:96-101)
                rpx = ratio * (udx + cos_t * nx_)
                rpy = ratio * (udy + cos_t * ny_)
                rpz = ratio * (udz + cos_t * nz_)
                plen = jnp.maximum(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz), 0.0)
                par = -jnp.sqrt(plen)
                rfx = rpx + par * nx_
                rfy = rpy + par * ny_
                rfz = rpz + par * nz_
                # reflect of unit dir
                rlx = udx - 2.0 * rdot * nx_
                rly = udy - 2.0 * rdot * ny_
                rlz = udz - 2.0 * rdot * nz_
                ddx = jnp.where(do_refl, rlx, rfx)
                ddy = jnp.where(do_refl, rly, rfy)
                ddz = jnp.where(do_refl, rlz, rfz)

                new_dx = jnp.where(is_lam | is_iso,
                                   jnp.where(is_iso, uvx, ldx_),
                                   jnp.where(is_metal, mdx, ddx))
                new_dy = jnp.where(is_lam | is_iso,
                                   jnp.where(is_iso, uvy, ldy_),
                                   jnp.where(is_metal, mdy, ddy))
                new_dz = jnp.where(is_lam | is_iso,
                                   jnp.where(is_iso, uvz, ldz_),
                                   jnp.where(is_metal, mdz, ddz))

                at_r = jnp.where(is_metal, al_r, jnp.where(is_diel, 1.0, tex_r))
                at_g = jnp.where(is_metal, al_g, jnp.where(is_diel, 1.0, tex_g))
                at_b = jnp.where(is_metal, al_b, jnp.where(is_diel, 1.0, tex_b))

                # logical form, not where-on-bools (Mosaic can't select i1)
                scattered = (is_metal & metal_ok) | (~is_metal & ~is_light)
                scat = live_hit & scattered

                tp_r = jnp.where(scat, tp_r * at_r, tp_r)
                tp_g = jnp.where(scat, tp_g * at_g, tp_g)
                tp_b = jnp.where(scat, tp_b * at_b, tp_b)

                # f32 origin offset (see ops/integrator.py), media excluded
                side = jnp.sign(new_dx * nx_ + new_dy * ny_ + new_dz * nz_)
                mag = jnp.maximum(jnp.abs(px_),
                                  jnp.maximum(jnp.abs(py_), jnp.abs(pz_)))
                eps = origin_eps_abs + origin_eps_rel * mag
                off = jnp.where(w_is_med, 0.0, side * eps)
                ox = jnp.where(scat, px_ + off * nx_, ox)
                oy = jnp.where(scat, py_ + off * ny_, oy)
                oz = jnp.where(scat, pz_ + off * nz_, oz)
                dx = jnp.where(scat, new_dx, dx)
                dy = jnp.where(scat, new_dy, dy)
                dz = jnp.where(scat, new_dz, dz)
                alive_f = scat.astype(jnp.float32)

                return (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                        rad_r, rad_g, rad_b, alive_f)

            st = (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                  rad_r, rad_g, rad_b, alive_f)
            st = jax.lax.fori_loop(0, max_depth, bounce, st)
            rad_r, rad_g, rad_b = st[9], st[10], st[11]
            return acc_r + rad_r, acc_g + rad_g, acc_b + rad_b

        z = jnp.zeros((ROWS, LANES), jnp.float32)
        acc_r, acc_g, acc_b = jax.lax.fori_loop(0, spp, one_sample, (z, z, z))
        inv = 1.0 / spp
        out_r[:] = acc_r * inv
        out_g[:] = acc_g * inv
        out_b[:] = acc_b * inv

    return kernel


def render_fast(scene, camera, seed: int = 0, spp: Optional[int] = None,
                max_depth: Optional[int] = None,
                interpret: bool = False) -> np.ndarray:
    """Fused-megakernel offline render -> (H,W,3) float32 linear image.

    Requires supports(scene); falls back is the caller's job (renderer.render).
    """
    if not supports(scene):
        raise ValueError("megakernel: scene uses image/noise textures; "
                        "use the XLA path")
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    w, h = camera.image_width, camera.image_height
    n_pixels = w * h
    n_tiles = (n_pixels + TILE - 1) // TILE

    sc = _SceneConst.from_scene(scene)
    cam = camera  # host camera holds f64 constants
    kernel = _make_kernel(sc, cam, w, h, spp, max_depth)

    out_shape = [jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32)
                 for _ in range(3)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i, seed_ref: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        # TPU-semantics interpreter for CPU debugging without hardware
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    r, g, b = fn(jnp.asarray([seed], jnp.int32))
    img = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return np.asarray(img[:n_pixels]).reshape(h, w, 3)
