"""Fused Pallas path-tracing megakernel (forward speed-of-light path).

The XLA wavefront path (ops/integrator.py) is correct and differentiable but
streams (rays x prims) intermediates through HBM every bounce and wastes
lanes on dead rays. This kernel fuses the ENTIRE render — camera generation,
intersection, material scatter, medium sampling, spp accumulation — into one
persistent Pallas program per 32x32-pixel tile:

- **Path regeneration** (persistent-threads style): one `lax.while_loop`
  carries per-lane path state; the instant a lane's path terminates it starts
  that lane's next sample. Occupancy stays ~100% regardless of bounce-depth
  divergence — the fix for SURVEY.md §7 hard part #1 (naive spp x depth loops
  waste up to max_depth/mean_depth of the machine at final_scene's depth 40).
- **Scene in SMEM**: primitive/material/texture/media tables are runtime
  kernel inputs in scalar memory, read with dynamic indices from inside
  `fori_loop`s. One compiled kernel serves any scene of the same padded
  shape; measured ~17% slower than baking primitives as compile-time
  immediates and scales to thousands of primitives where immediates cannot
  (the round-1 design recompiled per scene and could not hold final_scene).
- **Stackless BVH packet traversal** (scenes past a measured crossover): the
  whole 1024-ray tile walks the flattened skip-link tree (models/bvh.py) in
  lockstep — scalar node pointer in SMEM control flow, vectorized AABB slab
  test, `jnp.any` reduction deciding descend-vs-skip, leaf primitive runs
  tested inline with the running t_best as the pruning window. This is the
  TPU-native form of bvh.rs:91-112's per-ray recursion: rays in a coherent
  tile share their traversal instead of diverging per lane (packet tracing).
- **Table lookups as chunked lane gathers**: per-lane material/texture
  parameters come from `take_along_axis` gathers along the 128-lane axis over
  row-replicated VMEM tiles, 128 table entries per chunk — the only gather
  shape Mosaic supports, probed on hardware.
- Per-ray state lives in registers/VMEM as component-form (8,128) lanes; RNG
  is the shared counter generator (ops/hashrng.py) addressed by (seed, pixel,
  sample, bounce, site), so this kernel consumes bitwise THE SAME streams as
  the XLA path — parity checks compare float arithmetic, not MC noise.

Coverage: all four texture families — solid, checker, noise (hash-derived
lattice gradients: same [-1,1]^3 unnormalized-gradient distribution as the
reference's OS-random tables, perlin.rs:16-25, i.e. a fresh random instance
of the same texture family), and image (nearest-neighbor over an
IMG_MAX_TEXELS mip via chunked lane gathers). Differentiable rendering stays
on the XLA path.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import math
import weakref
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import T_MIN, QUAD_DENOM_EPS
from ..models.scene import (DIELECTRIC, DIFFUSE_LIGHT, ISOTROPIC, LAMBERTIAN,
                            METAL, MED_BOX, TEX_CHECKER, TEX_IMAGE,
                            TEX_NOISE)
from . import hashrng
from .hashrng import CounterRng

ROWS = 8  # sublanes per tile; tile = (ROWS, 128) rays
LANES = 128
TILE = ROWS * LANES
BLOCK = 32  # pixel tile is BLOCK x BLOCK (coherent packets for the BVH walk)

_TWO_PI = 2.0 * math.pi

# Primitive-count threshold above which the in-kernel packet BVH walk beats
# the brute-force SMEM loop (measured on v5e; see BASELINE.md crossover
# table). Overridable per call for measurements.
BVH_KERNEL_THRESHOLD = 1024

# In-kernel image textures sample a box-filtered mip of at most this many
# texels (lane-gather chunks of 128; 32768 texels -> 256 chunks, 1.5 MB of
# row-replicated VMEM tiles). The XLA path samples the full-resolution image;
# at the footprints the reference scenes give image-textured spheres this
# is visually equivalent (nearest-neighbor sampling either way).
IMG_MAX_TEXELS = 32768


# ------------------------------------------------------------- scene packing
@dataclasses.dataclass
class _PackedScene:
    """Host-side numpy pack of a CompiledScene for the kernel's SMEM/VMEM
    inputs. Only VALID primitives are packed (no masks in the hot loop)."""

    sph_f: np.ndarray   # (S,8) cx cy cz r2 inv_r mvx mvy mvz
    sph_m: np.ndarray   # (S,) int32 material id
    quad_f: np.ndarray  # (Q,16) q(3) u(3) v(3) n(3) w(3) d
    quad_m: np.ndarray  # (Q,) int32
    med_f: np.ndarray   # (M,24) R(9) trans(3) lo(3) hi(3) c(3) r2 nid
    med_i: np.ndarray   # (M,2) type mat
    mat_tab: np.ndarray  # (7,C,8,128) type tex alb_r alb_g alb_b fuzz ir
    tex_tab: np.ndarray  # (7,Ct,8,128) type even odd rgb_r rgb_g rgb_b inv_scale
    tex_extra: np.ndarray  # (Ct? ) — noise_scale folded into tex_tab? see below
    bvh_f: np.ndarray   # (N,6) min(3) max(3)
    bvh_i: np.ndarray   # (N,4) skip start count scount (count==0 -> interior)
    prim_i: np.ndarray  # (P,2) ptype pidx  (leaf-order primitive stream)
    background: np.ndarray
    n_mat_chunks: int
    n_tex_chunks: int
    n_spheres: int = 0
    n_quads: int = 0
    n_media: int = 0
    has_checker: bool = False
    has_noise: bool = False
    img_tab: np.ndarray = None  # (3,Ci,8,128) lane-gather mip chunks
    img_h: int = 1
    img_w: int = 1
    has_image: bool = False


def _chunk_table(cols: np.ndarray) -> np.ndarray:
    """(F, N) table -> (F, C, 8, 128) row-replicated lane-gather tiles."""
    F, N = cols.shape
    C = max(1, (N + LANES - 1) // LANES)
    out = np.zeros((F, C, ROWS, LANES), np.float32)
    padded = np.zeros((F, C * LANES), np.float32)
    padded[:, :N] = cols
    for c in range(C):
        out[:, c] = padded[:, None, c * LANES:(c + 1) * LANES]
    return out


def pack_scene(scene, bvh=None) -> _PackedScene:
    """Pack a CompiledScene (+ optional FlatBVH in kernel layout)."""
    f64 = lambda a: np.asarray(a, np.float64)
    sv = np.asarray(scene.sph_valid)
    qv = np.asarray(scene.quad_valid)
    mv = np.asarray(scene.med_valid)

    c = f64(scene.sph_center)[sv]
    r = f64(scene.sph_radius)[sv]
    cv = f64(scene.sph_cvec)[sv]
    S = len(r)
    sph_f = np.zeros((max(S, 1), 8), np.float32)
    if S:
        sph_f[:S, 0:3] = c
        sph_f[:S, 3] = r * r
        sph_f[:S, 4] = 1.0 / np.where(np.abs(r) < 1e-12, 1e-12, r)
        sph_f[:S, 5:8] = cv
    sph_m = np.zeros(max(S, 1), np.int32)
    sph_m[:S] = np.asarray(scene.sph_mat)[sv]

    q = f64(scene.quad_q)[qv]
    u = f64(scene.quad_u)[qv]
    v = f64(scene.quad_v)[qv]
    Q = len(q)
    quad_f = np.zeros((max(Q, 1), 16), np.float32)
    if Q:
        n = np.cross(u, v)
        nlen2 = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
        normal = n / np.sqrt(nlen2)
        w = n / nlen2
        d = (normal * q).sum(-1)
        quad_f[:Q, 0:3] = q
        quad_f[:Q, 3:6] = u
        quad_f[:Q, 6:9] = v
        quad_f[:Q, 9:12] = normal
        quad_f[:Q, 12:15] = w
        quad_f[:Q, 15] = d
    quad_m = np.zeros(max(Q, 1), np.int32)
    quad_m[:Q] = np.asarray(scene.quad_mat)[qv]

    M = int(mv.sum())
    med_f = np.zeros((max(M, 1), 24), np.float32)
    med_i = np.zeros((max(M, 1), 2), np.int32)
    if M:
        med_f[:M, 0:9] = f64(scene.med_rot)[mv].reshape(M, 9)
        med_f[:M, 9:12] = f64(scene.med_trans)[mv]
        med_f[:M, 12:15] = f64(scene.med_lo)[mv]
        med_f[:M, 15:18] = f64(scene.med_hi)[mv]
        med_f[:M, 18:21] = f64(scene.med_sph_center)[mv]
        med_f[:M, 21] = f64(scene.med_sph_radius)[mv] ** 2
        med_f[:M, 22] = f64(scene.med_neg_inv_density)[mv]
        med_i[:M, 0] = np.asarray(scene.med_type)[mv]
        med_i[:M, 1] = np.asarray(scene.med_mat)[mv]

    # material lane-gather table: fields x entries
    mat_cols = np.stack([
        np.asarray(scene.mat_type, np.float32),
        np.asarray(scene.mat_tex, np.float32),
        f64(scene.mat_albedo)[:, 0], f64(scene.mat_albedo)[:, 1],
        f64(scene.mat_albedo)[:, 2],
        f64(scene.mat_fuzz), f64(scene.mat_ir),
    ]).astype(np.float32)
    mat_tab = _chunk_table(mat_cols)

    tex_cols = np.stack([
        np.asarray(scene.tex_type, np.float32),
        np.asarray(scene.tex_even, np.float32),
        np.asarray(scene.tex_odd, np.float32),
        f64(scene.tex_rgb)[:, 0], f64(scene.tex_rgb)[:, 1],
        f64(scene.tex_rgb)[:, 2],
        f64(scene.tex_inv_scale) + f64(scene.tex_noise_scale),  # disjoint use
    ]).astype(np.float32)
    tex_tab = _chunk_table(tex_cols)

    if bvh is not None:
        bvh_f = np.concatenate([bvh.node_min, bvh.node_max], -1).astype(np.float32)
        bvh_i = np.stack([bvh.skip, bvh.leaf_start, bvh.leaf_count,
                          bvh.leaf_scount], -1).astype(np.int32)
        prim_i = bvh.prim_stream.astype(np.int32)
    else:
        bvh_f = np.zeros((1, 6), np.float32)
        bvh_i = np.zeros((1, 4), np.int32)
        prim_i = np.zeros((1, 2), np.int32)

    # image texture: box-filter mip to <= IMG_MAX_TEXELS, lane-gather chunks
    tex_types = np.asarray(scene.tex_type)
    has_image = bool(scene.has_image)
    img = np.asarray(scene.image, np.float64)
    ih, iw = img.shape[0], img.shape[1]
    if has_image and ih * iw > IMG_MAX_TEXELS:
        f = int(np.ceil(np.sqrt(ih * iw / IMG_MAX_TEXELS)))
        ch, cw = (ih // f) * f, (iw // f) * f
        img = img[:ch, :cw].reshape(ch // f, f, cw // f, f, 3).mean((1, 3))
        ih, iw = img.shape[0], img.shape[1]
    img_cols = img.reshape(-1, 3).T.astype(np.float32)  # (3, H*W)
    img_tab = _chunk_table(img_cols)

    return _PackedScene(
        sph_f=sph_f, sph_m=sph_m, quad_f=quad_f, quad_m=quad_m,
        med_f=med_f, med_i=med_i, mat_tab=mat_tab, tex_tab=tex_tab,
        tex_extra=np.zeros(1, np.float32),
        bvh_f=bvh_f, bvh_i=bvh_i, prim_i=prim_i,
        background=np.asarray(scene.background, np.float64),
        n_mat_chunks=mat_tab.shape[1], n_tex_chunks=tex_tab.shape[1],
        n_spheres=S, n_quads=Q, n_media=M,
        has_checker=bool((tex_types == TEX_CHECKER).any()),
        has_noise=bool((tex_types == TEX_NOISE).any()),
        img_tab=img_tab, img_h=ih, img_w=iw, has_image=has_image,
    )


@dataclasses.dataclass
class _KernelBVH:
    """Flat skip-link tree with contiguous leaf runs over a reordered
    primitive stream — models/bvh.py's layout specialized for the kernel."""

    node_min: np.ndarray   # (N,3)
    node_max: np.ndarray   # (N,3)
    skip: np.ndarray       # (N,)
    leaf_start: np.ndarray  # (N,)
    leaf_count: np.ndarray  # (N,) 0 for interior
    leaf_scount: np.ndarray  # (N,) leading sphere count of the leaf run
    prim_stream: np.ndarray  # (P,2) ptype pidx, leaf order, spheres first


def build_kernel_bvh(scene, leaf_size: Optional[int] = None, seed: int = 0,
                     axis_mode: str = "largest") -> Optional[_KernelBVH]:
    """Median-split BVH flattened with leaf RUNS: leaves hold up to
    ``leaf_size`` primitives stored contiguously in a reordered stream, so
    the kernel tests them with one dynamic-bound loop. ``leaf_size`` defaults
    to 16 (RT_BVH_LEAF overrides, for crossover sweeps).

    The reference picks a RANDOM split axis (bvh.rs:32); that is a tree-
    quality decision, not a semantics one — traversal results are identical
    for any tree. For packet traversal the largest-extent axis produces far
    tighter sibling boxes (measured: fewer leaves pass the whole-tile AABB
    test), so that is the default; ``axis_mode='random'`` reproduces the
    reference's build order."""
    import os

    from ..models import bvh as bvh_mod

    if leaf_size is None:
        leaf_size = int(os.environ.get("RT_BVH_LEAF", "16"))

    sv = np.asarray(scene.sph_valid)
    qv = np.asarray(scene.quad_valid)

    class _B:  # adapter for bvh_mod.primitive_boxes over valid prims only
        sph_center = np.asarray(scene.sph_center)[sv]
        sph_radius = np.asarray(scene.sph_radius)[sv]
        sph_cvec = np.asarray(scene.sph_cvec)[sv]
        quad_q = np.asarray(scene.quad_q)[qv]
        quad_u = np.asarray(scene.quad_u)[qv]
        quad_v = np.asarray(scene.quad_v)[qv]
        num_spheres = int(sv.sum())
        num_quads = int(qv.sum())

    box_min, box_max, ptype, pidx = bvh_mod.primitive_boxes(_B)
    n = len(pidx)
    if n == 0:
        return None
    rng = np.random.default_rng(seed)

    node_min, node_max, skip, lstart, lcount, lscount = [], [], [], [], [], []
    stream = []

    def emit(lo, hi, start, count, scount=0):
        node_min.append(lo); node_max.append(hi)
        skip.append(-1); lstart.append(start); lcount.append(count)
        lscount.append(scount)
        return len(skip) - 1

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * n + 100))

    def rec(order):
        lo = box_min[order].min(0)
        hi = box_max[order].max(0)
        if len(order) <= leaf_size:
            # spheres first, quads after (stable within each type): the walk
            # then runs two TYPED prim loops with zero per-prim lax.cond —
            # the per-prim scalar branch was the dominant walk cost on
            # leaf-heavy scenes (hundreds of scalar-core branches per tile)
            start = len(stream)
            sph = [p for p in order if ptype[p] == 0]
            qds = [p for p in order if ptype[p] != 0]
            stream.extend((0, int(pidx[p])) for p in sph)
            stream.extend((1, int(pidx[p])) for p in qds)
            return emit(lo, hi, start, len(order), len(sph))
        me = emit(lo, hi, 0, 0)
        if axis_mode == "random":
            axis = int(rng.integers(0, 3))  # bvh.rs:32
        else:
            axis = int(np.argmax(hi - lo))
        sorted_order = order[np.argsort(box_min[order][:, axis], kind="stable")]
        half = len(order) // 2
        rec(sorted_order[:half])
        rec(sorted_order[half:])
        skip[me] = len(skip)
        return me

    rec(np.arange(n))
    sys.setrecursionlimit(old)

    N = len(skip)
    skip_arr = np.asarray(skip, np.int64)
    unset = skip_arr < 0
    skip_arr[unset] = np.arange(N)[unset] + 1
    return _KernelBVH(
        node_min=np.asarray(node_min, np.float64).reshape(N, 3),
        node_max=np.asarray(node_max, np.float64).reshape(N, 3),
        skip=skip_arr.astype(np.int32),
        leaf_start=np.asarray(lstart, np.int32),
        leaf_count=np.asarray(lcount, np.int32),
        leaf_scount=np.asarray(lscount, np.int32),
        prim_stream=np.asarray(stream, np.int32).reshape(-1, 2),
    )


def _tex_reaches_image(scene, tex_ids) -> bool:
    """True if any texture id in ``tex_ids`` samples the image texture,
    directly or through one checker nesting level (the builder's limit)."""
    tex_type = np.asarray(scene.tex_type)
    tex_even = np.asarray(scene.tex_even)
    tex_odd = np.asarray(scene.tex_odd)
    for t in np.unique(np.asarray(tex_ids)):
        if tex_type[t] == TEX_IMAGE:
            return True
        if tex_type[t] == TEX_CHECKER and (
                tex_type[tex_even[t]] == TEX_IMAGE
                or tex_type[tex_odd[t]] == TEX_IMAGE):
            return True
    return False


def supports(scene) -> bool:
    """Megakernel coverage: every reference scene family. Image textures
    sample an IMG_MAX_TEXELS mip via chunked lane gathers using the SPHERE
    UV formula (sphere.rs:48-52) only — quad (α,β) UVs (quad.rs:131) and
    medium hits are not tracked in the kernel, so a scene routing an image
    texture to a quad or medium material would render silently wrong here:
    it returns False and takes the XLA path (which tracks all UV families,
    ops/intersect.py). No reference scene maps an image onto a quad/medium."""
    if not scene.has_image:
        return True
    nonsphere_mats = []
    if scene.has_quads:
        qv = np.asarray(scene.quad_valid)
        nonsphere_mats.append(np.asarray(scene.quad_mat)[qv])
    if scene.has_media:
        mv = np.asarray(scene.med_valid)
        nonsphere_mats.append(np.asarray(scene.med_mat)[mv])
    if not nonsphere_mats:
        return True
    mats = np.unique(np.concatenate(nonsphere_mats))
    return not _tex_reaches_image(scene, np.asarray(scene.mat_tex)[mats])


# ------------------------------------------------------------ lane-gather op
def _gather_table(tab_ref, field: int, n_chunks: int, idx):
    """Per-lane table lookup: tab[(field, chunk)] is a row-replicated (8,128)
    tile; gather entry ``idx`` (int vector (8,128)) along the lane axis."""
    out = jnp.zeros(idx.shape, jnp.float32)
    for c in range(n_chunks):
        tile = tab_ref[field, c]
        local = idx - c * LANES
        g = jnp.take_along_axis(tile, jnp.clip(local, 0, LANES - 1), axis=1)
        out = jnp.where((local >= 0) & (local < LANES), g, out)
    return out


# ---------------------------------------------- transcendentals Mosaic lacks
def _atan_poly(r):
    """atan(r) for r in [0,1]: least-squares odd polynomial in r^2,
    |err| < 3e-7 — below the f32 resolution of the image-UV quantization."""
    r2 = r * r
    p = jnp.float32(-0.005020576)
    p = p * r2 + jnp.float32(0.025330155)
    p = p * r2 + jnp.float32(-0.060872567)
    p = p * r2 + jnp.float32(0.100020881)
    p = p * r2 + jnp.float32(-0.140477845)
    p = p * r2 + jnp.float32(0.199740231)
    p = p * r2 + jnp.float32(-0.333322323)
    p = p * r2 + jnp.float32(0.999999923)
    return p * r


def _atan2(y, x):
    """atan2 built from the [0,1] core (Mosaic has no atan2 primitive)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    r = mn / jnp.maximum(mx, 1e-30)
    a = _atan_poly(r)
    a = jnp.where(ay > ax, jnp.float32(math.pi / 2) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(math.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _arccos(x):
    """acos(x) via the Abramowitz–Stegun 4.4.45 polynomial, |err| < 2e-7."""
    xa = jnp.abs(jnp.clip(x, -1.0, 1.0))
    p = jnp.float32(-0.0012624911)
    p = p * xa + jnp.float32(0.0066700901)
    p = p * xa + jnp.float32(-0.0170881256)
    p = p * xa + jnp.float32(0.0308918810)
    p = p * xa + jnp.float32(-0.0501743046)
    p = p * xa + jnp.float32(0.0889789874)
    p = p * xa + jnp.float32(-0.2145988016)
    p = p * xa + jnp.float32(1.5707963050)
    a = p * jnp.sqrt(jnp.maximum(1.0 - xa, 0.0))
    return jnp.where(x < 0.0, jnp.float32(math.pi) - a, a)


# -------------------------------------------------------- hash-lattice noise
def _hash_grad(hx, hy, hz, salt):
    """Lattice gradient in [-1,1]^3 from integer corner coords — the same
    distribution as the reference's OS-random ranvec tables (perlin.rs:16-25,
    deliberately NOT normalized), addressed by hash instead of permutation
    tables (a fresh random instance of the same texture family)."""
    h = (hx.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         + hy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         + hz.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
         + jnp.uint32(salt))
    gx = 2.0 * hashrng._bits_to_unit_float(hashrng._mix(h)) - 1.0
    gy = 2.0 * hashrng._bits_to_unit_float(
        hashrng._mix(h + jnp.uint32(0x01000193))) - 1.0
    gz = 2.0 * hashrng._bits_to_unit_float(
        hashrng._mix(h + jnp.uint32(0x02000193 & 0xFFFFFFFF))) - 1.0
    return gx, gy, gz


def _noise(px, py, pz):
    """Perlin gradient noise (perlin.rs:27-49, 81-100): Hermite-smoothed
    trilinear interpolation of corner-gradient dot products; output in
    [-1, 1]-ish (can be negative, like the reference)."""
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    fz = jnp.floor(pz)
    ux, uy, uz = px - fx, py - fy, pz - fz
    # Hermite smooth (perlin.rs:85-87)
    sx = ux * ux * (3.0 - 2.0 * ux)
    sy = uy * uy * (3.0 - 2.0 * uy)
    sz = uz * uz * (3.0 - 2.0 * uz)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)

    acc = jnp.zeros_like(px)
    for di in (0, 1):
        wx = jnp.where(jnp.bool_(di), sx, 1.0 - sx)
        for dj in (0, 1):
            wy = jnp.where(jnp.bool_(dj), sy, 1.0 - sy)
            for dk in (0, 1):
                wz = jnp.where(jnp.bool_(dk), sz, 1.0 - sz)
                gx, gy, gz = _hash_grad(ix + di, iy + dj, iz + dk, 0x5EED)
                dot = (gx * (ux - di) + gy * (uy - dj) + gz * (uz - dk))
                acc = acc + wx * wy * wz * dot
    return acc


def _turbulence(px, py, pz, depth=7):
    """perlin.rs:52-64: |sum of w^k noise(2^k p)|."""
    acc = jnp.zeros_like(px)
    w = 1.0
    s = 1.0
    for _ in range(depth):
        acc = acc + w * _noise(px * s, py * s, pz * s)
        w *= 0.5
        s *= 2.0
    return jnp.abs(acc)


# ----------------------------------------------------------------- the kernel
def _make_kernel(cam, width, height, spp, max_depth, dims, flags, med_types,
                 img_dims, origin_eps_abs=1e-4,
                 origin_eps_rel=2e-4, record_mode=False, hit_mode=False):
    """Build the persistent path-regeneration kernel.

    dims: (S, Q, M, n_mat_chunks, n_tex_chunks, n_bvh_nodes)
    flags: (use_bvh, has_checker, has_noise, has_media, has_image)
    med_types: tuple of MED_SPHERE/MED_BOX codes, one per medium — static
      (a scene's media kinds never change; keeps runtime branching out of the
      kernel, where Mosaic cannot legalize an scf.if over vector results).
    img_dims: (img_h, img_w, n_img_chunks) of the mipped image texture.

    ``hit_mode`` (implies record semantics): a SINGLE-BOUNCE closest-hit
    kernel over externally supplied rays — the search half of the sorted
    deferred wavefront (ops/wavefront.py). Inputs are per-lane ray SoA blocks
    (o, d, time, pixel, sample, alive); output is the packed winner record.
    RNG addressing uses the riding (pixel, sample) ids + the bounce index
    from the scalar array, so sorting/permuting lanes never changes any
    random stream.
    """
    S, Q, M, CM, CT, NB = dims
    use_bvh, has_checker, has_noise, has_media, has_image = flags
    IH, IW, CI = img_dims

    cx, cy, cz = (float(v) for v in cam.center)
    p00x, p00y, p00z = (float(v) for v in cam.pixel00_loc)
    dux, duy, duz = (float(v) for v in cam.pixel_delta_u)
    dvx, dvy, dvz = (float(v) for v in cam.pixel_delta_v)
    ddux, dduy, dduz = (float(v) for v in cam.defocus_disk_u)
    ddvx, ddvy, ddvz = (float(v) for v in cam.defocus_disk_v)
    has_defocus = cam.defocus_angle > 0.0
    bg_r, bg_g, bg_b = (float(v) for v in cam.background)

    nbx = (width + BLOCK - 1) // BLOCK

    def kernel(sph_f, sph_m, quad_f, quad_m, med_f, med_i,
               mat_tab, tex_tab, img_tab, bvh_f, bvh_i, prim_i, seed_ref,
               *rest):
        if hit_mode:
            (ox_in, oy_in, oz_in, dx_in, dy_in, dz_in, rt_in,
             pid_in, samp_in, alive_in, out_rec) = rest
        elif record_mode:
            (out_rec,) = rest
        else:
            out_r, out_g, out_b, out_n = rest
        # SMEM tables arrive FLATTENED to 1-D: Mosaic pads 2-D SMEM rows to
        # 512 bytes, which blows the 1 MB SMEM budget at final_scene sizes.
        sphf = lambda i, k: sph_f[i * 8 + k]
        quadf = lambda i, k: quad_f[i * 16 + k]
        medf = lambda i, k: med_f[i * 24 + k]
        medi = lambda i, k: med_i[i * 2 + k]
        bvhf = lambda i, k: bvh_f[i * 6 + k]
        bvhi = lambda i, k: bvh_i[i * 4 + k]
        primi = lambda i, k: prim_i[i * 2 + k]
        seed_val = seed_ref[0]
        shape = (ROWS, LANES)
        if hit_mode:
            pid = pid_in[...]
            fzero = pid.astype(jnp.float32) * 0.0
            izero = pid * 0
        else:
            # global tile id = grid position + this dispatch's tile offset
            # (the host chunks heavy renders over several pallas_calls so no
            # single device program runs past the runtime watchdog)
            tile = pl.program_id(0) + seed_ref[1]
            # RUNTIME sample offset (seed_ref[2]): one compiled kernel serves
            # any (tile-range, sample-range) shard — under shard_map every
            # device derives its own offsets from its mesh coordinates (SPMD
            # sharding of the megakernel; parallel/render_dist.py)
            sample_offset = seed_ref[2]

            lane = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
                    * LANES
                    + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
            # 32x32 block swizzle: coherent packets for the shared BVH walk
            bx = (tile % nbx) * BLOCK
            by = (tile // nbx) * BLOCK
            px_i = jnp.minimum(bx + lane % BLOCK, width - 1)
            px_j = jnp.minimum(by + lane // BLOCK, height - 1)
            pid = px_j * width + px_i
            pi = px_i.astype(jnp.float32)
            pj = px_j.astype(jnp.float32)

            fzero = pi * 0.0  # concrete-layout zero (Mosaic carry req.)
            izero = pid * 0

        def tex_value(tid, hpx, hpy, hpz, tex_u, tex_v):
            """solid/checker/noise/image texture value at world point p
            with (u,v) surface coordinates (sphere UVs; quad image UVs are
            not tracked — no reference scene needs them)."""
            def leaf(tid_):
                r = _gather_table(tex_tab, 3, CT, tid_)
                g = _gather_table(tex_tab, 4, CT, tid_)
                b = _gather_table(tex_tab, 5, CT, tid_)
                if has_noise:
                    tt = _gather_table(tex_tab, 0, CT, tid_)
                    sc = _gather_table(tex_tab, 6, CT, tid_)
                    # marble: sin(scale*z + 10*turb(p,7))*0.5+0.5
                    # (texture.rs:107-111)
                    marble = (jnp.sin(sc * hpz
                                      + 10.0 * _turbulence(hpx, hpy, hpz))
                              * 0.5 + 0.5)
                    is_noise = tt == float(TEX_NOISE)
                    r = jnp.where(is_noise, marble, r)
                    g = jnp.where(is_noise, marble, g)
                    b = jnp.where(is_noise, marble, b)
                if has_image:
                    # nearest-neighbor, u clamp, v flip (texture.rs:83-93);
                    # decode to linear happened at scene build
                    tt = _gather_table(tex_tab, 0, CT, tid_)
                    uc = jnp.clip(tex_u, 0.0, 1.0)
                    vc = 1.0 - jnp.clip(tex_v, 0.0, 1.0)
                    ti = (uc * (IW - 1)).astype(jnp.int32)
                    tj = (vc * (IH - 1)).astype(jnp.int32)
                    lin = tj * IW + ti
                    is_img = tt == float(TEX_IMAGE)
                    r = jnp.where(is_img, _gather_table(img_tab, 0, CI, lin), r)
                    g = jnp.where(is_img, _gather_table(img_tab, 1, CI, lin), g)
                    b = jnp.where(is_img, _gather_table(img_tab, 2, CI, lin), b)
                return r, g, b

            r, g, b = leaf(tid)
            if has_checker:
                tt = _gather_table(tex_tab, 0, CT, tid)
                inv = _gather_table(tex_tab, 6, CT, tid)
                fsum = (jnp.floor(inv * hpx) + jnp.floor(inv * hpy)
                        + jnp.floor(inv * hpz))
                even_sel = jnp.mod(fsum, 2.0) == 0.0
                even_id = _gather_table(tex_tab, 1, CT, tid).astype(jnp.int32)
                odd_id = _gather_table(tex_tab, 2, CT, tid).astype(jnp.int32)
                child = jnp.where(even_sel, even_id, odd_id)
                cr, cg, cb = leaf(child)
                is_chk = tt == float(TEX_CHECKER)
                r = jnp.where(is_chk, cr, r)
                g = jnp.where(is_chk, cg, g)
                b = jnp.where(is_chk, cb, b)
            return r, g, b

        # ---------------- per-primitive tests (SMEM scalar reads) ----------
        def sphere_test(i, st):
            """sphere.rs:59-89 + moving-center lerp :60-64."""
            (ox, oy, oz, dx, dy, dz, rtime, a_len, inv_a,
             t_best, w_mat, w_nx, w_ny, w_nz, w_med, w_kind, w_idx) = st
            ccx = sphf(i, 0) + sphf(i, 5) * rtime
            ccy = sphf(i, 1) + sphf(i, 6) * rtime
            ccz = sphf(i, 2) + sphf(i, 7) * rtime
            r2 = sphf(i, 3)
            inv_r = sphf(i, 4)
            ocx, ocy, ocz = ox - ccx, oy - ccy, oz - ccz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            disc = half_b * half_b - a_len * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            r1 = (-half_b - sq) * inv_a
            rr2 = (-half_b + sq) * inv_a
            ok1 = (r1 > T_MIN) & (r1 < t_best)
            ok2 = (rr2 > T_MIN) & (rr2 < t_best)
            root = jnp.where(ok1, r1, rr2)
            hit = (disc > 0.0) & (ok1 | ok2)
            t_best = jnp.where(hit, root, t_best)
            w_mat = jnp.where(hit, sph_m[i], w_mat)
            w_nx = jnp.where(hit, (ox + root * dx - ccx) * inv_r, w_nx)
            w_ny = jnp.where(hit, (oy + root * dy - ccy) * inv_r, w_ny)
            w_nz = jnp.where(hit, (oz + root * dz - ccz) * inv_r, w_nz)
            w_med = jnp.where(hit, 0.0, w_med)
            if record_mode:
                w_kind = jnp.where(hit, 1, w_kind)
                w_idx = jnp.where(hit, i, w_idx)
            return (ox, oy, oz, dx, dy, dz, rtime, a_len, inv_a,
                    t_best, w_mat, w_nx, w_ny, w_nz, w_med, w_kind, w_idx)

        def quad_test(i, st):
            """quad.rs:96-133 (inclusive bounds, no back-face culling)."""
            (ox, oy, oz, dx, dy, dz, rtime, a_len, inv_a,
             t_best, w_mat, w_nx, w_ny, w_nz, w_med, w_kind, w_idx) = st
            nx, ny, nz = quadf(i, 9), quadf(i, 10), quadf(i, 11)
            denom = nx * dx + ny * dy + nz * dz
            safe = jnp.where(jnp.abs(denom) < 1e-30, jnp.float32(1e-30), denom)
            t = (quadf(i, 15) - (nx * ox + ny * oy + nz * oz)) / safe
            hx = ox + t * dx - quadf(i, 0)
            hy = oy + t * dy - quadf(i, 1)
            hz = oz + t * dz - quadf(i, 2)
            ux, uy, uz = quadf(i, 3), quadf(i, 4), quadf(i, 5)
            vx, vy, vz = quadf(i, 6), quadf(i, 7), quadf(i, 8)
            wx, wy, wz = quadf(i, 12), quadf(i, 13), quadf(i, 14)
            alpha = (wx * (hy * vz - hz * vy) + wy * (hz * vx - hx * vz)
                     + wz * (hx * vy - hy * vx))
            beta = (wx * (uy * hz - uz * hy) + wy * (uz * hx - ux * hz)
                    + wz * (ux * hy - uy * hx))
            hit = ((jnp.abs(denom) >= QUAD_DENOM_EPS)
                   & (t >= T_MIN) & (t < t_best)
                   & (alpha >= 0.0) & (alpha <= 1.0)
                   & (beta >= 0.0) & (beta <= 1.0))
            t_best = jnp.where(hit, t, t_best)
            w_mat = jnp.where(hit, quad_m[i], w_mat)
            w_nx = jnp.where(hit, nx, w_nx)
            w_ny = jnp.where(hit, ny, w_ny)
            w_nz = jnp.where(hit, nz, w_nz)
            w_med = jnp.where(hit, 0.0, w_med)
            if record_mode:
                w_kind = jnp.where(hit, 2, w_kind)
                w_idx = jnp.where(hit, i, w_idx)
            return (ox, oy, oz, dx, dy, dz, rtime, a_len, inv_a,
                    t_best, w_mat, w_nx, w_ny, w_nz, w_med, w_kind, w_idx)

        def closest_surface(ox, oy, oz, dx, dy, dz, rtime, alive):
            a_len = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / jnp.maximum(a_len, 1e-30)
            t_best = jnp.where(alive, jnp.float32(jnp.inf), T_MIN)
            st = (ox, oy, oz, dx, dy, dz, rtime, a_len, inv_a,
                  t_best, izero, fzero, fzero, fzero + 1.0, fzero,
                  izero, izero)
            if not use_bvh:
                if S:
                    st = jax.lax.fori_loop(0, S, sphere_test, st)
                if Q:
                    st = jax.lax.fori_loop(0, Q, quad_test, st)
            else:
                inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-30, 1e-30, dx)
                inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-30, 1e-30, dy)
                inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)

                # leaf runs store spheres first, quads after: two TYPED
                # loops, no per-prim lax.cond (the scalar branch per prim
                # was the dominant walk cost on leaf-heavy scenes)
                def prim_sph(p, st_):
                    return sphere_test(primi(p, 1), st_)

                def prim_quad(p, st_):
                    return quad_test(primi(p, 1), st_)

                def walk_cond(wst):
                    ptr, _ = wst
                    return ptr < NB

                def walk_body(wst):
                    ptr, st_ = wst
                    t_best_ = st_[9]
                    # slab test vs the flattened node (aabb.rs:64-84)
                    t0x = (bvhf(ptr, 0) - st_[0]) * inv_dx
                    t1x = (bvhf(ptr, 3) - st_[0]) * inv_dx
                    t0y = (bvhf(ptr, 1) - st_[1]) * inv_dy
                    t1y = (bvhf(ptr, 4) - st_[1]) * inv_dy
                    t0z = (bvhf(ptr, 2) - st_[2]) * inv_dz
                    t1z = (bvhf(ptr, 5) - st_[2]) * inv_dz
                    tmn = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), jnp.float32(T_MIN)))
                    tmx = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), t_best_))
                    box_hit = alive & (tmx > tmn)
                    any_hit = jnp.any(box_hit)
                    count = bvhi(ptr, 2)

                    def do_leaf(s):
                        start = bvhi(ptr, 1)
                        scount = bvhi(ptr, 3)
                        s = jax.lax.fori_loop(start, start + scount,
                                              prim_sph, s)
                        return jax.lax.fori_loop(start + scount,
                                                 start + count, prim_quad, s)

                    st_ = jax.lax.cond(any_hit & (count > 0), do_leaf,
                                       lambda s: s, st_)
                    ptr = jax.lax.select(any_hit, ptr + 1, bvhi(ptr, 0))
                    return ptr, st_

                _, st = jax.lax.while_loop(walk_cond, walk_body,
                                           (jnp.int32(0), st))
            return (st[9], st[10], st[11], st[12], st[13], st[14],
                    st[15], st[16], a_len, inv_a)

        # ---------------- camera-ray generation (camera.rs:112-137) --------
        def camera_ray(s_glob):
            rng = CounterRng(seed_val, pid, s_glob)
            jx = rng.uniform(hashrng.SITE_PIXEL_JX) - 0.5
            jy = rng.uniform(hashrng.SITE_PIXEL_JY) - 0.5
            sx = p00x + (pi + jx) * dux + (pj + jy) * dvx
            sy = p00y + (pi + jx) * duy + (pj + jy) * dvy
            sz = p00z + (pi + jx) * duz + (pj + jy) * dvz
            if has_defocus:
                ca, sa = rng.in_unit_disk(hashrng.SITE_DEFOCUS_R,
                                          hashrng.SITE_DEFOCUS_TH)
                nox = cx + ca * ddux + sa * ddvx
                noy = cy + ca * dduy + sa * ddvy
                noz = cz + ca * dduz + sa * ddvz
            else:
                nox = jnp.full(shape, cx)
                noy = jnp.full(shape, cy)
                noz = jnp.full(shape, cz)
            return (nox, noy, noz, sx - nox, sy - noy, sz - noz,
                    rng.uniform(hashrng.SITE_TIME))

        # ---------------- one bounce: hit + media + shade + advance --------
        # shared by the persistent render loop and the record-mode kernel;
        # returns the advanced path state, the scatter mask, and (in record
        # mode) the packed winner record kind*2^24 | idx.
        def trace_bounce(ox, oy, oz, dx, dy, dz, rtime,
                         tp_r, tp_g, tp_b, rad_r, rad_g, rad_b,
                         alive, depth_left_ok, rngb):
            # -- closest surface hit
            (t_best, w_mat, w_nx, w_ny, w_nz, w_med, w_kind, w_idx,
             a_len, inv_a) = \
                closest_surface(ox, oy, oz, dx, dy, dz, rtime, alive)

            # -- constant media (constant_medium.rs:34-71)
            if has_media:
                for i in range(M):
                    def box_seg(_):
                        rx = ox - medf(i, 9)
                        ry = oy - medf(i, 10)
                        rz = oz - medf(i, 11)
                        lox = medf(i, 0) * rx + medf(i, 1) * ry + medf(i, 2) * rz
                        loy = medf(i, 3) * rx + medf(i, 4) * ry + medf(i, 5) * rz
                        loz = medf(i, 6) * rx + medf(i, 7) * ry + medf(i, 8) * rz
                        ldx = medf(i, 0) * dx + medf(i, 1) * dy + medf(i, 2) * dz
                        ldy = medf(i, 3) * dx + medf(i, 4) * dy + medf(i, 5) * dz
                        ldz = medf(i, 6) * dx + medf(i, 7) * dy + medf(i, 8) * dz
                        entry = jnp.full(shape, -jnp.inf)
                        exit_ = jnp.full(shape, jnp.inf)
                        for ax, (oo, dd2) in enumerate(
                                ((lox, ldx), (loy, ldy), (loz, ldz))):
                            invd = 1.0 / jnp.where(jnp.abs(dd2) < 1e-30,
                                                   jnp.float32(1e-30), dd2)
                            t0 = (medf(i, 12 + ax) - oo) * invd
                            t1 = (medf(i, 15 + ax) - oo) * invd
                            entry = jnp.maximum(entry, jnp.minimum(t0, t1))
                            exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
                        return entry, exit_, entry < exit_

                    def sph_seg(_):
                        ocx = ox - medf(i, 18)
                        ocy = oy - medf(i, 19)
                        ocz = oz - medf(i, 20)
                        half_b = ocx * dx + ocy * dy + ocz * dz
                        c = (ocx * ocx + ocy * ocy + ocz * ocz
                             - medf(i, 21))
                        disc = half_b * half_b - a_len * c
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        return ((-half_b - sq) * inv_a,
                                (-half_b + sq) * inv_a, disc > 0.0)

                    if med_types[i] == MED_BOX:
                        entry, exit_, okb = box_seg(0)
                    else:
                        entry, exit_, okb = sph_seg(0)
                    entry = jnp.maximum(entry, jnp.float32(T_MIN))
                    exit_ = jnp.minimum(exit_, t_best)
                    okb = okb & (entry < exit_)
                    ray_len = jnp.sqrt(a_len)
                    dist_in = (exit_ - entry) * ray_len
                    u = jnp.maximum(rngb.uniform(hashrng.SITE_MEDIUM + i),
                                    1e-12)
                    hd = medf(i, 22) * jnp.log(u)
                    okb = okb & (hd <= dist_in)
                    t_m = entry + hd / ray_len
                    hit = okb & (t_m < t_best)
                    t_best = jnp.where(hit, t_m, t_best)
                    w_mat = jnp.where(hit, medi(i, 1), w_mat)
                    w_med = jnp.where(hit, 1.0, w_med)
                    if record_mode:
                        w_kind = jnp.where(hit, 3 + i, w_kind)
                        w_idx = jnp.where(hit, 0, w_idx)

            w_is_med = w_med > 0.0
            hit_any = jnp.isfinite(t_best) & alive
            miss = alive & ~hit_any

            # Record mode is LEAN: records + path continuation never depend
            # on texture values or radiance (winner ids come from geometry;
            # scatter directions from geometry + RNG; the scattered flag from
            # material type / fuzz only), so the whole texture/emission/
            # throughput subgraph is skipped — the recorder runs at search
            # speed even for image/noise scenes (the deferred-shading path
            # replays those in full-fidelity XLA).
            if not record_mode:
                # background on miss (renderer.rs:152-154)
                rad_r = rad_r + jnp.where(miss, tp_r * bg_r, 0.0)
                rad_g = rad_g + jnp.where(miss, tp_g * bg_g, 0.0)
                rad_b = rad_b + jnp.where(miss, tp_b * bg_b, 0.0)

            t_safe = jnp.where(hit_any, t_best, 0.0)
            hpx = ox + t_safe * dx
            hpy = oy + t_safe * dy
            hpz = oz + t_safe * dz

            # flip normal toward the ray (hittable.rs:22-37); medium "normal"
            # is the ray direction -> front_face False
            mx = jnp.where(w_is_med, dx, w_nx)
            my = jnp.where(w_is_med, dy, w_ny)
            mz = jnp.where(w_is_med, dz, w_nz)
            ndotd = jnp.where(w_is_med, a_len, w_nx * dx + w_ny * dy + w_nz * dz)
            front = ndotd < 0.0
            sign = jnp.where(front, 1.0, -1.0)
            nx_ = sign * mx
            ny_ = sign * my
            nz_ = sign * mz

            # -- material tables via chunked lane gathers
            m_type = _gather_table(mat_tab, 0, CM, w_mat)
            fuzz = _gather_table(mat_tab, 5, CM, w_mat)
            ir = _gather_table(mat_tab, 6, CM, w_mat)

            is_lam = m_type == float(LAMBERTIAN)
            is_metal = m_type == float(METAL)
            is_diel = m_type == float(DIELECTRIC)
            is_light = m_type == float(DIFFUSE_LIGHT)
            is_iso = m_type == float(ISOTROPIC)

            if not record_mode:
                m_tex = _gather_table(mat_tab, 1, CM, w_mat).astype(jnp.int32)
                al_r = _gather_table(mat_tab, 2, CM, w_mat)
                al_g = _gather_table(mat_tab, 3, CM, w_mat)
                al_b = _gather_table(mat_tab, 4, CM, w_mat)
                if has_image:
                    # sphere UV from the outward normal (sphere.rs:48-52):
                    # theta = acos(-n.y), phi = atan2(-n.z, n.x) + pi
                    theta = _arccos(-w_ny)
                    phi = _atan2(-w_nz, w_nx) + jnp.float32(math.pi)
                    tex_u = phi * jnp.float32(1.0 / _TWO_PI)
                    tex_v = theta * jnp.float32(1.0 / math.pi)
                else:
                    tex_u = tex_v = fzero
                tex_r, tex_g, tex_b = tex_value(m_tex, hpx, hpy, hpz,
                                                tex_u, tex_v)

                # emission (material.rs:114-122) — pre-scatter throughput
                em = hit_any & is_light
                rad_r = rad_r + jnp.where(em, tp_r * tex_r, 0.0)
                rad_g = rad_g + jnp.where(em, tp_g * tex_g, 0.0)
                rad_b = rad_b + jnp.where(em, tp_b * tex_b, 0.0)

            # -- scatter
            uvx, uvy, uvz = rngb.unit_vector(hashrng.SITE_SCATTER_Z,
                                             hashrng.SITE_SCATTER_PHI)
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
            fx, fy, fz = rngb.in_unit_sphere(hashrng.SITE_FUZZ_Z,
                                             hashrng.SITE_FUZZ_PHI,
                                             hashrng.SITE_FUZZ_R)
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
            coin = rngb.uniform(hashrng.SITE_SCHLICK)
            do_refl = cannot | (refl > coin)
            rpx = ratio * (udx + cos_t * nx_)
            rpy = ratio * (udy + cos_t * ny_)
            rpz = ratio * (udz + cos_t * nz_)
            plen = jnp.maximum(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz), 0.0)
            par = -jnp.sqrt(plen)
            rfx = rpx + par * nx_
            rfy = rpy + par * ny_
            rfz = rpz + par * nz_
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

            scattered = (is_metal & metal_ok) | (~is_metal & ~is_light)
            # depth budget: path dies when its (max_depth)th segment ends
            # (renderer.rs:140-142 — accumulated radiance stays, rest black)
            scat = hit_any & scattered & depth_left_ok

            if not record_mode:
                at_r = jnp.where(is_metal, al_r,
                                 jnp.where(is_diel, 1.0, tex_r))
                at_g = jnp.where(is_metal, al_g,
                                 jnp.where(is_diel, 1.0, tex_g))
                at_b = jnp.where(is_metal, al_b,
                                 jnp.where(is_diel, 1.0, tex_b))
                tp_r = jnp.where(scat, tp_r * at_r, tp_r)
                tp_g = jnp.where(scat, tp_g * at_g, tp_g)
                tp_b = jnp.where(scat, tp_b * at_b, tp_b)

            # f32 origin offset (see ops/integrator.py), media excluded
            side = jnp.sign(new_dx * nx_ + new_dy * ny_ + new_dz * nz_)
            mag = jnp.maximum(jnp.abs(hpx),
                              jnp.maximum(jnp.abs(hpy), jnp.abs(hpz)))
            eps = origin_eps_abs + origin_eps_rel * mag
            off = jnp.where(w_is_med, 0.0, side * eps)
            ox = jnp.where(scat, hpx + off * nx_, ox)
            oy = jnp.where(scat, hpy + off * ny_, oy)
            oz = jnp.where(scat, hpz + off * nz_, oz)
            dx = jnp.where(scat, new_dx, dx)
            dy = jnp.where(scat, new_dy, dy)
            dz = jnp.where(scat, new_dz, dz)

            if record_mode:
                # packed winner record (ops/replay.py encoding); 0 for lanes
                # that were dead or missed
                rec = jnp.where(alive & hit_any,
                                (w_kind << 24) | w_idx, izero)
            else:
                rec = izero
            return (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                    rad_r, rad_g, rad_b, scat, rec)

        if hit_mode:
            # ---------- single-bounce closest hit over supplied rays
            alive = alive_in[...] > 0.0
            rngb = CounterRng(seed_val, pid, samp_in[...], seed_ref[1])
            (_ox, _oy, _oz, _dx, _dy, _dz, _tr, _tg, _tb,
             _rr, _rg, _rb, _scat, rec) = trace_bounce(
                ox_in[...], oy_in[...], oz_in[...],
                dx_in[...], dy_in[...], dz_in[...], rt_in[...],
                fzero, fzero, fzero, fzero, fzero, fzero,
                alive, True, rngb)
            out_rec[...] = rec
            return

        if record_mode:
            # ---------- lockstep recorder: per-(sample, bounce) winner ids
            # (lean carry: no throughput/radiance — trace_bounce skips the
            # whole shading subgraph in record mode)
            def sample_loop(si, _):
                s_glob = si + sample_offset
                nox, noy, noz, ndx, ndy, ndz, ntime = camera_ray(s_glob)

                def depth_loop(di, dst):
                    (ox, oy, oz, dx, dy, dz, rtime, alive_f) = dst
                    alive = alive_f > 0.0
                    rngb = CounterRng(seed_val, pid, s_glob, di)
                    (ox, oy, oz, dx, dy, dz, _tp_r, _tp_g, _tp_b,
                     _rad_r, _rad_g, _rad_b, scat, rec) = trace_bounce(
                        ox, oy, oz, dx, dy, dz, rtime,
                        fzero, fzero, fzero, fzero, fzero, fzero,
                        alive, di + 1 < max_depth, rngb)
                    out_rec[pl.ds((si * max_depth + di) * ROWS, ROWS), :] = rec
                    return (ox, oy, oz, dx, dy, dz, rtime,
                            scat.astype(jnp.float32))

                jax.lax.fori_loop(
                    0, max_depth, depth_loop,
                    (nox, noy, noz, ndx, ndy, ndz, ntime, fzero + 1.0))
                return _

            jax.lax.fori_loop(0, spp, sample_loop, jnp.int32(0))
            return

        # ------------------------- persistent path-regeneration loop -------
        def cond(state):
            s_i, alive_f = state[0], state[1]
            return jnp.any((alive_f > 0.0) | (s_i < spp - 1))

        def body(state):
            (s_i, alive_f, d_i, ox, oy, oz, dx, dy, dz, rtime,
             tp_r, tp_g, tp_b, rad_r, rad_g, rad_b,
             acc_r, acc_g, acc_b, acc_n) = state
            alive = alive_f > 0.0

            # -- regenerate dead lanes that still have samples to trace
            regen = (~alive) & (s_i < spp - 1)
            s_i = jnp.where(regen, s_i + 1, s_i)
            s_glob = s_i + sample_offset
            nox, noy, noz, ndx, ndy, ndz, ntime = camera_ray(s_glob)
            ox = jnp.where(regen, nox, ox)
            oy = jnp.where(regen, noy, oy)
            oz = jnp.where(regen, noz, oz)
            dx = jnp.where(regen, ndx, dx)
            dy = jnp.where(regen, ndy, dy)
            dz = jnp.where(regen, ndz, dz)
            rtime = jnp.where(regen, ntime, rtime)
            tp_r = jnp.where(regen, 1.0, tp_r)
            tp_g = jnp.where(regen, 1.0, tp_g)
            tp_b = jnp.where(regen, 1.0, tp_b)
            rad_r = jnp.where(regen, 0.0, rad_r)
            rad_g = jnp.where(regen, 0.0, rad_g)
            rad_b = jnp.where(regen, 0.0, rad_b)
            d_i = jnp.where(regen, 0, d_i)
            alive = alive | regen
            alive_f = alive.astype(jnp.float32)
            acc_n = acc_n + alive_f

            rngb = CounterRng(seed_val, pid, s_glob, d_i)
            (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
             rad_r, rad_g, rad_b, scat, _rec) = trace_bounce(
                ox, oy, oz, dx, dy, dz, rtime,
                tp_r, tp_g, tp_b, rad_r, rad_g, rad_b,
                alive, d_i + 1 < max_depth, rngb)
            d_i = jnp.where(scat, d_i + 1, d_i)

            # -- flush finished paths into the per-lane accumulator
            died = alive & ~scat
            acc_r = acc_r + jnp.where(died, rad_r, 0.0)
            acc_g = acc_g + jnp.where(died, rad_g, 0.0)
            acc_b = acc_b + jnp.where(died, rad_b, 0.0)
            alive_f = scat.astype(jnp.float32)

            return (s_i, alive_f, d_i, ox, oy, oz, dx, dy, dz, rtime,
                    tp_r, tp_g, tp_b, rad_r, rad_g, rad_b,
                    acc_r, acc_g, acc_b, acc_n)

        state = (izero - 1, fzero, izero,
                 fzero, fzero, fzero, fzero, fzero, fzero + 1.0, fzero,
                 fzero, fzero, fzero, fzero, fzero, fzero,
                 fzero, fzero, fzero, fzero)
        state = jax.lax.while_loop(cond, body, state)
        acc_r, acc_g, acc_b, acc_n = state[16], state[17], state[18], state[19]
        inv = 1.0 / spp
        out_r[:] = acc_r * inv
        out_g[:] = acc_g * inv
        out_b[:] = acc_b * inv
        out_n[:] = acc_n

    return kernel


# ------------------------------------------------------------- call caching
# The tunnel between host and TPU makes per-call fixed costs expensive: a
# fresh jax.jit(pl.pallas_call(...)) re-traces the whole kernel (~100s of ms)
# and re-uploading the packed scene tables costs a round trip per array.
# Both are pure functions of (scene, kernel config), so cache them. Both are
# BOUNDED: _pack_cache sweeps dead weakrefs and LRU-evicts (device scene
# tables are HBM — an unbounded cache would leak one table set per
# compile_scene in a training loop), and _call_cache LRU-evicts so a moving/
# jittered camera can't accumulate compiled kernels without limit.
_pack_cache: "collections.OrderedDict" = collections.OrderedDict()
_PACK_CACHE_MAX = 8      # (id(scene), use_bvh) -> (weakref, packed, dev_args)
_call_cache: "collections.OrderedDict" = collections.OrderedDict()
_CALL_CACHE_MAX = 48     # static kernel config -> jitted pallas_call


def _cam_key(cam) -> tuple:
    import numpy as _np

    return tuple(
        float(v) for v in _np.concatenate([
            _np.asarray(cam.center, _np.float64).ravel(),
            _np.asarray(cam.pixel00_loc, _np.float64).ravel(),
            _np.asarray(cam.pixel_delta_u, _np.float64).ravel(),
            _np.asarray(cam.pixel_delta_v, _np.float64).ravel(),
            _np.asarray(cam.defocus_disk_u, _np.float64).ravel(),
            _np.asarray(cam.defocus_disk_v, _np.float64).ravel(),
            _np.asarray(cam.background, _np.float64).ravel(),
            [float(cam.defocus_angle)],
        ]))


def _packed_dev(scene, use_bvh: bool):
    """(packed, device_args, use_bvh) for a scene, cached by object identity —
    repeated renders/records of the same CompiledScene skip the host pack
    and the table re-upload entirely. The returned use_bvh reflects whether a
    tree actually exists (empty scenes build none)."""
    key = (id(scene), bool(use_bvh))
    ent = _pack_cache.get(key)
    if ent is not None and ent[0]() is scene:
        _pack_cache.move_to_end(key)
        return ent[1], ent[2], ent[3]
    # miss: sweep entries whose scene died (freeing their device tables) and
    # bound the cache so a compile-per-step training loop can't leak HBM
    dead = [k for k, e in _pack_cache.items() if e[0]() is None]
    for k in dead:
        del _pack_cache[k]
    while len(_pack_cache) >= _PACK_CACHE_MAX:
        _pack_cache.popitem(last=False)
    bvh = build_kernel_bvh(scene) if use_bvh else None
    use_bvh = bvh is not None
    packed = pack_scene(scene, bvh)
    j = jnp.asarray
    args = (j(packed.sph_f.reshape(-1)), j(packed.sph_m),
            j(packed.quad_f.reshape(-1)), j(packed.quad_m),
            j(packed.med_f.reshape(-1)), j(packed.med_i.reshape(-1)),
            j(packed.mat_tab), j(packed.tex_tab), j(packed.img_tab),
            j(packed.bvh_f.reshape(-1)), j(packed.bvh_i.reshape(-1)),
            j(packed.prim_i.reshape(-1)))
    try:
        ref = weakref.ref(scene)
    except TypeError:
        # non-weakrefable scene: cacheable but evictable (LRU bound above
        # keeps it from pinning the object forever)
        ref = lambda: scene
    _pack_cache[key] = (ref, packed, args, use_bvh)
    return packed, args, use_bvh


def _get_call(cam, width, height, spp, max_depth, dims, flags, med_types,
              img_dims, nt, record_mode, interpret, jit=True, vma=None):
    """Cached pallas_call for one static kernel configuration. ``jit=False``
    returns the raw (unjitted) callable for embedding inside shard_map;
    ``vma`` then names the mesh axes the outputs vary over (shard_map's
    check_vma requires pallas out_shapes to declare it).

    ``record_mode`` is False (render), True (path recorder), or "hit"
    (single-bounce closest-hit over supplied ray blocks — ops/wavefront.py).
    """
    key = (_cam_key(cam), width, height, spp, max_depth, dims, flags,
           med_types, img_dims, nt, record_mode, bool(interpret), bool(jit),
           vma)
    fn = _call_cache.get(key)
    if fn is not None:
        _call_cache.move_to_end(key)
        return fn
    while len(_call_cache) >= _CALL_CACHE_MAX:
        _call_cache.popitem(last=False)
    hit_mode = record_mode == "hit"
    kernel = _make_kernel(cam, width, height, spp, max_depth, dims, flags,
                          med_types, img_dims, record_mode=bool(record_mode),
                          hit_mode=hit_mode)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [smem(), smem(), smem(), smem(), smem(), smem(),
                vmem(), vmem(), vmem(),
                smem(), smem(), smem(), smem()]
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=frozenset(vma))
           if vma is not None else jax.ShapeDtypeStruct)
    if hit_mode:
        blk = lambda: pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        in_specs += [blk() for _ in range(10)]
        out_shape = [sds((nt * ROWS, LANES), jnp.int32)]
        out_specs = [blk()]
    elif record_mode:
        rows_per_tile = spp * max_depth * ROWS
        out_shape = [sds((nt * rows_per_tile, LANES), jnp.int32)]
        out_specs = [pl.BlockSpec((rows_per_tile, LANES), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shape = [sds((nt * ROWS, LANES), jnp.float32)
                     for _ in range(4)]
        out_specs = [pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in range(4)]
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    if jit:
        fn = jax.jit(fn)
    _call_cache[key] = fn
    return fn


def _render_tiles(packed: _PackedScene, cam, width, height, spp, max_depth,
                  use_bvh, sample_offset, seed, interpret, tile_chunk=None,
                  dev_args=None):
    S, Q, M = packed.n_spheres, packed.n_quads, packed.n_media
    dims = (S, Q, M, packed.n_mat_chunks, packed.n_tex_chunks,
            packed.bvh_i.shape[0])
    flags = (use_bvh, packed.has_checker, packed.has_noise, M > 0,
             packed.has_image)

    nbx = (width + BLOCK - 1) // BLOCK
    nby = (height + BLOCK - 1) // BLOCK
    n_tiles = nbx * nby

    med_types = tuple(int(t) for t in packed.med_i[:M, 0])
    img_dims = (packed.img_h, packed.img_w, packed.img_tab.shape[1])

    # Bound the work per device program: heavy workloads (final_scene at
    # depth 40, multi-thousand-spp Cornells) would otherwise run one XLA
    # program for minutes and trip the runtime watchdog. Estimate per-tile
    # VPU work and size each dispatch to ~8s at the measured ~150G lane-op/s.
    if tile_chunk is None:
        n_nodes = packed.bvh_i.shape[0]
        seg_ops = (25 * (S + Q) if not use_bvh
                   else 15 * n_nodes // 2 + 25 * 8 * max(1, n_nodes // 8))
        seg_ops = max(seg_ops, 300)
        plen = max(2, min(max_depth, 6))
        tile_s = TILE * spp * plen * seg_ops / 150e9
        tile_chunk = max(1, min(n_tiles, int(8.0 / max(tile_s, 1e-4))))

    if dev_args is None:
        j = jnp.asarray
        dev_args = (j(packed.sph_f.reshape(-1)), j(packed.sph_m),
                    j(packed.quad_f.reshape(-1)), j(packed.quad_m),
                    j(packed.med_f.reshape(-1)), j(packed.med_i.reshape(-1)),
                    j(packed.mat_tab), j(packed.tex_tab), j(packed.img_tab),
                    j(packed.bvh_f.reshape(-1)), j(packed.bvh_i.reshape(-1)),
                    j(packed.prim_i.reshape(-1)))

    outs = []
    for t0 in range(0, n_tiles, tile_chunk):
        nt = min(tile_chunk, n_tiles - t0)
        fn = _get_call(cam, width, height, spp, max_depth, dims, flags,
                       med_types, img_dims, nt, False, interpret)
        outs.append(fn(*dev_args,
                       jnp.asarray(np.asarray([seed, t0, sample_offset],
                                              np.int32))))
    if len(outs) == 1:
        r, g, b, n = outs[0]
    else:
        r, g, b, n = (jnp.concatenate([o[k] for o in outs])
                      for k in range(4))
    return r, g, b, n, nbx, nby


@functools.lru_cache(maxsize=32)
def _unswizzle_fn(width: int, height: int, nbx: int, nby: int):
    """Device-side tile-major -> pixel-order shuffle for the 4 output
    buffers: one jitted transpose instead of four host-side numpy shuffles
    of tunneled buffers."""

    @jax.jit
    def go(r, g, b, n):
        def one(arr):
            tiles = arr.reshape(nby, nbx, BLOCK, BLOCK)
            img = tiles.transpose(0, 2, 1, 3).reshape(nby * BLOCK,
                                                      nbx * BLOCK)
            return img[:height, :width]

        img = jnp.stack([one(r), one(g), one(b)], axis=-1)
        return img, jnp.sum(one(n))

    return go


def render_fast(scene, camera, seed: int = 0, spp: Optional[int] = None,
                max_depth: Optional[int] = None, sample_offset: int = 0,
                use_bvh: Optional[bool] = None,
                interpret: bool = False, with_stats: bool = False):
    """Fused-megakernel offline render -> (H,W,3) float32 linear image.

    With ``with_stats``, returns (image, rays_traced) where rays_traced counts
    scene queries exactly like the XLA path's bounce counter.

    Requires supports(scene); falling back is the caller's job
    (renderer.render).
    """
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    w, h = camera.image_width, camera.image_height

    n_prims = int(np.asarray(scene.sph_valid).sum()
                  + np.asarray(scene.quad_valid).sum())
    if use_bvh is None:
        use_bvh = n_prims >= BVH_KERNEL_THRESHOLD

    packed, dev_args, use_bvh = _packed_dev(scene, use_bvh)
    r, g, b, n, nbx, nby = _render_tiles(packed, camera, w, h, spp, max_depth,
                                         use_bvh, sample_offset, seed,
                                         interpret, dev_args=dev_args)
    img_dev, nrays_dev = _unswizzle_fn(w, h, nbx, nby)(r, g, b, n)
    image = np.asarray(img_dev)
    if with_stats:
        return image, float(nrays_dev)
    return image


def render_fast_sharded(scene, camera, mesh, seed: int = 0,
                        spp: Optional[int] = None,
                        max_depth: Optional[int] = None,
                        use_bvh: Optional[bool] = None,
                        interpret: bool = False, with_stats: bool = False):
    """SPMD megakernel render over a (rays, sample) device mesh.

    The tile loop of :func:`render_fast` is embarrassingly parallel — here it
    becomes the shard axis: every device runs the SAME compiled kernel
    (sample_offset and tile base are runtime SMEM scalars) on its own
    contiguous tile range, with the spp budget split over the sample axis and
    psum'd back (the device-mesh analog of rayon's pixel fan-out,
    renderer.rs:26-49). Scene tables ride replicated; per-chunk dispatches
    keep each device program under the runtime watchdog exactly like the
    single-chip path.

    RNG is addressed by (seed, pixel, sample) only — mesh shape never enters
    it — so the sharded render equals the single-device render bitwise on the
    rays axis and to float-sum associativity when spp is split (tested on the
    8-virtual-CPU mesh in interpret mode).

    Returns (H,W,3) float32 (plus exact traced-ray count with ``with_stats``).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import RAYS_AXIS, SAMPLE_AXIS

    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    w, h = camera.image_width, camera.image_height
    n_rd = mesh.shape[RAYS_AXIS]
    n_sd = mesh.shape[SAMPLE_AXIS]
    if spp % n_sd:
        raise ValueError(f"spp={spp} not divisible by sample axis {n_sd}")
    spp_local = spp // n_sd

    n_prims = int(np.asarray(scene.sph_valid).sum()
                  + np.asarray(scene.quad_valid).sum())
    if use_bvh is None:
        use_bvh = n_prims >= BVH_KERNEL_THRESHOLD
    packed, dev_args, use_bvh = _packed_dev(scene, use_bvh)

    S, Q, M = packed.n_spheres, packed.n_quads, packed.n_media
    dims = (S, Q, M, packed.n_mat_chunks, packed.n_tex_chunks,
            packed.bvh_i.shape[0])
    flags = (use_bvh, packed.has_checker, packed.has_noise, M > 0,
             packed.has_image)
    med_types = tuple(int(t) for t in packed.med_i[:M, 0])
    img_dims = (packed.img_h, packed.img_w, packed.img_tab.shape[1])

    nbx = (w + BLOCK - 1) // BLOCK
    nby = (h + BLOCK - 1) // BLOCK
    n_tiles = nbx * nby
    # pad so every device owns the same tile count (extra tiles render
    # clamped edge pixels; dropped before unswizzle)
    nt_dev = (n_tiles + n_rd - 1) // n_rd

    # watchdog chunking per device program (same model as _render_tiles)
    n_nodes = packed.bvh_i.shape[0]
    seg_ops = (25 * (S + Q) if not use_bvh
               else 15 * n_nodes // 2 + 25 * 8 * max(1, n_nodes // 8))
    seg_ops = max(seg_ops, 300)
    plen = max(2, min(max_depth, 6))
    tile_s = TILE * spp_local * plen * seg_ops / 150e9
    tile_chunk = max(1, min(nt_dev, int(8.0 / max(tile_s, 1e-4))))

    chunk_outs = []
    for c0 in range(0, nt_dev, tile_chunk):
        nt = min(tile_chunk, nt_dev - c0)
        fn = _get_sharded_call(mesh, camera, w, h, spp_local, max_depth,
                               dims, flags, med_types, img_dims, nt,
                               nt_dev, n_sd, interpret, len(dev_args))
        # c0 rides in the runtime seed array (NOT the cache key/closure):
        # only the tail chunk's nt makes a second compiled entry, so
        # many-chunk workloads reuse one cached program per chunk size.
        seed_arr = jnp.asarray(np.asarray([seed, c0, 0], np.int32))
        chunk_outs.append(fn(*dev_args, seed_arr))

    r, g, b, n = _reassemble(chunk_outs, n_rd, n_tiles * ROWS)
    img_dev, nrays_dev = _unswizzle_fn(w, h, nbx, nby)(r, g, b, n)
    image = np.asarray(img_dev)
    if with_stats:
        return image, float(nrays_dev)
    return image


@functools.partial(jax.jit, static_argnums=(1, 2))
def _reassemble(chunks, n_rd, keep_rows):
    """device-major chunk buffers -> global tile-major order."""
    def one(k):
        per_dev = [c[k].reshape(n_rd, -1, LANES) for c in chunks]
        full = jnp.concatenate(per_dev, axis=1).reshape(-1, LANES)
        return full[:keep_rows]

    return one(0), one(1), one(2), one(3)


def _get_sharded_call(mesh, cam, width, height, spp_local, max_depth, dims,
                      flags, med_types, img_dims, nt, nt_dev, n_sd,
                      interpret, n_dev_args):
    """Cached jit(shard_map(pallas_call)) for one (mesh, kernel config,
    chunk size) — rebuilding the closure per render would retrace every call
    (measured 30% overhead on a 2.2 s cornell render). The chunk's tile
    offset arrives at runtime in the seed array (sd[1]), so many-chunk
    workloads share one compiled program per chunk SIZE instead of
    LRU-thrashing one entry per chunk."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import RAYS_AXIS, SAMPLE_AXIS

    key = ("sharded", mesh, _cam_key(cam), width, height, spp_local,
           max_depth, dims, flags, med_types, img_dims, nt, nt_dev,
           n_sd, bool(interpret))
    fn = _call_cache.get(key)
    if fn is not None:
        _call_cache.move_to_end(key)
        return fn
    while len(_call_cache) >= _CALL_CACHE_MAX:
        _call_cache.popitem(last=False)

    raw = _get_call(cam, width, height, spp_local, max_depth, dims, flags,
                    med_types, img_dims, nt, False, interpret, jit=False,
                    vma=(RAYS_AXIS, SAMPLE_AXIS) if n_sd > 1
                    else (RAYS_AXIS,))

    def shard_fn(*args):
        dev, sd = args[:-1], args[-1]
        ridx = jax.lax.axis_index(RAYS_AXIS)
        soff = (jax.lax.axis_index(SAMPLE_AXIS) * spp_local
                if n_sd > 1 else jnp.int32(0))
        scal = jnp.stack([sd[0],
                          (ridx * nt_dev + sd[1]).astype(jnp.int32),
                          soff.astype(jnp.int32)])
        r, g, b, n = raw(*dev, scal)
        if n_sd > 1:
            # each device's buffers hold the mean over its spp_local;
            # the full-spp mean is the mean of means (equal splits)
            r = jax.lax.psum(r, SAMPLE_AXIS) / n_sd
            g = jax.lax.psum(g, SAMPLE_AXIS) / n_sd
            b = jax.lax.psum(b, SAMPLE_AXIS) / n_sd
            n = jax.lax.psum(n, SAMPLE_AXIS)
        return r, g, b, n

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),) * (n_dev_args + 1),
        out_specs=(P(RAYS_AXIS),) * 4))
    _call_cache[key] = fn
    return fn


def hit_kernel_call(scene, camera, n_rows: int, use_bvh: Optional[bool] = None,
                    interpret: bool = False):
    """(raw_fn, dev_args) for the single-bounce closest-hit kernel over
    ``n_rows`` (multiple of ROWS) lane rows — the search half of the sorted
    deferred wavefront (ops/wavefront.py).

    Call as ``fn(*dev_args, seed_scal, ox, oy, oz, dx, dy, dz, time, pid,
    samp, alive)`` with (n_rows, LANES) blocks (pid/samp int32, alive f32,
    rest f32) and ``seed_scal = [seed, bounce_index, 0] int32``; returns
    ``[(n_rows, LANES) int32]`` packed winner records (ops/replay.py
    encoding). The call is raw (unjitted) so it embeds in a jitted step.
    """
    n_prims = int(np.asarray(scene.sph_valid).sum()
                  + np.asarray(scene.quad_valid).sum())
    if use_bvh is None:
        use_bvh = n_prims >= BVH_KERNEL_THRESHOLD
    packed, dev_args, use_bvh = _packed_dev(scene, use_bvh)
    S, Q, M = packed.n_spheres, packed.n_quads, packed.n_media
    dims = (S, Q, M, packed.n_mat_chunks, packed.n_tex_chunks,
            packed.bvh_i.shape[0])
    flags = (use_bvh, packed.has_checker, packed.has_noise, M > 0,
             packed.has_image)
    med_types = tuple(int(t) for t in packed.med_i[:M, 0])
    img_dims = (packed.img_h, packed.img_w, packed.img_tab.shape[1])
    assert n_rows % ROWS == 0
    fn = _get_call(camera, camera.image_width, camera.image_height, 1, 1,
                   dims, flags, med_types, img_dims, n_rows // ROWS,
                   "hit", interpret, jit=False)
    return fn, dev_args


def record_paths(scene, camera, seed: int, spp: int, max_depth: int,
                 sample_offset: int = 0, use_bvh: Optional[bool] = None,
                 interpret: bool = False) -> np.ndarray:
    """Record the per-bounce hit winners for every (pixel, sample, bounce):
    the FAST half of the record/replay differentiable pipeline
    (ops/replay.py). Returns (max_depth, spp, H*W) packed int32 records
    (depth-major — replay consumes bounce rows).

    The recorder runs the same intersection/shading program as render_fast
    (shared trace_bounce) in lockstep (sample, bounce) order so records land
    at static output offsets. Meant for gradient passes: spp here is the
    (small) gradient sample budget, not the full render spp.
    """
    w, h = camera.image_width, camera.image_height
    n_prims = int(np.asarray(scene.sph_valid).sum()
                  + np.asarray(scene.quad_valid).sum())
    if use_bvh is None:
        use_bvh = n_prims >= BVH_KERNEL_THRESHOLD
    packed, dev_args, use_bvh = _packed_dev(scene, use_bvh)

    S, Q, M = packed.n_spheres, packed.n_quads, packed.n_media
    dims = (S, Q, M, packed.n_mat_chunks, packed.n_tex_chunks,
            packed.bvh_i.shape[0])
    flags = (use_bvh, packed.has_checker, packed.has_noise, M > 0,
             packed.has_image)
    med_types = tuple(int(t) for t in packed.med_i[:M, 0])
    img_dims = (packed.img_h, packed.img_w, packed.img_tab.shape[1])

    nbx = (w + BLOCK - 1) // BLOCK
    nby = (h + BLOCK - 1) // BLOCK
    n_tiles = nbx * nby

    # chunk tiles like _render_tiles (watchdog bound; the recorder does the
    # same per-segment work as the renderer)
    seg_ops = max(300, 25 * (S + Q) if not use_bvh
                  else 15 * packed.bvh_i.shape[0])
    tile_s = TILE * spp * max(2, min(max_depth, 6)) * seg_ops / 150e9
    tile_chunk = max(1, min(n_tiles, int(8.0 / max(tile_s, 1e-4))))

    outs = []
    for t0 in range(0, n_tiles, tile_chunk):
        nt = min(tile_chunk, n_tiles - t0)
        fn = _get_call(camera, w, h, spp, max_depth, dims, flags, med_types,
                       img_dims, nt, True, interpret)
        outs.append(fn(*dev_args,
                       jnp.asarray(np.asarray([seed, t0, sample_offset],
                                              np.int32)))[0])
    rec = outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    # unswizzle ON DEVICE (the tunnel makes host round-trips of ~100 MB
    # record buffers cost seconds): tile-major lanes -> pixel order
    return _record_unswizzle_fn(w, h, nbx, nby, spp, max_depth)(rec)


@functools.lru_cache(maxsize=32)
def _record_unswizzle_fn(w: int, h: int, nbx: int, nby: int, spp: int,
                         max_depth: int):
    @jax.jit
    def go(rec):
        r = rec.reshape(nby, nbx, spp, max_depth, BLOCK, BLOCK)
        # DEPTH-MAJOR output (replay.records_xla layout): the replay scan's
        # per-bounce record rows are then a free reshape, never a transpose
        img = r.transpose(3, 2, 0, 4, 1, 5).reshape(
            max_depth, spp, nby * BLOCK, nbx * BLOCK)[:, :, :h, :w]
        return img.reshape(max_depth, spp, h * w)

    return go
