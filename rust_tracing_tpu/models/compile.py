"""Scene compiler: freeze a :class:`SceneBuilder` into device arrays.

This is the analog of the reference's startup path — building the immutable
``Arc`` graph plus BVH before rendering (src/main.rs:658-660) — except the
output is a single pytree of flat arrays, replicated onto every chip.

Arrays are padded to TPU-friendly multiples with validity masks so shapes stay
static across scenes of similar size and lanes tile cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import perlin as perlin_ops
from . import scene as scene_mod


def _pad_to(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def _pad_arr(a: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    pad = n - a.shape[0]
    if pad == 0:
        return a
    width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, width, constant_values=fill)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompiledScene:
    """Frozen device-side scene. All leaves are jnp arrays (differentiable
    leaves: geometry/material/texture parameters)."""

    # spheres (reference: src/sphere.rs)
    sph_center: jnp.ndarray  # (S,3)
    sph_radius: jnp.ndarray  # (S,)
    sph_cvec: jnp.ndarray  # (S,3) motion-blur center delta (sphere.rs:34-46)
    sph_mat: jnp.ndarray  # (S,) int32
    sph_valid: jnp.ndarray  # (S,) bool
    # quads (reference: src/quad.rs; normal/d/w precomputed as in quad.rs:23-38)
    quad_q: jnp.ndarray  # (Q,3)
    quad_u: jnp.ndarray  # (Q,3)
    quad_v: jnp.ndarray  # (Q,3)
    quad_mat: jnp.ndarray  # (Q,) int32
    quad_valid: jnp.ndarray  # (Q,) bool
    # constant media (reference: src/constant_medium.rs)
    med_type: jnp.ndarray  # (M,) int32: 0 sphere, 1 box
    med_sph_center: jnp.ndarray  # (M,3)
    med_sph_radius: jnp.ndarray  # (M,)
    med_rot: jnp.ndarray  # (M,3,3) world->local rotation
    med_trans: jnp.ndarray  # (M,3)
    med_lo: jnp.ndarray  # (M,3) local box min
    med_hi: jnp.ndarray  # (M,3) local box max
    med_neg_inv_density: jnp.ndarray  # (M,)
    med_mat: jnp.ndarray  # (M,) int32 (isotropic phase material)
    med_valid: jnp.ndarray  # (M,) bool
    # materials (reference: src/material.rs)
    mat_type: jnp.ndarray  # (N,) int32
    mat_tex: jnp.ndarray  # (N,) int32
    mat_albedo: jnp.ndarray  # (N,3) metal albedo
    mat_fuzz: jnp.ndarray  # (N,)
    mat_ir: jnp.ndarray  # (N,)
    # textures (reference: src/texture.rs)
    tex_type: jnp.ndarray  # (T,) int32
    tex_rgb: jnp.ndarray  # (T,3)
    tex_inv_scale: jnp.ndarray  # (T,)
    tex_even: jnp.ndarray  # (T,) int32 child texture id
    tex_odd: jnp.ndarray  # (T,) int32
    tex_noise_scale: jnp.ndarray  # (T,)
    tex_image: jnp.ndarray  # (T,) int32 image id
    image: jnp.ndarray  # (H,W,3) linear float; (1,1,3) dummy if unused
    # Perlin tables (reference: src/perlin.rs:14-25)
    perlin_ranvec: jnp.ndarray  # (256,3)
    perlin_px: jnp.ndarray  # (256,) int32
    perlin_py: jnp.ndarray  # (256,) int32
    perlin_pz: jnp.ndarray  # (256,) int32
    # misc
    background: jnp.ndarray  # (3,)
    # flattened BVH (models/bvh.py); (1,)-dummies when has_bvh is False
    bvh_min: jnp.ndarray  # (N,3)
    bvh_max: jnp.ndarray  # (N,3)
    bvh_skip: jnp.ndarray  # (N,) int32
    bvh_ptype: jnp.ndarray  # (N,) int32: -1 internal, 0 sphere, 1 quad
    bvh_pidx: jnp.ndarray  # (N,) int32
    # static trace-time pruning flags (which texture families exist)
    has_image: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_noise: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_checker: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_media: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_bvh: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # static material-family flags: a scene without metals never evaluates the
    # fuzz-ball sampler, without dielectrics never evaluates Schlick/refract,
    # etc. — the trace-time analog of the reference's per-hit dyn dispatch
    # (material.rs:11-16) that prunes whole transcendental subgraphs instead
    # of masking them (big deal for the O(rays) replay backward pass).
    has_metal: bool = dataclasses.field(metadata=dict(static=True), default=True)
    has_dielectric: bool = dataclasses.field(metadata=dict(static=True),
                                             default=True)
    has_isotropic: bool = dataclasses.field(metadata=dict(static=True),
                                            default=True)
    has_lights: bool = dataclasses.field(metadata=dict(static=True),
                                         default=True)
    # static primitive-family flags: tables are padded to >=8 rows even when
    # a family is absent, so shape alone can't prune — these let the replay
    # hit reconstruction (ops/replay.py) drop a whole family's winner-t/
    # normal/UV subgraph (cornell has no spheres: the quadratic + UV chain
    # and its transpose are pure waste there).
    has_spheres: bool = dataclasses.field(metadata=dict(static=True),
                                          default=True)
    has_quads: bool = dataclasses.field(metadata=dict(static=True),
                                        default=True)

    @property
    def num_spheres(self) -> int:
        return self.sph_radius.shape[0]

    @property
    def num_quads(self) -> int:
        return self.quad_mat.shape[0]

    # Derived quad quantities (reference: src/quad.rs:23-38). Computed lazily
    # from q/u/v so that gradients flow into the raw vertex parameters.
    def quad_frame(self):
        n = jnp.cross(self.quad_u, self.quad_v)
        nlen2 = jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-30)
        normal = n / jnp.sqrt(nlen2)
        d = jnp.sum(normal * self.quad_q, axis=-1)
        w = n / nlen2
        return normal, d, w


# Measured on TPU v5e (final_scene, 3407 prims): dense brute-force closest-hit
# runs ~14x faster than lockstep while_loop BVH traversal — divergent pointer
# chasing starves a vector machine. Brute force is the default far beyond the
# CPU crossover; the BVH path serves truly huge scenes and CPU runs.
BVH_AUTO_THRESHOLD = 16384


def compile_scene(
    builder: scene_mod.SceneBuilder,
    dtype=jnp.float32,
    pad_multiple: int = 8,
    perlin_seed: int = 0,
    use_bvh: Optional[bool] = None,
    bvh_seed: int = 0,
) -> CompiledScene:
    b = builder
    f = lambda x, fill=0.0: np.asarray(x, dtype=np.float64) if len(x) else np.zeros((0,))

    # --- spheres
    S = _pad_to(b.num_spheres, pad_multiple)
    sph_center = _pad_arr(np.asarray(b.sph_center, np.float64).reshape(-1, 3), S)
    sph_radius = _pad_arr(np.asarray(b.sph_radius, np.float64).reshape(-1), S)
    sph_cvec = _pad_arr(np.asarray(b.sph_cvec, np.float64).reshape(-1, 3), S)
    sph_mat = _pad_arr(np.asarray(b.sph_mat, np.int32).reshape(-1), S)
    sph_valid = _pad_arr(np.ones(b.num_spheres, dtype=bool), S, fill=False)

    # --- quads
    Q = _pad_to(b.num_quads, pad_multiple)
    quad_q = _pad_arr(np.asarray(b.quad_q, np.float64).reshape(-1, 3), Q)
    # Padded quads get unit u/v so the derived frame stays finite.
    quad_u = _pad_arr(np.asarray(b.quad_u, np.float64).reshape(-1, 3), Q)
    quad_v = _pad_arr(np.asarray(b.quad_v, np.float64).reshape(-1, 3), Q)
    quad_u[b.num_quads :, 0] = 1.0
    quad_v[b.num_quads :, 1] = 1.0
    quad_mat = _pad_arr(np.asarray(b.quad_mat, np.int32).reshape(-1), Q)
    quad_valid = _pad_arr(np.ones(b.num_quads, dtype=bool), Q, fill=False)

    # --- media (pad to >= 1)
    M = max(1, b.num_media)
    med_type = _pad_arr(np.asarray(b.med_type, np.int32).reshape(-1), M)
    med_sph_center = _pad_arr(np.asarray(b.med_sph_center, np.float64).reshape(-1, 3), M)
    med_sph_radius = _pad_arr(np.asarray(b.med_sph_radius, np.float64).reshape(-1), M)
    med_rot = _pad_arr(
        np.asarray(b.med_rot, np.float64).reshape(-1, 3, 3)
        if b.num_media
        else np.zeros((0, 3, 3)),
        M,
    )
    if b.num_media < M:
        med_rot[b.num_media :] = np.eye(3)
    med_trans = _pad_arr(np.asarray(b.med_trans, np.float64).reshape(-1, 3), M)
    med_lo = _pad_arr(np.asarray(b.med_lo, np.float64).reshape(-1, 3), M)
    med_hi = _pad_arr(np.asarray(b.med_hi, np.float64).reshape(-1, 3), M)
    med_nid = _pad_arr(
        np.asarray(b.med_neg_inv_density, np.float64).reshape(-1), M, fill=-1.0
    )
    med_mat = _pad_arr(np.asarray(b.med_mat, np.int32).reshape(-1), M)
    med_valid = _pad_arr(np.ones(b.num_media, dtype=bool), M, fill=False)

    # --- materials / textures (pad to >= 1)
    N = max(1, len(b.mat_type))
    T = max(1, len(b.tex_type))

    image = b.images[0] if b.images else np.zeros((1, 1, 3), np.float32)
    assert len(b.images) <= 1, "one image texture per scene for now"

    ranvec, px, py, pz = perlin_ops.make_tables(perlin_seed)

    # --- BVH (auto for big scenes; media stay outside the tree)
    n_prims = b.num_spheres + b.num_quads
    if use_bvh is None:
        use_bvh = n_prims >= BVH_AUTO_THRESHOLD
    if use_bvh and n_prims > 0:
        from . import bvh as bvh_mod

        flat = bvh_mod.build_for(b, seed=bvh_seed)
        bvh_arrays = (flat.node_min, flat.node_max, flat.skip,
                      flat.prim_type, flat.prim_idx)
    else:
        use_bvh = False
        bvh_arrays = (np.zeros((1, 3)), np.zeros((1, 3)),
                      np.ones(1, np.int32), -np.ones(1, np.int32),
                      np.zeros(1, np.int32))

    jf = lambda a: jnp.asarray(a, dtype)
    ji = lambda a: jnp.asarray(a, jnp.int32)

    return CompiledScene(
        sph_center=jf(sph_center),
        sph_radius=jf(sph_radius),
        sph_cvec=jf(sph_cvec),
        sph_mat=ji(sph_mat),
        sph_valid=jnp.asarray(sph_valid),
        quad_q=jf(quad_q),
        quad_u=jf(quad_u),
        quad_v=jf(quad_v),
        quad_mat=ji(quad_mat),
        quad_valid=jnp.asarray(quad_valid),
        med_type=ji(med_type),
        med_sph_center=jf(med_sph_center),
        med_sph_radius=jf(med_sph_radius),
        med_rot=jf(med_rot),
        med_trans=jf(med_trans),
        med_lo=jf(med_lo),
        med_hi=jf(med_hi),
        med_neg_inv_density=jf(med_nid),
        med_mat=ji(med_mat),
        med_valid=jnp.asarray(med_valid),
        mat_type=ji(_pad_arr(np.asarray(b.mat_type, np.int32).reshape(-1), N)),
        mat_tex=ji(_pad_arr(np.asarray(b.mat_tex, np.int32).reshape(-1), N)),
        mat_albedo=jf(_pad_arr(np.asarray(b.mat_albedo, np.float64).reshape(-1, 3), N)),
        mat_fuzz=jf(_pad_arr(np.asarray(b.mat_fuzz, np.float64).reshape(-1), N)),
        mat_ir=jf(_pad_arr(np.asarray(b.mat_ir, np.float64).reshape(-1), N, fill=1.0)),
        tex_type=ji(_pad_arr(np.asarray(b.tex_type, np.int32).reshape(-1), T)),
        tex_rgb=jf(_pad_arr(np.asarray(b.tex_rgb, np.float64).reshape(-1, 3), T)),
        tex_inv_scale=jf(_pad_arr(np.asarray(b.tex_inv_scale, np.float64).reshape(-1), T)),
        tex_even=ji(_pad_arr(np.asarray(b.tex_even, np.int32).reshape(-1), T)),
        tex_odd=ji(_pad_arr(np.asarray(b.tex_odd, np.int32).reshape(-1), T)),
        tex_noise_scale=jf(
            _pad_arr(np.asarray(b.tex_noise_scale, np.float64).reshape(-1), T)
        ),
        tex_image=ji(_pad_arr(np.asarray(b.tex_image, np.int32).reshape(-1), T)),
        image=jf(image),
        perlin_ranvec=jf(ranvec),
        perlin_px=ji(px),
        perlin_py=ji(py),
        perlin_pz=ji(pz),
        background=jf(np.asarray(b.background)),
        bvh_min=jf(bvh_arrays[0]),
        bvh_max=jf(bvh_arrays[1]),
        bvh_skip=ji(bvh_arrays[2]),
        bvh_ptype=ji(bvh_arrays[3]),
        bvh_pidx=ji(bvh_arrays[4]),
        has_image=bool(b.images),
        has_noise=scene_mod.TEX_NOISE in b.tex_type,
        has_checker=scene_mod.TEX_CHECKER in b.tex_type,
        has_media=b.num_media > 0,
        has_bvh=bool(use_bvh),
        has_metal=scene_mod.METAL in b.mat_type,
        has_dielectric=scene_mod.DIELECTRIC in b.mat_type,
        has_isotropic=scene_mod.ISOTROPIC in b.mat_type,
        has_lights=scene_mod.DIFFUSE_LIGHT in b.mat_type,
        has_spheres=b.num_spheres > 0,
        has_quads=b.num_quads > 0,
    )
