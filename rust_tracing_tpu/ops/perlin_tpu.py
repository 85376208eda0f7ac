"""Fused Pallas turbulence for the exact table Perlin noise.

The XLA turbulence (ops/perlin.py) needs 7 octaves x 8 corners x 6 table
lookups = ~210 gathers per evaluation. Routed through individual Pallas lane
gathers (ops/lanegather.py) each lookup is vectorized but pays a kernel
launch + an HBM round trip of the index/result arrays — ~163 ms per bounce
at 3.84M lanes on final_scene, the single largest shading cost. This module
fuses the ENTIRE turbulence into one Pallas kernel: tables live in VMEM as
row-replicated (8, 128) chunk tiles (256 entries = 2 chunks), every lookup
is an in-register masked ``take_along_axis``, and the whole 7-octave sum is
one dispatch.

The kernel mirrors ops/perlin.noise_c's arithmetic ORDER exactly (floor,
Hermite weights, corner dot products, octave accumulation), so its output is
BITWISE equal to the XLA formulation (asserted in tests/test_textures.py) —
the deferred/wavefront "bitwise == direct estimator" contracts survive.

Differentiation: exposed as a primitive whose jvp DELEGATES to the XLA
formulation (``jax.jvp`` of perlin.turbulence_c) — the fast kernel computes
primal values; tangent/transpose run the XLA graph, which reverse-mode then
transposes as usual. Gradients w.r.t. hit positions (geometry chains) and
the ranvec table keep flowing; jacfwd/vmap fall back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax._src.core import standard_insert_pvary, standard_vma_rule
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

from . import perlin as perlin_xla

ROWS, LANES = 8, 128
_C = 2  # 256-entry tables -> 2 lane chunks


def _gather2(tab, idx):
    """256-entry lookup from a (2, 8, 128) row-replicated chunk tile."""
    out = jnp.zeros(idx.shape, tab.dtype)
    for c in range(_C):
        local = idx - c * LANES
        g = jnp.take_along_axis(tab[c], jnp.clip(local, 0, LANES - 1),
                                axis=1)
        out = jnp.where((local >= 0) & (local < LANES), g, out)
    return out


def _kernel(tabs_ref, px_ref, py_ref, pz_ref, out_ref, *, depth):
    # tabs rows: 0..2 = perm_x/y/z (as f32, exact <= 255), 3..5 = rv x/y/z
    px0 = px_ref[...]
    py0 = py_ref[...]
    pz0 = pz_ref[...]

    def noise(px, py, pz):
        fx = jnp.floor(px)
        fy = jnp.floor(py)
        fz = jnp.floor(pz)
        ix = fx.astype(jnp.int32)
        iy = fy.astype(jnp.int32)
        iz = fz.astype(jnp.int32)
        ux, uy, uz = px - fx, py - fy, pz - fz
        sx = ux * ux * (3.0 - 2.0 * ux)
        sy = uy * uy * (3.0 - 2.0 * uy)
        sz = uz * uz * (3.0 - 2.0 * uz)
        hxs = [_gather2(tabs_ref[0], (ix + di) & 255).astype(jnp.int32)
               for di in (0, 1)]
        hys = [_gather2(tabs_ref[1], (iy + dj) & 255).astype(jnp.int32)
               for dj in (0, 1)]
        hzs = [_gather2(tabs_ref[2], (iz + dk) & 255).astype(jnp.int32)
               for dk in (0, 1)]
        acc = jnp.zeros_like(px)
        for di in (0, 1):
            wx = jnp.where(jnp.bool_(di == 1), sx, 1.0 - sx)
            for dj in (0, 1):
                wy = jnp.where(jnp.bool_(dj == 1), sy, 1.0 - sy)
                for dk in (0, 1):
                    wz = jnp.where(jnp.bool_(dk == 1), sz, 1.0 - sz)
                    h = hxs[di] ^ hys[dj] ^ hzs[dk]
                    dot = (_gather2(tabs_ref[3], h) * (ux - di)
                           + _gather2(tabs_ref[4], h) * (uy - dj)
                           + _gather2(tabs_ref[5], h) * (uz - dk))
                    acc = acc + wx * wy * wz * dot
        return acc

    acc = jnp.zeros_like(px0)
    weight = 1.0
    s = 1.0
    for _ in range(depth):
        acc = acc + weight * noise(px0 * s, py0 * s, pz0 * s)
        weight *= 0.5
        s *= 2.0
    out_ref[...] = jnp.abs(acc)


@functools.lru_cache(maxsize=16)
def _get_call(n_tiles: int, depth: int):
    blk = lambda: pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, depth=depth),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  blk(), blk(), blk()],
        out_specs=blk(),
    )


def _turb_pallas(ranvec, perm_x, perm_y, perm_z, px, py, pz, *, depth):
    shape = px.shape
    pxf = px.reshape(-1).astype(jnp.float32)
    pyf = py.reshape(-1).astype(jnp.float32)
    pzf = pz.reshape(-1).astype(jnp.float32)
    R = pxf.shape[0]
    tile = ROWS * LANES
    n_tiles = max(1, -(-R // tile))
    pad = n_tiles * tile - R
    if pad:
        z = jnp.zeros(pad, jnp.float32)
        pxf, pyf, pzf = (jnp.concatenate([a, z]) for a in (pxf, pyf, pzf))
    cols = jnp.stack([perm_x.astype(jnp.float32),
                      perm_y.astype(jnp.float32),
                      perm_z.astype(jnp.float32),
                      ranvec[:, 0].astype(jnp.float32),
                      ranvec[:, 1].astype(jnp.float32),
                      ranvec[:, 2].astype(jnp.float32)])     # (6, 256)
    tabs = jnp.broadcast_to(cols.reshape(6, _C, 1, LANES),
                            (6, _C, ROWS, LANES))
    b = lambda a: a.reshape(n_tiles * ROWS, LANES)
    out = _get_call(n_tiles, depth)(tabs, b(pxf), b(pyf), b(pzf))
    return out.reshape(-1)[:R].reshape(shape).astype(px.dtype)


def _turb_xla(ranvec, perm_x, perm_y, perm_z, px, py, pz, *, depth):
    return perlin_xla.turbulence_c(ranvec.astype(px.dtype), perm_x, perm_y,
                                   perm_z, px, py, pz, depth=depth)


turb_p = jex_core.Primitive("perlin_turbulence")


def _turb_abstract(ranvec, perm_x, perm_y, perm_z, px, py, pz, *, depth):
    vma = standard_vma_rule("perlin_turbulence", ranvec, perm_x, perm_y,
                            perm_z, px, py, pz)
    return px.update(vma=vma)


turb_p.def_impl(functools.partial(_turb_xla))
turb_p.def_abstract_eval(_turb_abstract)
mlir.register_lowering(turb_p, mlir.lower_fun(_turb_xla,
                                              multiple_results=False))
mlir.register_lowering(turb_p, mlir.lower_fun(_turb_pallas,
                                              multiple_results=False),
                       platform="tpu")


def _turb_jvp(primals, tangents, *, depth):
    # primal via the primitive (fast kernel on TPU); tangents via the XLA
    # formulation — bitwise-equal primal, standard transposable tangent graph
    ranvec, perm_x, perm_y, perm_z, px, py, pz = primals
    d_rv, _, _, _, d_px, d_py, d_pz = tangents
    out = turb_p.bind(*primals, depth=depth)

    def f(rv, x, y, z):
        return _turb_xla(rv, perm_x, perm_y, perm_z, x, y, z, depth=depth)

    zero = lambda p, t: (jnp.zeros_like(p)
                         if type(t) is ad.Zero else t)
    _, dout = jax.jvp(f, (ranvec, px, py, pz),
                      (zero(ranvec, d_rv), zero(px, d_px),
                       zero(py, d_py), zero(pz, d_pz)))
    return out, dout


ad.primitive_jvps[turb_p] = _turb_jvp


def _turb_batch(args, dims, *, depth):
    sizes = {a.shape[d] for a, d in zip(args, dims)
             if d is not batching.not_mapped}
    (bs,) = sizes
    moved = [jnp.moveaxis(a, d, 0) if d is not batching.not_mapped
             else jnp.broadcast_to(a, (bs,) + a.shape)
             for a, d in zip(args, dims)]
    out = jnp.stack([_turb_xla(*(m[i] for m in moved), depth=depth)
                     for i in range(bs)])
    return out, 0


batching.primitive_batchers[turb_p] = _turb_batch


def turbulence(ranvec, perm_x, perm_y, perm_z, px, py, pz, depth: int = 7):
    """Exact table Perlin turbulence (perlin.rs:52-64): fused Pallas kernel
    on TPU, XLA elsewhere; bitwise equal either way."""
    args = standard_insert_pvary(ranvec, perm_x, perm_y, perm_z, px, py, pz)
    return turb_p.bind(*args, depth=depth)
