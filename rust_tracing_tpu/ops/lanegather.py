"""Deterministic vectorized table gather for TPU (Pallas lane-gather).

XLA TPU lowers one-element gathers (``col[idx]``) either to a fast
vectorized unit or to a SERIAL scalar-core loop (~5-10 ns/element, arrays
shuttled through SMEM with copy-start/copy-done pairs) — and the choice is
CONTEXT-DEPENDENT: the same gather measured 0.07 ms or 11 ms at 262k lanes
depending on surrounding fusion/layout decisions (observed flipping between
identical runs). Perlin turbulence (56 gathers/octave) and the replay hit
reconstruction on final_scene (30 gathers from 3.4k-row tables) landed on
the serial path, costing 60 ms/octave and 53 ms/bounce at 262k lanes.

This module provides the gather the megakernel already trusts: chunked
``take_along_axis`` lane gathers over row-replicated (8, 128) tiles — the
one gather shape Mosaic executes vectorized — wrapped as a standalone
Pallas kernel. Cost is deterministic: ceil(N/128) masked selects per lane.
Values are exactly ``col[idx]`` (a copy is a copy): safe for the bitwise
parity contracts.

Used as the TPU lowering of the ``tgather`` primitive (ops/tgather.py) and
directly by perlin/texture integer lookups. Tables past ``LANE_GATHER_MAX_N``
or tiny index batches fall back to the plain XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
LANES = 128
TILE = ROWS * LANES

# beyond this table size the chunk loop stops paying vs even the serial XLA
# gather (ceil(N/128) masked selects per lane ~= 3*N/128 lane-ops)
LANE_GATHER_MAX_N = 8192
# at or below this table size XLA's own gather stays fast and FUSES; a
# separate pallas dispatch per lookup regressed the cornell replay contract
# 186 -> 93 Mrays/s (its mat/tex tables are all <= 64 rows). The serial
# pathology was only observed from 256 rows (perlin) up (prim tables).
LANE_GATHER_MIN_N = 65
# below this many indices the dispatch overhead dominates; XLA's gather is
# fine at small sizes
LANE_GATHER_MIN_R = 4096


def _kernel(tab_ref, idx_ref, out_ref, *, C):
    idx = idx_ref[...]
    out = jnp.zeros(idx.shape, tab_ref.dtype)
    for c in range(C):
        tile = tab_ref[c]
        local = idx - c * LANES
        g = jnp.take_along_axis(tile, jnp.clip(local, 0, LANES - 1), axis=1)
        out = jnp.where((local >= 0) & (local < LANES), g, out)
    out_ref[...] = out


@functools.lru_cache(maxsize=64)
def _get_call(C: int, n_tiles: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    return pl.pallas_call(
        functools.partial(_kernel, C=C),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )


def supported(n: int, r: int) -> bool:
    return (LANE_GATHER_MIN_N <= n <= LANE_GATHER_MAX_N
            and r >= LANE_GATHER_MIN_R)


# ------------------------------------------------------- multi-column gather
def _kernel_cols(tab_ref, idx_ref, out_ref, *, C, K, skip):
    """Gather K same-index columns in one pass: the index tile is read once,
    each chunk's local-index/mask math is computed once, and (with ``skip``)
    chunks outside the tile's [min, max] index range are branched over
    entirely — after the wavefront's coherence sort a tile's indices cluster
    into 1-2 of the table's ceil(N/128) chunks, so the chunk scan collapses
    from C passes to the occupied few."""
    idx = idx_ref[...]
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    if skip:
        mn = jnp.min(idx) // LANES
        mx = jnp.max(idx) // LANES
    for c in range(C):
        def body(c=c):
            local = idx - c * LANES
            m = (local >= 0) & (local < LANES)
            lidx = jnp.clip(local, 0, LANES - 1)
            for k in range(K):
                g = jnp.take_along_axis(tab_ref[k, c], lidx, axis=1)
                out_ref[k] = jnp.where(m, g, out_ref[k])
        if skip:
            pl.when((c >= mn) & (c <= mx))(body)
        else:
            body()


@functools.lru_cache(maxsize=64)
def _get_call_cols(C: int, K: int, n_tiles: int, dtype_name: str,
                   skip: bool):
    dtype = jnp.dtype(dtype_name)
    return pl.pallas_call(
        functools.partial(_kernel_cols, C=C, K=K, skip=skip),
        out_shape=jax.ShapeDtypeStruct((K, n_tiles * ROWS, LANES), dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )


def lane_gather_cols(tab, idx, skip: bool = True):
    """``tab[:, idx]`` for a (K, N) packed column table: one Pallas dispatch,
    one index read, K gathered outputs (K, *idx.shape). Caller checks
    :func:`supported` on (N, idx.size)."""
    K, n = tab.shape
    C = max(1, -(-n // LANES))
    shape = idx.shape
    idx_f = idx.reshape(-1).astype(jnp.int32)
    R = idx_f.shape[0]
    n_tiles = -(-R // TILE)
    pad_r = n_tiles * TILE - R
    if pad_r:
        idx_f = jnp.concatenate([idx_f, jnp.zeros(pad_r, jnp.int32)])
    pad_n = C * LANES - n
    tab_p = jnp.concatenate(
        [tab, jnp.zeros((K, pad_n), tab.dtype)], axis=1) if pad_n else tab
    tiles = jnp.broadcast_to(tab_p.reshape(K, C, 1, LANES),
                             (K, C, ROWS, LANES))
    out = _get_call_cols(C, K, n_tiles, str(tab.dtype), skip)(
        tiles, idx_f.reshape(n_tiles * ROWS, LANES))
    return out.reshape(K, -1)[:, :R].reshape((K,) + shape)


def lane_gather(col, idx):
    """``col[idx]`` via the Pallas lane-gather (caller checks
    :func:`supported`). ``col`` 1-D (any f32/i32-class dtype), ``idx`` any
    shape of int32; out-of-range indices return 0 (callers never produce
    them — scene ids are validated at build)."""
    n = col.shape[0]
    C = max(1, -(-n // LANES))
    shape = idx.shape
    idx_f = idx.reshape(-1).astype(jnp.int32)
    R = idx_f.shape[0]
    n_tiles = -(-R // TILE)
    pad_r = n_tiles * TILE - R
    if pad_r:
        idx_f = jnp.concatenate([idx_f, jnp.zeros(pad_r, jnp.int32)])
    pad_n = C * LANES - n
    col_p = jnp.concatenate([col, jnp.zeros(pad_n, col.dtype)]) if pad_n \
        else col
    tab = jnp.broadcast_to(col_p.reshape(C, 1, LANES), (C, ROWS, LANES))
    out = _get_call(C, n_tiles, str(col.dtype))(
        tab, idx_f.reshape(n_tiles * ROWS, LANES))
    return out.reshape(-1)[:R].reshape(shape)
