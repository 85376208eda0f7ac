"""Differentiable table gather with a fast backward.

``col[idx]`` for a big index vector into a small parameter table is the
bread-and-butter op of the SoA scene design. XLA transposes a gather into a
scatter-add, and on TPU a scatter-add of millions of cotangents into a tiny
table lowers to a SERIAL loop when it sits inside a transposed scan
(profiled: 201 ms per table column for 2.88M adds into a 4-row table — three
such columns were 90% of the whole backward pass). The segment-sum
formulation of the same reduction runs as a dense vectorized reduce
(~0.05 ms at the same size).

``tgather(col, idx)`` is exactly ``col[idx]`` in the forward pass with the
segment-sum backward. Every float-table gather on the differentiable ray
paths goes through it; integer-table gathers don't need it (no cotangents).

Reverse-mode only: a ``custom_vjp`` rules out ``jax.jvp``/``jacfwd`` through
tgather by JAX semantics. Forward-mode of a gather needs no help from this op
(it is just a gather of the tangent table) — callers that want jvp should use
plain ``col[idx]``; the hot render paths are all reverse-mode.

shard_map compatibility: under ``jax.shard_map`` the table is replicated
(``P()``) while ``idx`` is device-varying, so the cotangent produced by
segment-sum varies over mesh axes that the primal ``col`` does not. For a
plain gather, shard_map's transpose machinery inserts the matching ``psum``
automatically (the transpose of the implicit pbroadcast); a custom_vjp hides
that linearity, so the bwd rule must do it itself: it psums the cotangent
over exactly the varying-axes difference (``jax.typeof(x).vma``), making the
returned cotangent replicated like the primal. This IS the ICI gradient
all-reduce of SURVEY.md §5.8 for the table parameters, inserted per-gather at
transpose time. Outside shard_map the vma sets are empty and no psum is added.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _vma(x) -> frozenset:
    """Varying-manual-axes of ``x`` under shard_map (empty outside)."""
    try:
        return frozenset(jax.typeof(x).vma)
    except Exception:  # non-tracer / backends without vma tracking
        return frozenset()


@jax.custom_vjp
def tgather(col, idx):
    """``col[idx]``: 1-D table lookup, differentiable w.r.t. ``col``."""
    return col[idx]


def _tgather_fwd(col, idx):
    return col[idx], (col, idx)


# Largest table for which the backward uses the dense masked reduction.
# XLA lowers a scatter-add into a small (SMEM-resident) table to a SERIAL
# scalar-core loop — profiled on v5e at ~9 ns/update: three such scatters
# (the tex_rgb columns) were 25 ms EACH per bounce inside the transposed
# scan, ~90% of the whole cornell backward. The masked reduce is one
# vectorized pass with N accumulators (N compare+select+adds per element on
# the VPU) and is the entire fwd+bwd speedup of round 3. Past the threshold
# the (N, R) mask stops fitting registers/VMEM and segment-sum (scatter)
# wins again — big-table gathers (image texels, final_scene prim tables)
# keep the scatter path.
TGATHER_DENSE_MAX = 64


def _tgather_bwd(res, ct):
    col, idx = res
    n = col.shape[0]
    if n <= TGATHER_DENSE_MAX:
        idx_f = idx.ravel()
        ct_f = ct.ravel()
        seg = jnp.arange(n, dtype=idx_f.dtype)
        mask = idx_f[None, :] == seg[:, None]                  # (N, R)
        d_col = jnp.sum(jnp.where(mask, ct_f[None, :], 0.0), axis=1)
    else:
        d_col = jax.ops.segment_sum(ct, idx, num_segments=n)
    # shard_map: reduce the cotangent onto the primal's replication (see
    # module docstring). No-op outside shard_map.
    extra = _vma(d_col) - _vma(col)
    if extra:
        d_col = jax.lax.psum(d_col, tuple(sorted(extra)))
    return (d_col.astype(col.dtype),
            np.zeros(idx.shape, dtype=jax.dtypes.float0))


tgather.defvjp(_tgather_fwd, _tgather_bwd)
