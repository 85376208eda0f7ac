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

Implemented as a first-class JAX primitive (not ``custom_vjp``, which rules
out forward mode by construction) with

- an explicit **jvp rule**: the tangent is just a gather of the tangent
  table (the op is linear in ``col``), so ``jax.jvp``/``jax.jacfwd`` work;
- an explicit **transpose rule**: the masked-dense-reduce / segment-sum
  backward below, so reverse mode keeps the round-3 speedup;
- a **batching rule**, so ``jacfwd`` (= vmap of jvp) and user ``vmap`` work.

shard_map compatibility: under ``jax.shard_map`` the table is replicated
(``P()``) while ``idx`` is device-varying. The primitive participates in
shard_map's varying-manual-axes (vma) tracking through the standard
machinery: ``standard_insert_pvary`` lifts the replicated table to the
index's varying axes at bind time, and the transpose of that ``pvary`` is
the ``psum`` that all-reduces the table cotangent back to replicated — the
ICI gradient all-reduce of SURVEY.md §5.8, inserted per-gather at transpose
time, with OUR transpose supplying only the fast dense reduce. (Declaring
the output's vma in the abstract eval is load-bearing: an output wrongly
marked replicated makes shard_map insert a pbroadcast wherever it meets a
varying value, and that pbroadcast's transpose psums the cotangent across
devices BEFORE the gather transpose, mixing unrelated lanes' cotangents.)
Outside shard_map every vma set is empty and none of this costs anything.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

# vma integration points for custom primitives (used by every in-tree
# primitive; semi-private but pinned with the baked JAX version)
from jax._src.core import standard_insert_pvary, standard_vma_rule


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


def _reduce_cotangent(ct, idx, n: int):
    """Sum ``ct`` into an ``n``-row table at ``idx`` — the transpose of the
    gather, as a dense masked reduce (small tables) or segment-sum."""
    if n <= TGATHER_DENSE_MAX:
        idx_f = idx.ravel()
        ct_f = ct.ravel()
        seg = jnp.arange(n, dtype=idx_f.dtype)
        mask = idx_f[None, :] == seg[:, None]                  # (N, R)
        return jnp.sum(jnp.where(mask, ct_f[None, :], 0.0), axis=1)
    return jax.ops.segment_sum(ct, idx, num_segments=n)


tgather_p = jex_core.Primitive("tgather")


def _tgather_impl(col, idx):
    return col[idx]


def _tgather_abstract(col, idx):
    # derive from idx's aval: output has idx's shape AND sharding context
    # (constructing a bare ShapedArray with a vma but no mesh-carrying
    # sharding trips core.get_vma's empty-mesh assertion)
    vma = standard_vma_rule("tgather", col, idx)
    return idx.update(dtype=col.dtype, vma=vma, weak_type=False)


def _tgather_tpu(col, idx):
    # XLA TPU lowers one-element gathers to a SERIAL scalar-core loop
    # nondeterministically (context-dependent layout/fusion choice; measured
    # 0.07 ms vs 11 ms for the SAME gather at 262k lanes). The Pallas lane
    # gather is deterministic and vectorized — use it whenever profitable.
    from . import lanegather

    if lanegather.supported(col.shape[0], idx.size):
        return lanegather.lane_gather(col, idx)
    return col[idx]


tgather_p.def_impl(_tgather_impl)
tgather_p.def_abstract_eval(_tgather_abstract)
mlir.register_lowering(tgather_p,
                       mlir.lower_fun(_tgather_impl, multiple_results=False))
mlir.register_lowering(tgather_p,
                       mlir.lower_fun(_tgather_tpu, multiple_results=False),
                       platform="tpu")


def _tgather_jvp(primals, tangents):
    # linear in col: the tangent is just a gather of the tangent table
    col, idx = primals
    dcol, _ = tangents
    out = tgather_p.bind(col, idx)
    if type(dcol) is ad.Zero:
        dout = ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    else:
        dcol, idx_t = standard_insert_pvary(dcol, idx)
        dout = tgather_p.bind(dcol, idx_t)
    return out, dout


ad.primitive_jvps[tgather_p] = _tgather_jvp


def _tgather_transpose(ct, col, idx):
    # col is the undefined primal (the op is linear in it); idx is known.
    # No psum here: the bind-time pvary's transpose reduces the returned
    # cotangent onto the primal table's replication (module docstring).
    if type(ct) is ad.Zero:
        return ad.Zero(col.aval), None
    d_col = _reduce_cotangent(ct, idx, col.aval.shape[0])
    return d_col.astype(col.aval.dtype), None


ad.primitive_transposes[tgather_p] = _tgather_transpose


def _tgather_batch(args, dims):
    col, idx = args
    dcol, didx = dims
    if dcol is batching.not_mapped:
        return tgather_p.bind(*standard_insert_pvary(col, idx)), didx
    # batched table (jacfwd's vmapped tangents land here): plain indexing —
    # the standard gather transpose is fine off the hot path
    col2 = jnp.moveaxis(col, dcol, 0)
    B = col2.shape[0]
    if didx is batching.not_mapped:
        return col2[:, idx], 0
    idx2 = jnp.moveaxis(idx, didx, 0)
    rest = idx2.shape[1:]
    out = jnp.take_along_axis(col2, idx2.reshape(B, -1), axis=1)
    return out.reshape((B,) + rest), 0


batching.primitive_batchers[tgather_p] = _tgather_batch


def tgather(col, idx):
    """``col[idx]``: 1-D table lookup, differentiable w.r.t. ``col`` in both
    modes (jvp = gather of the tangent table; transpose = vectorized
    dense/segment reduce)."""
    col, idx = standard_insert_pvary(col, idx)
    return tgather_p.bind(col, idx)
