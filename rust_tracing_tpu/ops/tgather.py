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


# ------------------------------------------------------- multi-column gather
# ``tab[:, idx]`` for a (K, N) packed table: K same-index lookups in ONE op.
# On TPU this lowers to a single Pallas dispatch (ops/lanegather.py
# lane_gather_cols) that reads the index vector once, computes each chunk's
# local-index mask once, and skips chunks a tile's indices never touch —
# replay's hit reconstruction on final_scene issues ~8 sphere + ~16 quad
# same-index gathers per bounce, so batching them collapses ~24 kernel
# dispatches (each re-reading the multi-MB index vector) into 2.

tgather_cols_p = jex_core.Primitive("tgather_cols")


def _tgcols_impl(tab, idx):
    return tab[:, idx]


def _tgcols_abstract(tab, idx):
    vma = standard_vma_rule("tgather_cols", tab, idx)
    return idx.update(shape=(tab.shape[0],) + idx.shape, dtype=tab.dtype,
                      vma=vma, weak_type=False)


def _tgcols_tpu(tab, idx):
    from . import lanegather

    if lanegather.supported(tab.shape[1], idx.size):
        return lanegather.lane_gather_cols(tab, idx)
    return tab[:, idx]


tgather_cols_p.def_impl(_tgcols_impl)
tgather_cols_p.def_abstract_eval(_tgcols_abstract)
mlir.register_lowering(
    tgather_cols_p, mlir.lower_fun(_tgcols_impl, multiple_results=False))
mlir.register_lowering(
    tgather_cols_p, mlir.lower_fun(_tgcols_tpu, multiple_results=False),
    platform="tpu")


def _tgcols_jvp(primals, tangents):
    tab, idx = primals
    dtab, _ = tangents
    out = tgather_cols_p.bind(tab, idx)
    if type(dtab) is ad.Zero:
        dout = ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    else:
        dtab, idx_t = standard_insert_pvary(dtab, idx)
        dout = tgather_cols_p.bind(dtab, idx_t)
    return out, dout


ad.primitive_jvps[tgather_cols_p] = _tgcols_jvp


def _tgcols_transpose(ct, tab, idx):
    # linear in tab; per-column reduce — identical cost to K tgather
    # transposes (the forward dispatch fusion is where the win is)
    if type(ct) is ad.Zero:
        return ad.Zero(tab.aval), None
    K, n = tab.aval.shape
    d_tab = jnp.stack([_reduce_cotangent(ct[k], idx, n) for k in range(K)])
    return d_tab.astype(tab.aval.dtype), None


ad.primitive_transposes[tgather_cols_p] = _tgcols_transpose


def _tgcols_batch(args, dims):
    tab, idx = args
    dtab, didx = dims
    if dtab is batching.not_mapped:
        out = tgather_cols_p.bind(*standard_insert_pvary(tab, idx))
        return out, None if didx is batching.not_mapped else didx + 1
    # batched table (jacfwd tangents): plain indexing off the hot path
    tab2 = jnp.moveaxis(tab, dtab, 0)
    if didx is batching.not_mapped:
        return tab2[:, :, idx], 0
    idx2 = jnp.moveaxis(idx, didx, 0)
    out = jnp.stack([tab2[b][:, idx2[b]] for b in range(tab2.shape[0])])
    return out, 0


batching.primitive_batchers[tgather_cols_p] = _tgcols_batch


def tgather_cols(cols, idx):
    """Gather ``len(cols)`` same-length 1-D tables at one shared index
    vector; returns a tuple of per-column results (each ``idx.shape``).
    Differentiable w.r.t. every column in both modes, like :func:`tgather`.
    """
    tab = jnp.stack(cols)
    tab, idx = standard_insert_pvary(tab, idx)
    out = tgather_cols_p.bind(tab, idx)
    return tuple(out[k] for k in range(len(cols)))


def tgather_group(cols, idx):
    """``tuple(col[idx] for col in cols)`` choosing the packed multi-column
    op when the table is big enough that per-column gathers would each pay a
    lane-gather dispatch (the hot case: replay hit reconstruction on
    thousand-prim scenes), else per-column :func:`tgather` (small tables:
    XLA's fused gather wins and the pack would only add a stack)."""
    from . import lanegather

    n = cols[0].shape[0]
    if len(cols) > 1 and lanegather.supported(n, idx.size):
        return tgather_cols(cols, idx)
    return tuple(tgather(c, idx) for c in cols)
