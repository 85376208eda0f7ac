"""Distributed render + differentiable train step over a device mesh.

shard_map SPMD: each chip traces its (pixel-shard x sample-chunk) block with
the exact same single-chip kernels, then XLA collectives assemble the image
(psum over the sample axis) and all-reduce parameter gradients (psum over both
axes) on ICI. Scene tables ride along replicated.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..camera import Camera, CameraConstants, get_rays
from ..ops import integrator
from . import mesh as mesh_mod
from .mesh import RAYS_AXIS, SAMPLE_AXIS


def _local_radiance_sum(scene, cam, pixel_ids, seed, sample_base, spp_local,
                        max_depth, hit_fn=None, with_rays=False):
    """Sum of radiance samples ``sample_base .. sample_base+spp_local`` for
    this chip's pixel shard (plus the traced-ray count with ``with_rays`` —
    scene queries, same counter as the single-chip paths; accumulated in f32,
    so counts above 2^24 carry sub-0.001% rounding — a rate numerator, not
    an exact tally).

    Samples are addressed globally by (seed, pixel, sample) — the chip's mesh
    coordinates never enter the RNG, so the sharded render equals the
    single-device render exactly (bitwise when a pixel's whole sample range
    stays on one chip; to float-sum associativity when spp is split)."""
    def sample(s):
        o, d, t = get_rays(cam, seed, pixel_ids, s)
        rad, nb = integrator.trace(scene, o, d, t, (seed, pixel_ids, s),
                                   max_depth, closest_hit_fn=hit_fn,
                                   remat=True)
        return rad, jnp.sum(nb).astype(jnp.float32)

    # first sample seeds the accumulator so its device-varying type under
    # shard_map matches the loop body's output
    acc0, n0 = sample(sample_base)

    def body(s, carry):
        a, n = carry
        rad, nb = sample(sample_base + s)
        return a + rad, n + nb

    acc, nrays = jax.lax.fori_loop(1, spp_local, body, (acc0, n0))
    if with_rays:
        return acc, nrays
    return acc


def make_distributed_renderer(mesh, spp: int, max_depth: int, hit_fn=None,
                              with_rays: bool = False):
    """Build a jitted SPMD render fn: (scene, cam, pixel_ids, key) -> (P,3)
    (or ((P,3), rays_traced) with ``with_rays`` — the exact scene-query count
    psum'd over the whole mesh, for honest rays/s in scaling benchmarks).

    ``pixel_ids`` must be padded to tile the rays axis (mesh_mod.pad_pixels).
    spp is split across the sample axis; partial sums psum'd back so every
    rays-shard returns the full-spp mean for its pixels.
    """
    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample != 0:
        raise ValueError(f"spp={spp} not divisible by sample axis {n_sample}")
    spp_local = spp // n_sample

    def shard_fn(scene, cam, pixel_ids, seed):
        smp_idx = jax.lax.axis_index(SAMPLE_AXIS)
        out = _local_radiance_sum(scene, cam, pixel_ids, seed,
                                  smp_idx * spp_local, spp_local,
                                  max_depth, hit_fn, with_rays=with_rays)
        if with_rays:
            acc, nrays = out
            acc = jax.lax.psum(acc, SAMPLE_AXIS)
            nrays = jax.lax.psum(nrays, (RAYS_AXIS, SAMPLE_AXIS))
            return acc / spp, nrays
        acc = jax.lax.psum(out, SAMPLE_AXIS)
        return acc / spp

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(RAYS_AXIS), P()),
        out_specs=(P(RAYS_AXIS), P()) if with_rays else P(RAYS_AXIS),
    )
    return jax.jit(fn)


def render_distributed(scene, camera: Camera, mesh=None, seed: int = 0,
                       spp: Optional[int] = None,
                       max_depth: Optional[int] = None, hit_fn=None,
                       dtype=jnp.float32,
                       use_megakernel: Optional[bool] = None) -> np.ndarray:
    """Full-image distributed render -> (H,W,3) linear float.

    On TPU the production path is the SPMD megakernel
    (ops/megakernel.render_fast_sharded): every chip runs the fused Pallas
    kernel on its own tile range at full single-chip throughput — the
    distributed fast path. The sharded XLA wavefront remains the fallback
    (custom hit_fn, non-f32, unsupported scenes, CPU meshes)."""
    mesh = mesh or mesh_mod.make_mesh()
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth

    if use_megakernel is None:
        from ..renderer import use_megakernel_default

        use_megakernel = (use_megakernel_default(scene, dtype, hit_fn)
                          and spp % mesh.shape[SAMPLE_AXIS] == 0)
    if use_megakernel:
        import time as _time

        from ..ops import megakernel as mk
        from ..utils import metrics

        t0 = _time.perf_counter()
        img, nrays = mk.render_fast_sharded(scene, camera, mesh, seed=seed,
                                            spp=spp, max_depth=max_depth,
                                            with_stats=True)
        dt = _time.perf_counter() - t0
        metrics.emit("render_distributed", path="megakernel_sharded",
                     mesh=dict(mesh.shape), spp=spp, seconds=dt,
                     rays=int(nrays),
                     rays_per_sec=nrays / dt if dt > 0 else 0.0)
        return img

    if hit_fn is None:
        from ..ops.bvh_traverse import auto_closest_hit

        hit_fn = auto_closest_hit(scene)
    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample:
        spp = spp + (n_sample - spp % n_sample)
    w, h = camera.image_width, camera.image_height
    n_pixels = w * h
    n_padded = mesh_mod.pad_pixels(n_pixels, mesh)
    pixel_ids = jnp.minimum(jnp.arange(n_padded, dtype=jnp.int32), n_pixels - 1)

    render_fn = make_distributed_renderer(mesh, spp, max_depth, hit_fn)
    img = render_fn(scene, camera.constants(dtype), pixel_ids,
                    jnp.uint32(seed))
    return np.asarray(img)[:n_pixels].reshape(h, w, 3)


def make_distributed_train_step(mesh, spp: int, max_depth: int,
                                learning_rate: float = 1.0, hit_fn=None,
                                trainable: Tuple[str, ...] = ("tex_rgb",
                                                             "mat_albedo")):
    """Build a jitted SPMD training step for inverse rendering:

        (scene, cam, pixel_ids, target (P,3), key) -> (scene', loss)

    Forward: pixel shards x sample chunks as in the renderer. Backward:
    per-chip gradients of the replicated scene are psum'd over BOTH mesh axes
    (the ICI all-reduce of SURVEY.md §5.8), then a plain SGD step updates the
    replicated scene. Only the ``trainable`` CompiledScene fields move; all
    other leaves (geometry, tables, structure) stay frozen.

    This is the GENERIC step (differentiates through the XLA wavefront
    search): it accepts any pixel sharding / custom hit kernels. The
    PRODUCTION TPU training step is parallel/grad_dist.make_replay_train_step
    — the sharded record/replay pipeline, ~5x faster per chip on the contract
    workload — which this module's users should prefer whenever the scene is
    megakernel-supported.
    """
    import dataclasses as _dc

    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample:
        raise ValueError(f"spp={spp} not divisible by sample axis {n_sample}")
    spp_local = spp // n_sample

    def shard_fn(scene, cam, pixel_ids, target, seed):
        smp_idx = jax.lax.axis_index(SAMPLE_AXIS)

        names = [f.name for f in _dc.fields(scene)
                 if not f.metadata.get("static", False)]
        leaves = [getattr(scene, n) for n in names]
        is_diff = [n in trainable and jnp.issubdtype(l.dtype, jnp.floating)
                   for n, l in zip(names, leaves)]
        diff = [l for l, dd in zip(leaves, is_diff) if dd]

        def rebuild(diff_leaves):
            it_d = iter(diff_leaves)
            updates = {n: next(it_d) for n, dd in zip(names, is_diff) if dd}
            return _dc.replace(scene, **updates)

        def local_loss(diff_leaves):
            acc = _local_radiance_sum(rebuild(diff_leaves), cam, pixel_ids,
                                      seed, smp_idx * spp_local, spp_local,
                                      max_depth, hit_fn)
            # differentiable collective: assemble the full-spp mean across the
            # sample axis INSIDE the loss so the SSE is exact (not a sum of
            # per-chunk SSEs); autodiff transposes the psum correctly.
            mean = jax.lax.psum(acc, SAMPLE_AXIS) / spp
            return jnp.sum((mean - target) ** 2)

        loss, g = jax.value_and_grad(local_loss)(diff)
        # loss is identical across the sample axis (post-psum); total SSE needs
        # reduction over pixel shards only.
        loss = jax.lax.psum(loss, RAYS_AXIS)
        # g needs NO explicit collective: shard_map autodiff (jax>=0.9 varying
        # -axes tracking) already psums the cotangent of a replicated (P())
        # input across every mesh axis — THAT is the ICI gradient all-reduce
        # of SURVEY.md §5.8, inserted at transpose time and overlapped by XLA
        # with the rest of the backward wavefront. An explicit psum here would
        # double-count by a factor of n_devices (verified on the 8-device CPU
        # mesh: |g| scaled exactly with mesh size before this was removed).
        new_diff = [p - learning_rate * gp for p, gp in zip(diff, g)]
        return rebuild(new_diff), loss

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(RAYS_AXIS), P(RAYS_AXIS), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)
