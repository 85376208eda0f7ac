"""Distributed record/replay gradient pipeline — the production training path.

The single-chip contract pipeline (grad.loss_and_grad) is: Pallas recorder ->
O(rays) replay VJP. This module is its sharded analog over the (rays, sample)
device mesh (SURVEY.md §5.8; the fan-out being matched is the reference's
rayon pixel fan-out, renderer.rs:26-49):

 1. every device RECORDS its own tile range x sample range with the SAME
    record-mode megakernel as the single-chip path (tile base and sample
    offset are runtime SMEM scalars — one compiled kernel serves the whole
    mesh, exactly like megakernel.render_fast_sharded);
 2. every device REPLAYS its block differentiably (O(rays), no search in the
    autodiff graph);
 3. the parameter-gradient pytree is psum'd over BOTH mesh axes — by the
    tgather transpose's vma machinery (ops/tgather.py) plus shard_map's
    replicated-input transpose for non-tgather leaves — the ICI gradient
    all-reduce, overlapped with the rest of the backward by XLA.

Pixels are sharded TILE-MAJOR (the megakernel's 32x32 block order,
:func:`tile_pixel_layout`), so the records a device consumes are exactly the
records it produced — ZERO record traffic crosses ICI. The only collectives
are one (pixels_local x 3 x 4B) psum of the per-shard mean image over the
sample axis, the scalar loss psum, and the ~100-float gradient-table psum.

RNG stays addressed by (seed, pixel, sample, bounce, site) — mesh coordinates
never enter it — so the distributed loss/gradient equals the single-chip
loss_and_grad to float-sum associativity (asserted in tests/test_parallel.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..camera import Camera, get_rays
from ..ops import megakernel as mk
from .mesh import RAYS_AXIS, SAMPLE_AXIS


def tile_pixel_layout(camera: Camera, mesh) -> Tuple[np.ndarray, np.ndarray]:
    """(pixel_ids, valid) for the megakernel's tile-major pixel order, padded
    so every rays-shard owns the same tile count.

    Matches the kernel's lane mapping exactly (megakernel kernel body):
    tile t covers block (t % nbx, t // nbx); lane l in the (8,128) tile maps
    to block offsets (l % 32, l // 32) with out-of-image coordinates CLAMPED
    to the edge pixel. Clamped duplicates and padding tiles get valid=False —
    they trace (matching the kernel) but are masked out of losses/gradients.
    """
    w, h = camera.image_width, camera.image_height
    nbx = (w + mk.BLOCK - 1) // mk.BLOCK
    nby = (h + mk.BLOCK - 1) // mk.BLOCK
    n_tiles = nbx * nby
    n_rd = mesh.shape[RAYS_AXIS]
    nt_dev = (n_tiles + n_rd - 1) // n_rd
    tiles = np.arange(n_rd * nt_dev)
    lane = np.arange(mk.TILE)
    bx = (tiles % nbx)[:, None] * mk.BLOCK + lane[None, :] % mk.BLOCK
    by = (tiles // nbx)[:, None] * mk.BLOCK + lane[None, :] // mk.BLOCK
    px = np.minimum(bx, w - 1)
    py = np.minimum(by, h - 1)
    pid = (py * w + px).astype(np.int32)
    valid = (bx < w) & (by < h) & (tiles[:, None] < n_tiles)
    return pid.reshape(-1), valid.reshape(-1)


# cache of jitted shard_map cores: one compile per static configuration
_core_cache: dict = {}
_CORE_CACHE_MAX = 16


def _get_core(mesh, camera, width, height, spp, max_depth,
              treedef, is_diff, recorder, interpret, kernel_cfg):
    # ``camera`` is the full Camera (the kernel builder needs background/
    # defocus); the shard body receives CameraConstants as a traced arg.
    # treedef carries the CompiledScene's static flags (register_dataclass
    # meta fields), so scene structure is part of the key through it
    key = (mesh, mk._cam_key(camera), width, height, spp, max_depth,
           treedef, is_diff, recorder, bool(interpret), kernel_cfg)
    fn = _core_cache.get(key)
    if fn is not None:
        return fn
    while len(_core_cache) >= _CORE_CACHE_MAX:
        _core_cache.pop(next(iter(_core_cache)))

    n_rd = mesh.shape[RAYS_AXIS]
    n_sd = mesh.shape[SAMPLE_AXIS]
    spp_local = spp // n_sd
    use_kernel = recorder == "kernel"
    if use_kernel:
        (dims, flags, med_types, img_dims, nt_dev, n_dev_args) = kernel_cfg
        raw_rec = mk._get_call(
            camera, width, height, spp_local, max_depth,
            dims, flags, med_types, img_dims, nt_dev, True, interpret,
            jit=False,
            vma=(RAYS_AXIS, SAMPLE_AXIS) if n_sd > 1 else (RAYS_AXIS,))
    else:
        nt_dev = kernel_cfg  # pixel rows per device / TILE
        n_dev_args = 0

    from ..ops import replay as replay_mod

    def shard_fn(diff, frozen, cam, target, valid, pid, seed_arr, *dev_args):
        ridx = jax.lax.axis_index(RAYS_AXIS)
        sidx = (jax.lax.axis_index(SAMPLE_AXIS) if n_sd > 1
                else jnp.int32(0))
        sample_base = sidx * spp_local
        seed = seed_arr[0]

        def rebuild(diff_leaves):
            it_d, it_f = iter(diff_leaves), iter(frozen)
            merged = [next(it_d) if d else next(it_f) for d in is_diff]
            return jax.tree_util.tree_unflatten(treedef, merged)

        scene0 = rebuild(diff)

        # ---- 1. record this device's (tile range x sample range)
        if use_kernel:
            scal = jnp.stack([seed.astype(jnp.int32),
                              (ridx * nt_dev).astype(jnp.int32),
                              sample_base.astype(jnp.int32)])
            (rec_raw,) = raw_rec(*dev_args, scal)
            recs = rec_raw.reshape(nt_dev, spp_local, max_depth, mk.ROWS,
                                   mk.LANES)
            # depth-major (replay layout): bounce rows are a free reshape
            recs = recs.transpose(2, 1, 0, 3, 4).reshape(
                max_depth, spp_local, nt_dev * mk.TILE)
        else:
            # in-shard XLA search (CPU meshes / unsupported scenes): the
            # sample_offset rides as a traced scalar, so one trace serves
            # every sample-shard coordinate
            recs = jax.lax.stop_gradient(replay_mod.records_xla(
                jax.tree_util.tree_map(jax.lax.stop_gradient, scene0),
                cam, pid, seed, spp_local, max_depth,
                sample_offset=sample_base))

        n_local = pid.shape[0]

        # ---- 2. differentiable replay of the block; 3. collectives
        def local_loss(diff_leaves):
            scene_ = rebuild(diff_leaves)
            k = spp_local
            pix = jnp.tile(pid, k)
            samp = sample_base + jnp.repeat(
                jnp.arange(k, dtype=jnp.int32), n_local)
            o, d, t = get_rays(cam, seed, pix, samp)
            r2 = recs.reshape(max_depth, k * n_local)
            rad, nb = replay_mod.trace_replay(scene_, o, d, t,
                                              (seed, pix, samp), r2,
                                              max_depth, remat=True)
            local_sum = rad.reshape(k, n_local, 3).sum(0)
            # full-spp mean assembled INSIDE the loss: autodiff transposes
            # the psum; SSE is exact, not a sum of per-chunk SSEs
            mean = (jax.lax.psum(local_sum, SAMPLE_AXIS) / spp
                    if n_sd > 1 else local_sum / spp)
            err = jnp.where(valid[:, None], mean - target, 0.0)
            return jnp.sum(err * err), jnp.sum(nb).astype(jnp.float32)

        (loss, nrays), g = jax.value_and_grad(local_loss, has_aux=True)(diff)
        # loss is sample-invariant post-psum; total SSE reduces pixel shards.
        # g needs NO explicit collective: the tgather transpose psums table
        # cotangents over its vma difference, and shard_map's transpose of
        # replicated (P()) inputs psums the rest — an explicit psum here
        # would double-count (verified on the CPU mesh in round 3).
        loss = jax.lax.psum(loss, RAYS_AXIS)
        nrays = jax.lax.psum(nrays, (RAYS_AXIS, SAMPLE_AXIS)
                             if n_sd > 1 else RAYS_AXIS)
        return loss, nrays, g

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(RAYS_AXIS), P(RAYS_AXIS), P(RAYS_AXIS),
                  P()) + (P(),) * n_dev_args,
        out_specs=(P(), P(), P()),
    ))
    _core_cache[key] = fn
    return fn


def replay_loss_and_grad(scene, camera: Camera, mesh, target_image,
                         seed: int = 0, spp: Optional[int] = None,
                         max_depth: Optional[int] = None,
                         recorder: str = "auto", interpret: bool = False,
                         dtype=jnp.float32):
    """Distributed (loss, grad, rays) of the SSE to ``target_image`` over the
    record/replay pipeline: the sharded analog of grad.loss_and_grad with
    ``loss_fn = sum((img - target)^2)`` over real pixels.

    ``recorder``: 'kernel' (Pallas record-mode megakernel per device tile
    range — the TPU production path), 'xla' (in-shard XLA search — CPU meshes
    and unsupported scenes), or 'auto'.

    Returns (loss, grad CompiledScene pytree, rays_traced) — all replicated.
    """
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    n_sd = mesh.shape[SAMPLE_AXIS]
    if spp % n_sd:
        raise ValueError(f"spp={spp} not divisible by sample axis {n_sd}")
    if recorder == "auto":
        recorder = ("kernel" if (jax.default_backend() == "tpu"
                                 or interpret) and mk.supports(scene)
                    else "xla")

    cam = camera.constants(dtype)
    pid_np, valid_np = tile_pixel_layout(camera, mesh)
    pid = jnp.asarray(pid_np)
    valid = jnp.asarray(valid_np)
    target = jnp.asarray(
        np.asarray(target_image, np.float64).reshape(-1, 3)[pid_np], dtype)

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    is_diff = tuple(jnp.issubdtype(l.dtype, jnp.floating) for l in leaves)
    diff = tuple(l for l, d in zip(leaves, is_diff) if d)
    frozen = tuple(l for l, d in zip(leaves, is_diff) if not d)

    if recorder == "kernel":
        n_prims = int(np.asarray(scene.sph_valid).sum()
                      + np.asarray(scene.quad_valid).sum())
        use_bvh = n_prims >= mk.BVH_KERNEL_THRESHOLD
        packed, dev_args, use_bvh = mk._packed_dev(scene, use_bvh)
        S, Q, M = packed.n_spheres, packed.n_quads, packed.n_media
        dims = (S, Q, M, packed.n_mat_chunks, packed.n_tex_chunks,
                packed.bvh_i.shape[0])
        flags = (use_bvh, packed.has_checker, packed.has_noise, M > 0,
                 packed.has_image)
        med_types = tuple(int(t) for t in packed.med_i[:M, 0])
        img_dims = (packed.img_h, packed.img_w, packed.img_tab.shape[1])
        nt_dev = pid_np.shape[0] // mesh.shape[RAYS_AXIS] // mk.TILE
        kernel_cfg = (dims, flags, med_types, img_dims, nt_dev, len(dev_args))
    else:
        dev_args = ()
        nt_dev = pid_np.shape[0] // mesh.shape[RAYS_AXIS] // mk.TILE
        kernel_cfg = nt_dev

    core = _get_core(mesh, camera, camera.image_width, camera.image_height,
                     spp, max_depth, treedef, is_diff,
                     recorder, interpret, kernel_cfg)
    loss, nrays, dg = core(diff, frozen, cam, target, valid, pid,
                           jnp.asarray([seed], jnp.uint32), *dev_args)
    it_g = iter(dg)
    grad_leaves = [next(it_g) if d else jnp.zeros_like(l)
                   for l, d in zip(leaves, is_diff)]
    grad = jax.tree_util.tree_unflatten(treedef, grad_leaves)
    return loss, grad, float(nrays)


def make_replay_train_step(mesh, camera: Camera, spp: int, max_depth: int,
                           learning_rate: float = 1.0,
                           trainable: Tuple[str, ...] = ("tex_rgb",
                                                         "mat_albedo"),
                           recorder: str = "auto", interpret: bool = False,
                           dtype=jnp.float32):
    """Production distributed training step on the record/replay pipeline:

        step(scene, target_image (H,W,3), seed) -> (scene', loss)

    Per step: sharded record (each device's tile x sample block) -> local
    O(rays) replay VJP -> gradient psum over ICI -> SGD on the ``trainable``
    CompiledScene fields. This replaces differentiating through the XLA
    wavefront search (parallel/render_dist.make_distributed_train_step, kept
    as the generic fallback for custom hit kernels / arbitrary pixel
    shardings) — per chip it runs at the single-chip replay pipeline's speed.
    """

    def step(scene, target_image, seed: int = 0):
        loss, g, _ = replay_loss_and_grad(
            scene, camera, mesh, target_image, seed=seed, spp=spp,
            max_depth=max_depth, recorder=recorder, interpret=interpret,
            dtype=dtype)
        updates = {name: getattr(scene, name)
                   - learning_rate * getattr(g, name) for name in trainable}
        return dataclasses.replace(scene, **updates), loss

    return step
