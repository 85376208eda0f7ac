"""Differentiable rendering: gradients of radiance w.r.t. scene parameters.

The reference renderer is not differentiable at all; this is the framework's
north-star extension (BASELINE.json): reverse-mode gradients of pixel radiance
w.r.t. sphere centers/radii, albedos (solid/checker/metal colors), texture
parameters, media densities — every float leaf of the CompiledScene pytree.

Approach (SURVEY.md §7 'gradients through discrete events'): RNG is fixed per
(seed, pixel, sample, bounce), so the Monte-Carlo estimator is a deterministic
function of the scene; discrete decisions (closest-hit winner, material
branch, Schlick coin, medium scatter-or-not) are piecewise-constant in the
parameters and autodiff flows through the *continuous* quantities (t, hit
points, normals, attenuations) within each region. This matches finite
differences of the same fixed-RNG estimator everywhere except on the
measure-zero decision boundaries; the silhouette boundary term is not
estimated (documented limitation, matching the contract's FD-check metric).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, CameraConstants, get_rays
from .ops import integrator


def _sum_samples(rad, k: int, C: int):
    """Sum a flattened (k*C, 3) radiance batch over its k samples with a
    STRICTLY SEQUENTIAL association: s0 + s1 + ... + s_{k-1}.

    A ``rad.reshape(k, C, 3).sum(0)`` leaves the association to XLA, and the
    chosen order turned out to be fusion-context-dependent: the identical
    reduce lowered with different accumulation orders inside the replay
    pipeline's jit versus the direct estimator's, breaking the replay ==
    direct bitwise contract by 1 ulp on deep scenes (round-4 regression,
    caught by tests/test_megakernel.py::test_deferred_render_bitwise...).
    A fori_loop of per-sample adds cannot be reassociated by any compiler
    pass, so every estimator (direct, replay, wavefront, megakernel — the
    kernel's on-chip sample scan is sequential by construction) shares ONE
    deterministic association."""
    rad = rad.reshape(k, C, 3)
    if k == 1:
        return rad[0]
    return jax.lax.fori_loop(
        1, k, lambda i, acc: acc + rad[i], rad[0])


def _chunked_mean(scene, pixel_ids, spp: int, sample_chunk: int, dtype,
                  chunk_rad):
    """Shared sample-flattening driver for both grad pipelines: samples are
    flattened into the ray batch (``sample_chunk`` per wavefront) and summed
    with ONE reduction shape, so the direct and replay estimators associate
    their float sums identically (their gradients are compared bitwise in
    tests). ``chunk_rad(scene, s0, k)`` -> (radiance sum (C,3), ray count).
    """
    C = pixel_ids.shape[0]
    K = min(sample_chunk, spp)
    acc = jnp.zeros((C, 3), dtype)
    nrays = jnp.zeros((), jnp.float32)
    n_full = spp // K

    if n_full:
        def body(c, carry):
            acc, nrays = carry
            rad, nb = chunk_rad(scene, c * K, K)
            return acc + rad, nrays + nb

        acc, nrays = jax.lax.fori_loop(0, n_full, body, (acc, nrays))
    rem = spp - n_full * K
    if rem:
        rad, nb = chunk_rad(scene, n_full * K, rem)
        acc, nrays = acc + rad, nrays + nb
    return acc / spp, nrays


@functools.partial(jax.jit,
                   static_argnames=("spp", "max_depth", "hit_fn", "remat",
                                    "sample_chunk"))
def radiance_mean_rays(scene, cam: CameraConstants, pixel_ids, seed, spp: int,
                       max_depth: int, hit_fn=None, remat: bool = False,
                       sample_chunk: Optional[int] = None):
    """(mean radiance (C,3), rays traced ()) over ``spp`` fixed-RNG samples.

    RNG is the counter-based generator addressed by (seed, pixel, sample,
    bounce) — the estimator is a deterministic function of the scene for a
    fixed seed, which is what makes finite-difference gradient checks exact.

    Differentiable w.r.t. ``scene``. The closest-hit search is detached with
    an O(rays) differentiable winner recompute (ops/intersect.py). Samples
    are flattened into the ray batch in chunks (same driver as the replay
    pipeline); each chunk is checkpointed so reverse-mode holds one chunk's
    residuals. The direct path materializes the (rays x prims) search, so its
    chunk budget is scaled down by the primitive count. The ray counter is an
    exact count of scene queries (for honest rays/s).
    """
    C = pixel_ids.shape[0]
    dtype = cam.center.dtype
    if sample_chunk is None:
        n_prims = scene.sph_radius.shape[0] + scene.quad_mat.shape[0]
        budget = max(1 << 14, REPLAY_RAY_BUDGET // max(1, n_prims // 8))
        sample_chunk = max(1, min(spp, budget // max(C, 1)))

    @functools.partial(jax.checkpoint, static_argnums=(2,))
    def chunk_rad(scene_, s0, k: int):
        pix = jnp.tile(pixel_ids, k)
        samp = s0 + jnp.repeat(jnp.arange(k, dtype=jnp.int32), C)
        o, d, t = get_rays(cam, seed, pix, samp)
        rad, nb = integrator.trace(scene_, o, d, t, (seed, pix, samp),
                                   max_depth, closest_hit_fn=hit_fn,
                                   remat=remat)
        return (_sum_samples(rad, k, C),
                jnp.sum(nb).astype(jnp.float32))

    return _chunked_mean(scene, pixel_ids, spp, sample_chunk, dtype,
                         chunk_rad)


def radiance_mean(scene, cam: CameraConstants, pixel_ids, seed, spp: int,
                  max_depth: int, hit_fn=None):
    """Mean radiance per pixel over ``spp`` fixed-RNG samples, (C,3)."""
    return radiance_mean_rays(scene, cam, pixel_ids, seed, spp, max_depth,
                              hit_fn)[0]


# Flattened (sample x pixel) wavefront budget for the replay pipeline: the
# largest ray batch one bounce materializes at once. 2^22 rays keep the
# per-bounce carry (~14 f32 lanes) plus the per-bounce checkpointed residuals
# comfortably inside a v5e's HBM while saturating the VPU.
REPLAY_RAY_BUDGET = 1 << 22


@functools.partial(jax.jit,
                   static_argnames=("spp", "max_depth", "sample_chunk"))
def radiance_mean_replay_rays(scene, cam: CameraConstants, pixel_ids, seed,
                              records, spp: int, max_depth: int,
                              sample_chunk: Optional[int] = None,
                              sample_base=0):
    """Search-free differentiable radiance mean from recorded hit winners
    (ops/replay.py). ``records``: (max_depth, spp, C) int32 aligned with
    ``pixel_ids``. O(rays) forward AND backward — no (rays x prims) search
    appears anywhere in the autodiff graph.

    ``sample_base`` offsets the GLOBAL sample indices (RNG addressing +
    camera jitter) while records stay chunk-local — the gradient-accumulation
    driver (_chunked_recorder_vag) records/replays the spp axis in bounded
    slices of a larger workload.

    Samples are FLATTENED into the ray batch (``sample_chunk`` samples per
    wavefront, default as many as fit REPLAY_RAY_BUDGET): one bounce step
    processes (K*C,) rays instead of looping spp sequential (C,) passes —
    the op count drops spp-fold and every op runs at full-batch VPU
    efficiency. Per-bounce rematerialization (trace_replay remat) plus a
    per-chunk jax.checkpoint bound reverse-mode memory to one chunk's carry.
    """
    from .ops import replay as replay_mod

    C = pixel_ids.shape[0]
    dtype = cam.center.dtype
    if sample_chunk is None:
        sample_chunk = max(1, min(spp, REPLAY_RAY_BUDGET // max(C, 1)))

    @functools.partial(jax.checkpoint, static_argnums=(2,))
    def chunk_rad(scene_, s0, k: int):
        """Radiance sum + ray count over samples [s0, s0+k) in one wavefront."""
        pix = jnp.tile(pixel_ids, k)
        samp = (jnp.asarray(sample_base, jnp.int32) + s0
                + jnp.repeat(jnp.arange(k, dtype=jnp.int32), C))
        o, d, t = get_rays(cam, seed, pix, samp)
        # depth-major records: the per-bounce view is a free reshape
        recs = jax.lax.dynamic_slice_in_dim(records, s0, k, axis=1)
        recs = recs.reshape(max_depth, k * C)
        rad, nb = replay_mod.trace_replay(scene_, o, d, t, (seed, pix, samp),
                                          recs, max_depth, remat=True)
        return (_sum_samples(rad, k, C),
                jnp.sum(nb).astype(jnp.float32))

    return _chunked_mean(scene, pixel_ids, spp, sample_chunk, dtype,
                         chunk_rad)


def _is_identity_pixels(pixel_ids, n_pix: int) -> bool:
    """True when ``pixel_ids`` is exactly arange(n_pix) (full frame in
    order). One small host pull; guards multi-hundred-MB identity gathers."""
    if pixel_ids.shape[0] != n_pix:
        return False
    pid = np.asarray(pixel_ids)
    return bool(pid[0] == 0 and pid[-1] == n_pix - 1
                and np.array_equal(pid, np.arange(n_pix, dtype=pid.dtype)))


def get_records(scene, camera: Camera, seed: int, spp: int, max_depth: int,
                pixel_ids=None, hit_fn=None, dtype=jnp.float32,
                sample_offset: int = 0, prefer_kernel: bool = True):
    """Per-(sample, bounce) hit-winner records for the replay pipeline,
    covering global samples ``sample_offset .. sample_offset + spp``.

    On TPU this is the Pallas recorder (megakernel.record_paths) over the
    full image (subset by ``pixel_ids`` afterwards); elsewhere the XLA search
    produces identical records. Records are data, not a differentiable
    quantity (the search is piecewise-constant — SURVEY.md §7).

    ``prefer_kernel=False`` forces the XLA search — required when the caller
    supplies a custom ``hit_fn`` (the Pallas recorder runs its own search and
    would silently ignore it).
    """
    from .ops import megakernel as mk
    from .ops import replay as replay_mod

    n_pix = camera.image_width * camera.image_height
    if (prefer_kernel and jax.default_backend() == "tpu"
            and mk.supports(scene)):
        recs = mk.record_paths(scene, camera, seed, spp, max_depth,
                               sample_offset=sample_offset)
        if pixel_ids is not None and not _is_identity_pixels(pixel_ids,
                                                            n_pix):
            # subset gather only when actually subsetting: a full-frame
            # identity take would copy the whole (spp, depth, n_pix) record
            # volume (~256 MB/slice in the chunked headline path) for nothing
            recs = jnp.take(recs, jnp.asarray(pixel_ids), axis=2)
        return recs
    cam = camera.constants(dtype)
    if pixel_ids is None:
        pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    return jax.lax.stop_gradient(
        replay_mod.records_xla(scene, cam, pixel_ids, jnp.uint32(seed), spp,
                               max_depth, hit_fn,
                               sample_offset=sample_offset))


def loss_and_grad(scene, camera: Camera, loss_fn: Callable, seed: int = 0,
                  spp: Optional[int] = None, max_depth: Optional[int] = None,
                  pixel_ids=None, hit_fn=None, dtype=jnp.float32,
                  with_rays: bool = False, remat: bool = False,
                  use_recorder: Optional[bool] = None,
                  linear_loss: bool = False):
    """(loss, d loss / d scene) for ``loss_fn(image_flat (C,3), pixel_ids)``.

    ``pixel_ids`` defaults to the full image. The returned gradient is a
    CompiledScene pytree (int/bool leaves get zero cotangents). With
    ``with_rays``, returns (loss, grad, rays_traced) where rays_traced is the
    exact forward scene-query count (the backward pass rematerializes the same
    paths, so fwd+bwd rays/s is conventionally measured against this count).

    ``use_recorder`` selects the record/replay pipeline (default: on for TPU
    backends): the hit SEARCH runs once in the fused Pallas recorder, and the
    differentiable pass replays the recorded winners with O(rays) work.

    ``linear_loss``: the caller asserts d loss/d image is a CONSTANT (mean /
    weighted-sum losses). The chunked big-workload path then skips its
    dedicated forward render — the cotangent is evaluated at a zero image and
    the loss at the image the slice VJPs reconstruct. The assertion is
    validated by a cheap linearity probe (ValueError on a nonlinear loss);
    ignored on the single-shot path.
    """
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    custom_hit = hit_fn is not None
    if hit_fn is None:
        from .ops.bvh_traverse import auto_closest_hit

        hit_fn = auto_closest_hit(scene)
    cam = camera.constants(dtype)
    if pixel_ids is None:
        pixel_ids = jnp.arange(camera.image_width * camera.image_height,
                               dtype=jnp.int32)
    seed_arr = jnp.uint32(seed)
    if linear_loss:
        # loud failure on misuse (the chunked path would otherwise silently
        # return a wrong loss AND gradient); costs three tiny loss evals
        _check_linear_loss(loss_fn, pixel_ids, pixel_ids.shape[0],
                           cam.center.dtype)

    # Differentiate w.r.t. the float leaves only; int/bool leaves (type codes,
    # validity masks) are structural and get zero-gradient placeholders.
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    is_diff = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
    diff = [l for l, d in zip(leaves, is_diff) if d]
    frozen = [l for l, d in zip(leaves, is_diff) if not d]

    if use_recorder is None:
        use_recorder = jax.default_backend() == "tpu"

    C = pixel_ids.shape[0]
    if use_recorder and spp * max_depth * C > RECORD_BUDGET_ENTRIES:
        # Big workloads (the contract's 600x600@200spp is 0.6G record
        # entries = 2.3 GB; alongside replay residuals that OOMs a v5e):
        # two-pass gradient accumulation over bounded sample slices.
        if remat:
            import warnings

            warnings.warn(
                "loss_and_grad: remat is ignored on the chunked-accumulation "
                "path (each sample slice is already checkpointed); results "
                "are identical, only reverse-mode memory differs.",
                stacklevel=2)
        loss, nrays, dg = _chunked_recorder_vag(
            scene, camera, loss_fn, seed, spp, max_depth, pixel_ids, hit_fn,
            dtype, cam, seed_arr, tuple(diff), tuple(frozen), treedef,
            tuple(is_diff), linear_loss=linear_loss,
            allow_kernel=not custom_hit)
    else:
        records = None
        if use_recorder:
            records = get_records(scene, camera, seed, spp, max_depth,
                                  pixel_ids=pixel_ids, hit_fn=hit_fn,
                                  dtype=dtype, prefer_kernel=not custom_hit)
        loss, nrays, dg = _vag(tuple(diff), tuple(frozen), treedef,
                               tuple(is_diff), cam, pixel_ids, seed_arr,
                               records, spp=spp, max_depth=max_depth,
                               hit_fn=hit_fn, remat=remat, loss_fn=loss_fn)
    it_g = iter(dg)
    grad_leaves = [next(it_g) if d else jnp.zeros_like(l)
                   for l, d in zip(leaves, is_diff)]
    grad = jax.tree_util.tree_unflatten(treedef, grad_leaves)
    if with_rays:
        return loss, grad, float(nrays)
    return loss, grad


# Bound on record entries (int32) held on device at once; past it the
# gradient runs as two-pass accumulation over sample slices.
RECORD_BUDGET_ENTRIES = 1 << 26  # 256 MB of records per slice


def _check_linear_loss(loss_fn, pixel_ids, C, dtype):
    """``linear_loss=True`` is a caller assertion that d loss/d image is
    constant; misuse silently produces a wrong loss AND gradient (the
    cotangent is evaluated at a zero image). This cheap secant probe makes
    misuse fail loudly: for an affine loss, loss(2x) - 2*loss(x) + loss(0)
    is exactly zero; three tiny loss evaluations cost nothing next to the
    render they guard."""
    x = ((jnp.arange(C * 3, dtype=jnp.float32) * 0.6180339887) % 1.0)
    x = x.reshape(C, 3).astype(dtype)
    l0 = float(loss_fn(jnp.zeros_like(x), pixel_ids))
    l1 = float(loss_fn(x, pixel_ids))
    l2 = float(loss_fn(2.0 * x, pixel_ids))
    resid = abs(l2 - 2.0 * l1 + l0)
    scale = max(abs(l1 - l0), abs(l0), 1e-30)
    if not resid <= 1e-3 * scale + 1e-12:  # 'not <=' also catches NaN
        raise ValueError(
            "loss_and_grad(linear_loss=True): loss_fn failed the linearity "
            f"probe (|l(2x)-2l(x)+l(0)| = {resid:.3e} vs scale {scale:.3e}). "
            "linear_loss requires d loss/d image to be CONSTANT (mean / "
            "weighted-sum losses); drop the flag for nonlinear losses.")


def _chunked_recorder_vag(scene, camera, loss_fn, seed, spp, max_depth,
                          pixel_ids, hit_fn, dtype, cam, seed_arr, diff,
                          frozen, treedef, is_diff, linear_loss=False,
                          allow_kernel=True):
    """Two-pass gradient accumulation for record/replay workloads whose
    records don't fit on device at once:

      1. forward: the full-spp mean image is rendered by the production
         megakernel — but ONLY for scene families where tests prove
         kernel==XLA bitwise (solid/checker; the kernel's noise texture is a
         different random instance and its image texture samples a mip, so
         those families use the chunked replay forward, the SAME estimator
         the VJP differentiates) — and the loss cotangent d loss/d image is
         computed once at that image.
      2. backward: for each bounded sample slice, record (Pallas recorder at
         ``sample_offset``) and accumulate the slice's VJP with cotangent
         (k/spp) * d loss/d image. Radiance is linear in per-slice means, so
         the accumulated VJPs are exactly the full-workload gradient (up to
         float-sum association of the slice partition).

    With ``linear_loss`` (caller asserts d loss/d image is constant — mean /
    dot-product losses; validated by a cheap linearity probe), pass 1 is
    skipped entirely: the cotangent is evaluated at a zero image, and the
    loss comes from the image the slice VJP primals reconstruct during
    pass 2.

    ``allow_kernel=False`` (caller supplied a custom hit_fn) forces the XLA
    search for both the pass-1 forward and the records, so the estimator
    honors the custom kernel everywhere.

    Returns (loss, rays, grads-over-diff-leaves) like _vag.
    """
    C = pixel_ids.shape[0]
    spp_chunk = max(1, min(spp, RECORD_BUDGET_ENTRIES // (max_depth * C)))

    # ---- pass 1: full-spp forward mean + loss cotangent
    from .ops import megakernel as mk

    if linear_loss:
        zero_img = jnp.zeros((C, 3), cam.center.dtype)
        l0, vjp_loss = jax.vjp(lambda im: loss_fn(im, pixel_ids), zero_img)
        (g_img,) = vjp_loss(jnp.ones_like(l0))
    else:
        # kernel pass-1 only where kernel==XLA is bitwise (no noise-instance
        # or image-mip divergence): the cotangent must be linearized at the
        # same image the replay estimator reconstructs, or the gradient of a
        # nonlinear loss is silently biased.
        kernel_exact = not (scene.has_noise or scene.has_image)
        if (allow_kernel and kernel_exact
                and jax.default_backend() == "tpu" and mk.supports(scene)):
            img_full = mk.render_fast(scene, camera, seed=seed, spp=spp,
                                      max_depth=max_depth)
            img_flat = jnp.asarray(img_full.reshape(-1, 3),
                                   cam.center.dtype)[pixel_ids]
        else:  # chunked replay forward: the estimator being differentiated
            acc = jnp.zeros((C, 3), cam.center.dtype)
            for c0 in range(0, spp, spp_chunk):
                k = min(spp_chunk, spp - c0)
                recs = get_records(scene, camera, seed, k, max_depth,
                                   pixel_ids=pixel_ids, hit_fn=hit_fn,
                                   dtype=dtype, sample_offset=c0,
                                   prefer_kernel=allow_kernel)
                m, _ = radiance_mean_replay_rays(scene, cam, pixel_ids,
                                                 seed_arr, recs, k, max_depth,
                                                 sample_base=jnp.int32(c0))
                acc = acc + m * (k / spp)
            img_flat = acc
        loss, vjp_loss = jax.vjp(lambda im: loss_fn(im, pixel_ids), img_flat)
        (g_img,) = vjp_loss(jnp.ones_like(loss))

    # ---- pass 2: accumulate per-slice VJPs (+ image primal when linear).
    # The ray count stays a DEVICE scalar until the end: a float(nr) pull
    # per slice is a full tunnel round trip (~5-25 ms) that stalls the
    # async dispatch pipeline between slices (measured ~6% of the whole
    # contract fwd+bwd at 600x600@200spp's 9 slices).
    grads = None
    nrays_parts = []
    img_acc = None
    for c0 in range(0, spp, spp_chunk):
        k = min(spp_chunk, spp - c0)
        recs = get_records(scene, camera, seed, k, max_depth,
                           pixel_ids=pixel_ids, hit_fn=hit_fn, dtype=dtype,
                           sample_offset=c0, prefer_kernel=allow_kernel)
        ct = (g_img * (k / spp)).astype(cam.center.dtype)
        img_k, nr, dg = _chunk_vjp(diff, frozen, treedef, is_diff, cam,
                                   pixel_ids, seed_arr, recs, ct,
                                   jnp.int32(c0), spp=k, max_depth=max_depth)
        nrays_parts.append(nr)
        grads = dg if grads is None else [a + b for a, b in zip(grads, dg)]
        if linear_loss:
            w_img = img_k * (k / spp)
            img_acc = w_img if img_acc is None else img_acc + w_img
    if linear_loss:
        loss = loss_fn(img_acc, pixel_ids)
    nrays = float(jnp.sum(jnp.stack(nrays_parts)))
    return loss, nrays, grads


@functools.partial(
    jax.jit,
    static_argnames=("treedef", "is_diff", "spp", "max_depth"))
def _chunk_vjp(diff, frozen, treedef, is_diff, cam, pixel_ids, seed_arr,
               records, ct, sample_base, spp, max_depth):
    """VJP of one sample-slice's replay mean with an external cotangent."""

    def rebuild(diff_leaves):
        it_d, it_f = iter(diff_leaves), iter(frozen)
        merged = [next(it_d) if d else next(it_f) for d in is_diff]
        return jax.tree_util.tree_unflatten(treedef, merged)

    def f(diff_leaves):
        img, nr = radiance_mean_replay_rays(rebuild(diff_leaves), cam,
                                            pixel_ids, seed_arr, records,
                                            spp, max_depth,
                                            sample_base=sample_base)
        return img, nr

    img, vjp_fn, nr = jax.vjp(f, diff, has_aux=True)
    (dg,) = vjp_fn(ct)
    return img, nr, dg


@functools.partial(
    jax.jit,
    static_argnames=("treedef", "is_diff", "spp", "max_depth", "hit_fn",
                     "remat", "loss_fn"))
def _vag(diff, frozen, treedef, is_diff, cam, pixel_ids, seed_arr, records,
         spp, max_depth, hit_fn, remat, loss_fn):
    """Jitted value-and-grad core of loss_and_grad: cached across calls for a
    fixed (scene structure, workload, loss_fn), so repeated training steps
    pay tracing once. ``records is None`` selects the direct pipeline."""

    def rebuild(diff_leaves):
        it_d, it_f = iter(diff_leaves), iter(frozen)
        merged = [next(it_d) if d else next(it_f) for d in is_diff]
        return jax.tree_util.tree_unflatten(treedef, merged)

    def scalar_loss(diff_leaves):
        if records is not None:
            img, nrays = radiance_mean_replay_rays(
                rebuild(diff_leaves), cam, pixel_ids, seed_arr, records, spp,
                max_depth)
        else:
            img, nrays = radiance_mean_rays(rebuild(diff_leaves), cam,
                                            pixel_ids, seed_arr, spp,
                                            max_depth, hit_fn, remat=remat)
        return loss_fn(img, pixel_ids), nrays

    (loss, nrays), dg = jax.value_and_grad(scalar_loss, has_aux=True)(diff)
    return loss, nrays, dg


def l2_to_target(target_flat):
    """Convenience loss: mean squared error to a target image (C,3)."""
    t = jnp.asarray(target_flat)

    def loss(img, pixel_ids):
        return jnp.mean((img - t) ** 2)

    return loss


def fit_scene(scene, camera: Camera, target_image: np.ndarray, steps: int,
              learning_rates: dict, seed: int = 0, spp: int = 16,
              max_depth: int = 4, log_every: int = 0,
              resample: bool = True):
    """Tiny inverse-rendering loop: SGD on selected scene leaves.

    ``learning_rates`` maps CompiledScene field names to step sizes; other
    leaves stay frozen. ``resample=False`` keeps the RNG fixed across steps
    (deterministic objective — useful for exact-recovery tests).
    Returns (scene, losses).
    """
    import time as _time

    from .utils import metrics

    target = jnp.asarray(target_image.reshape(-1, 3), scene.background.dtype)
    loss_fn = l2_to_target(target)
    losses = []
    for step in range(steps):
        t0 = _time.perf_counter()
        loss, g, nrays = loss_and_grad(scene, camera, loss_fn,
                                       seed=seed + step if resample else seed,
                                       spp=spp, max_depth=max_depth,
                                       dtype=scene.background.dtype,
                                       with_rays=True)
        updates = {}
        for name, lr in learning_rates.items():
            updates[name] = getattr(scene, name) - lr * getattr(g, name)
        scene = scene.replace(**updates) if hasattr(scene, "replace") else \
            _replace_dataclass(scene, updates)
        losses.append(float(loss))
        dt = _time.perf_counter() - t0
        metrics.emit("train_step", step=step, loss=float(loss), seconds=dt,
                     rays=nrays, rays_per_sec=nrays / dt if dt > 0 else 0.0)
        if log_every and step % log_every == 0:
            print(f"step {step}: loss {loss:.6f}")
    return scene, losses


def _replace_dataclass(obj, updates):
    import dataclasses

    return dataclasses.replace(obj, **updates)
