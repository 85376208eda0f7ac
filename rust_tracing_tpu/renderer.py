"""Offline and progressive render drivers.

TPU-native counterpart of src/renderer.rs: the rayon pixel fan-out
(renderer.rs:26-49) becomes a jitted chunk kernel — a flat batch of pixels x
an on-device sample loop — driven by a host loop over pixel chunks. The
progressive driver mirrors live_render's incremental mean accumulation
(renderer.rs:105-117) and doubles as the checkpointable state (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import functools
import time as _time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, CameraConstants, get_rays
from .ops import integrator
from .utils import metrics


def _auto_chunk(scene, target_bytes: int = 192 * 1024 * 1024) -> int:
    """Pick a pixel-chunk size so the widest per-ray broadcast fits.

    Brute force materializes (rays x spheres) and (rays x quads) temporaries;
    media add (rays x media x 3) for the local-frame slab test; the BVH path
    gathers per-node rows but its per-ray live set is bounded by a few node
    rows, so the brute-force terms dominate sizing whenever they exist.
    """
    per_ray = 0
    if scene.has_bvh:
        per_ray += 16 * 4 * 4  # ~16 gathered f32 rows live per while-loop step
    else:
        per_ray += (scene.num_spheres + scene.num_quads) * 4 * 8
    if scene.has_media:
        per_ray += scene.med_mat.shape[0] * 3 * 4 * 6  # (R,M,3) temporaries
    per_ray = max(per_ray, 64)
    chunk = max(1024, min(1 << 16, target_bytes // per_ray))
    # round down to a multiple of 1024 for clean tiling
    return max(1024, (chunk // 1024) * 1024)


@functools.partial(jax.jit,
                   static_argnames=("spp", "max_depth", "hit_fn"))
def render_chunk(scene, cam: CameraConstants, pixel_ids, seed, sample_offset,
                 spp: int, max_depth: int, hit_fn=None):
    """Sum of ``spp`` radiance samples for each pixel id, using global sample
    indices ``sample_offset .. sample_offset+spp``. Because the RNG is
    addressed by (seed, pixel, sample) — not by chunk or key chains — the
    result is bitwise independent of how pixels are chunked, and progressive
    accumulation with growing offsets equals one big render exactly.

    Returns (radiance_sum (C,3), rays_traced scalar)."""
    C = pixel_ids.shape[0]
    dtype = cam.center.dtype

    def body(s, carry):
        acc, nrays = carry
        sample = sample_offset + s
        o, d, t = get_rays(cam, seed, pixel_ids, sample)
        rad, nb = integrator.trace(scene, o, d, t, (seed, pixel_ids, sample),
                                   max_depth, closest_hit_fn=hit_fn)
        # float32 counter: exact enough for rays/s and safe from int32 overflow
        return acc + rad, nrays + jnp.sum(nb).astype(jnp.float32)

    acc0 = jnp.zeros((C, 3), dtype)
    acc, nrays = jax.lax.fori_loop(0, spp, body, (acc0, jnp.zeros((), jnp.float32)))
    return acc, nrays


@functools.partial(jax.jit, static_argnames=("spp", "max_depth", "hit_fn"))
def _occupancy_chunk(scene, cam, pixel_ids, seed, spp, max_depth, hit_fn=None):
    def body(s, acc):
        o, d, t = get_rays(cam, seed, pixel_ids, s)
        _, _, occ = integrator.trace(scene, o, d, t, (seed, pixel_ids, s),
                                     max_depth, closest_hit_fn=hit_fn,
                                     with_occupancy=True)
        # int32 carry regardless of x64 mode (jnp.sum of bool widens there)
        return acc + occ.astype(jnp.int32)

    return jax.lax.fori_loop(0, spp, body,
                             jnp.zeros((max_depth,), jnp.int32))


def measure_occupancy(scene, camera: Camera, n_pixels: int = 8192,
                      spp: int = 8, max_depth: Optional[int] = None,
                      seed: int = 0, hit_fn=None) -> np.ndarray:
    """Per-bounce live-ray fraction on a pixel sample — the wavefront
    divergence telemetry of SURVEY.md §7 (hard part #1). fraction[d] is the
    share of lanes still tracing when bounce d begins; the area under the
    curve is the achieved occupancy of a dense depth-scan integrator, and the
    signal that decides whether spp-major batching/compaction pays."""
    max_depth = max_depth or camera.max_depth
    total = camera.image_width * camera.image_height
    n = min(n_pixels, total)
    stride = max(1, total // n)
    ids = jnp.arange(0, n * stride, stride, dtype=jnp.int32) % total
    occ = _occupancy_chunk(scene, camera.constants(jnp.float32), ids,
                           jnp.uint32(seed), spp, max_depth, hit_fn)
    frac = np.asarray(occ, np.float64) / (n * spp)
    metrics.emit("occupancy", per_bounce=[round(float(x), 4) for x in frac],
                 mean=float(frac.mean()))
    return frac


@dataclasses.dataclass
class RenderStats:
    seconds: float = 0.0
    rays: int = 0

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds > 0 else 0.0


def use_megakernel_default(scene, dtype, hit_fn) -> bool:
    """Production fast-path policy: the fused Pallas megakernel renders every
    scene it supports when running on real TPU hardware in f32 with no custom
    hit kernel. CPU runs keep the XLA path (the Pallas interpreter is a
    debugging tool, not a renderer)."""
    from .ops import megakernel

    return (
        hit_fn is None
        and dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and megakernel.supports(scene)
    )


def use_wavefront_default(scene) -> bool:
    """Big scenes take the sorted deferred wavefront (ops/wavefront.py): at
    final_scene's primitive count the fused kernel's lockstep packet walk
    degrades to brute-force cost; the per-bounce coherence sort restores the
    tree's pruning (see WAVEFRONT_PRIM_THRESHOLD)."""
    from .ops.wavefront import WAVEFRONT_PRIM_THRESHOLD

    n_prims = int(np.asarray(scene.sph_valid).sum()
                  + np.asarray(scene.quad_valid).sum())
    return n_prims >= WAVEFRONT_PRIM_THRESHOLD


def use_deferred_default(scene) -> bool:
    """Deferred shading (record + XLA replay) is the production path for the
    scene families where in-kernel shading approximates: image textures (the
    kernel samples a mip; replay samples FULL RESOLUTION) and noise (the
    kernel's hash-lattice is a different random instance; replay uses the
    exact Perlin tables). The estimator equals the XLA wavefront BITWISE
    (replay==direct, tests/test_replay.py) at megakernel search speed."""
    return scene.has_image or scene.has_noise


def render_deferred(scene, camera: Camera, seed: int = 0,
                    spp: Optional[int] = None,
                    max_depth: Optional[int] = None, sample_offset: int = 0,
                    interpret: bool = False,
                    ) -> Tuple[np.ndarray, "RenderStats"]:
    """Deferred-shading render: the Pallas megakernel runs in lean RECORD
    mode (geometry search + path continuation only — no texture/radiance
    work), then the recorded winners are SHADED by the XLA replay pass
    (ops/replay.trace_replay) at full fidelity — full-resolution image
    textures, the exact Perlin table instance, f32 XLA arithmetic.

    Output is bitwise equal to the direct XLA estimator
    (grad.radiance_mean_rays) — the records are proven identical to the XLA
    search and replay==direct is asserted bitwise in tests — while the
    expensive (rays x prims) search runs at megakernel speed.

    spp is sliced so one slice's records stay under grad.RECORD_BUDGET_ENTRIES
    (the record volume never exceeds ~256 MB on device).
    """
    import time as __time

    from . import grad as grad_mod
    from .ops import megakernel as mk

    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    w, h = camera.image_width, camera.image_height
    n_pix = w * h
    cam = camera.constants(jnp.float32)
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    seed_arr = jnp.uint32(seed)
    spp_chunk = max(1, min(
        spp, grad_mod.RECORD_BUDGET_ENTRIES // (max_depth * n_pix)))

    t0 = __time.perf_counter()
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    rays = 0.0
    for c0 in range(0, spp, spp_chunk):
        k = min(spp_chunk, spp - c0)
        recs = mk.record_paths(scene, camera, seed, k, max_depth,
                               sample_offset=sample_offset + c0,
                               interpret=interpret)
        m, nb = grad_mod.radiance_mean_replay_rays(
            scene, cam, pixel_ids, seed_arr, recs, k, max_depth,
            sample_base=jnp.int32(sample_offset + c0))
        acc = acc + m * (k / spp)
        rays += float(nb)
    image = np.asarray(acc, np.float64).reshape(h, w, 3)
    stats = RenderStats(seconds=__time.perf_counter() - t0, rays=int(rays))
    metrics.emit("render", path="deferred", spp=spp, width=w, height=h,
                 seconds=stats.seconds, rays=stats.rays,
                 rays_per_sec=stats.rays_per_sec)
    return image, stats


def render(scene, camera: Camera, seed: int = 0, spp: Optional[int] = None,
           max_depth: Optional[int] = None, pixel_chunk: Optional[int] = None,
           hit_fn=None, dtype=jnp.float32, progress=None,
           use_megakernel: Optional[bool] = None, sample_offset: int = 0,
           ) -> Tuple[np.ndarray, RenderStats]:
    """Offline render -> (image (H,W,3) linear float, stats).

    Equivalent of reference ``render()`` (src/renderer.rs:12-75) minus the PNG
    encode (see utils/image_io.py). On TPU, supported scenes run the fused
    Pallas megakernel (ops/megakernel.py); everything else takes the XLA
    wavefront path.
    """
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth

    if use_megakernel is None:
        use_megakernel = use_megakernel_default(scene, dtype, hit_fn)
        if use_megakernel and use_wavefront_default(scene):
            # big scenes: sorted deferred wavefront — coherence-restoring
            # per-bounce sort + packet-BVH hit kernel + XLA replay shading
            from .ops import wavefront

            return wavefront.render_sorted(scene, camera, seed=seed, spp=spp,
                                           max_depth=max_depth,
                                           sample_offset=sample_offset)
        if use_megakernel and use_deferred_default(scene):
            # image/noise scenes: kernel search + full-fidelity XLA shading
            # (auto policy only — an explicit use_megakernel=True forces the
            # fully-fused kernel, e.g. for parity measurements)
            return render_deferred(scene, camera, seed=seed, spp=spp,
                                   max_depth=max_depth,
                                   sample_offset=sample_offset)
    if use_megakernel:
        from .ops import megakernel

        t0 = _time.perf_counter()
        image, nrays = megakernel.render_fast(scene, camera, seed=seed,
                                              spp=spp, max_depth=max_depth,
                                              sample_offset=sample_offset,
                                              with_stats=True)
        stats = RenderStats(seconds=_time.perf_counter() - t0, rays=int(nrays))
        metrics.emit("render", path="megakernel", spp=spp,
                     width=camera.image_width, height=camera.image_height,
                     seconds=stats.seconds, rays=stats.rays,
                     rays_per_sec=stats.rays_per_sec)
        if progress is not None:
            n = camera.image_width * camera.image_height
            progress(n, n)
        return image.astype(np.float64), stats
    if hit_fn is None:
        from .ops.bvh_traverse import auto_closest_hit

        hit_fn = auto_closest_hit(scene)
    w, h = camera.image_width, camera.image_height
    cam = camera.constants(dtype)
    n_pixels = w * h
    chunk = pixel_chunk or _auto_chunk(scene)
    chunk = min(chunk, n_pixels)

    seed_arr = jnp.uint32(seed)
    offset_arr = jnp.int32(sample_offset)
    out = np.zeros((n_pixels, 3), np.float64)
    stats = RenderStats()
    t0 = _time.perf_counter()

    for start in range(0, n_pixels, chunk):
        ids = np.arange(start, start + chunk, dtype=np.int32)
        ids = np.minimum(ids, n_pixels - 1)  # pad tail chunk with last pixel
        acc, nrays = render_chunk(scene, cam, jnp.asarray(ids), seed_arr,
                                  offset_arr, spp, max_depth, hit_fn)
        n_valid = min(chunk, n_pixels - start)
        out[start:start + n_valid] = np.asarray(acc)[:n_valid]
        stats.rays += int(nrays)
        if progress is not None:
            progress(start + n_valid, n_pixels)

    stats.seconds = _time.perf_counter() - t0
    metrics.emit("render", path="xla_wavefront", spp=spp, width=w, height=h,
                 seconds=stats.seconds, rays=stats.rays,
                 rays_per_sec=stats.rays_per_sec)
    image = (out / spp).reshape(h, w, 3)
    return image, stats


@dataclasses.dataclass
class ProgressiveState:
    """Checkpointable accumulation state: the (buffer, count, key) triple the
    reference's live renderer keeps implicitly (renderer.rs:97-117)."""

    accum: np.ndarray  # (H,W,3) running mean
    num_samples: int
    seed: int


def progressive_init(camera: Camera, seed: int = 0) -> ProgressiveState:
    return ProgressiveState(
        accum=np.zeros((camera.image_height, camera.image_width, 3), np.float64),
        num_samples=0,
        seed=seed,
    )


def progressive_step(scene, camera: Camera, state: ProgressiveState,
                     samples: int = 1, max_depth: Optional[int] = None,
                     pixel_chunk: Optional[int] = None, hit_fn=None,
                     dtype=jnp.float32) -> ProgressiveState:
    """Add ``samples`` new samples per pixel with incremental-mean update
    (renderer.rs:114: avg += (new - avg) / n).

    Samples are addressed globally by index, so a progressive render (and a
    checkpoint-resumed one) accumulates to EXACTLY the same image as a single
    offline render of the same total spp."""
    img, _ = render(scene, camera, seed=state.seed,
                    spp=samples, max_depth=max_depth, pixel_chunk=pixel_chunk,
                    hit_fn=hit_fn, dtype=dtype,
                    sample_offset=state.num_samples)
    n0, n1 = state.num_samples, state.num_samples + samples
    accum = state.accum + (img - state.accum) * (samples / n1)
    return ProgressiveState(accum=accum, num_samples=n1, seed=state.seed)
