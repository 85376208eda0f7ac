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


def _auto_chunk(scene, target_bytes: int = 192 * 1024 * 1024) -> int:
    """Pick a pixel-chunk size so the (rays x primitives) broadcast fits."""
    prims = max(scene.num_spheres, scene.quad_mat.shape[0], 1)
    per_ray = prims * 4 * 8  # a few (R,P) f32 temporaries
    chunk = max(1024, min(1 << 16, target_bytes // per_ray))
    # round down to a multiple of 1024 for clean tiling
    return max(1024, (chunk // 1024) * 1024)


@functools.partial(jax.jit, static_argnames=("spp", "max_depth", "hit_fn"))
def render_chunk(scene, cam: CameraConstants, pixel_ids, key, spp: int,
                 max_depth: int, hit_fn=None):
    """Sum of ``spp`` radiance samples for each pixel id. Returns
    (radiance_sum (C,3), rays_traced scalar)."""
    C = pixel_ids.shape[0]
    dtype = cam.center.dtype

    def body(s, carry):
        acc, nrays = carry
        k = jax.random.fold_in(key, s)
        k_cam, k_trace = jax.random.split(k)
        o, d, t = get_rays(cam, k_cam, pixel_ids)
        rad, nb = integrator.trace(scene, o, d, t, k_trace, max_depth,
                                   closest_hit_fn=hit_fn)
        # float32 counter: exact enough for rays/s and safe from int32 overflow
        return acc + rad, nrays + jnp.sum(nb).astype(jnp.float32)

    acc0 = jnp.zeros((C, 3), dtype)
    acc, nrays = jax.lax.fori_loop(0, spp, body, (acc0, jnp.zeros((), jnp.float32)))
    return acc, nrays


@dataclasses.dataclass
class RenderStats:
    seconds: float = 0.0
    rays: int = 0

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds > 0 else 0.0


def render(scene, camera: Camera, seed: int = 0, spp: Optional[int] = None,
           max_depth: Optional[int] = None, pixel_chunk: Optional[int] = None,
           hit_fn=None, dtype=jnp.float32, progress=None,
           ) -> Tuple[np.ndarray, RenderStats]:
    """Offline render -> (image (H,W,3) linear float, stats).

    Equivalent of reference ``render()`` (src/renderer.rs:12-75) minus the PNG
    encode (see utils/image_io.py).
    """
    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    if hit_fn is None:
        from .ops.bvh_traverse import auto_closest_hit

        hit_fn = auto_closest_hit(scene)
    w, h = camera.image_width, camera.image_height
    cam = camera.constants(dtype)
    n_pixels = w * h
    chunk = pixel_chunk or _auto_chunk(scene)
    chunk = min(chunk, n_pixels)

    key = jax.random.PRNGKey(seed)
    out = np.zeros((n_pixels, 3), np.float64)
    stats = RenderStats()
    t0 = _time.perf_counter()

    for start in range(0, n_pixels, chunk):
        ids = np.arange(start, start + chunk, dtype=np.int32)
        ids = np.minimum(ids, n_pixels - 1)  # pad tail chunk with last pixel
        k = jax.random.fold_in(key, start)
        acc, nrays = render_chunk(scene, cam, jnp.asarray(ids), k, spp,
                                  max_depth, hit_fn)
        n_valid = min(chunk, n_pixels - start)
        out[start:start + n_valid] = np.asarray(acc)[:n_valid]
        stats.rays += int(nrays)
        if progress is not None:
            progress(start + n_valid, n_pixels)

    stats.seconds = _time.perf_counter() - t0
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
    (renderer.rs:114: avg += (new - avg) / n)."""
    # Offset the RNG stream so successive steps use fresh samples.
    img, _ = render(scene, camera,
                    seed=state.seed + 7919 * (state.num_samples + 1),
                    spp=samples, max_depth=max_depth, pixel_chunk=pixel_chunk,
                    hit_fn=hit_fn, dtype=dtype)
    n0, n1 = state.num_samples, state.num_samples + samples
    accum = state.accum + (img - state.accum) * (samples / n1)
    return ProgressiveState(accum=accum, num_samples=n1, seed=state.seed)
