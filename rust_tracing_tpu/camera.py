"""Thin-lens camera with antialiasing jitter, defocus blur and shutter time.

TPU-native re-design of the reference camera (src/camera.rs:54-137): all
viewport precomputation happens host-side at construction; ``get_rays`` is a
fully vectorized primary-ray generator over a flat batch of pixel ids, jit- and
vmap-safe, drawing every random number from a counter-based key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderSettings, degrees_to_radians
from .ops import hashrng


@dataclasses.dataclass(frozen=True)
class Camera:
    """Precomputed camera basis (reference: src/camera.rs:54-110)."""

    image_width: int
    image_height: int
    samples_per_pixel: int
    max_depth: int
    background: Tuple[float, float, float]
    center: np.ndarray
    pixel00_loc: np.ndarray
    pixel_delta_u: np.ndarray
    pixel_delta_v: np.ndarray
    defocus_angle: float
    defocus_disk_u: np.ndarray
    defocus_disk_v: np.ndarray

    @staticmethod
    def create(settings: RenderSettings) -> "Camera":
        s = settings
        image_height = s.image_height

        look_from = np.asarray(s.look_from, dtype=np.float64)
        look_at = np.asarray(s.look_at, dtype=np.float64)
        vup = np.asarray(s.vup, dtype=np.float64)

        theta = degrees_to_radians(s.vfov)
        h = math.tan(theta / 2.0)
        viewport_height = 2.0 * h * s.focus_dist
        # reference: src/camera.rs:75 — width from the *integer* height ratio.
        viewport_width = viewport_height * (s.image_width / image_height)

        w = look_from - look_at
        w = w / np.linalg.norm(w)
        u = np.cross(vup, w)
        u = u / np.linalg.norm(u)
        v = np.cross(w, u)

        viewport_u = viewport_width * u
        viewport_v = -viewport_height * v

        center = look_from
        pixel_delta_u = viewport_u / s.image_width
        pixel_delta_v = viewport_v / image_height

        viewport_upper_left = (
            center - s.focus_dist * w - viewport_u * 0.5 - viewport_v * 0.5
        )
        pixel00_loc = viewport_upper_left + 0.5 * (pixel_delta_u + pixel_delta_v)

        defocus_radius = s.focus_dist * math.tan(
            degrees_to_radians(s.defocus_angle / 2.0)
        )
        return Camera(
            image_width=s.image_width,
            image_height=image_height,
            samples_per_pixel=s.samples_per_pixel,
            max_depth=s.max_depth,
            background=tuple(s.background),
            center=center,
            pixel00_loc=pixel00_loc,
            pixel_delta_u=pixel_delta_u,
            pixel_delta_v=pixel_delta_v,
            defocus_angle=float(s.defocus_angle),
            defocus_disk_u=u * defocus_radius,
            defocus_disk_v=v * defocus_radius,
        )

    def constants(self, dtype=jnp.float32) -> "CameraConstants":
        return CameraConstants(
            center=jnp.asarray(self.center, dtype),
            pixel00_loc=jnp.asarray(self.pixel00_loc, dtype),
            pixel_delta_u=jnp.asarray(self.pixel_delta_u, dtype),
            pixel_delta_v=jnp.asarray(self.pixel_delta_v, dtype),
            defocus_disk_u=jnp.asarray(self.defocus_disk_u, dtype),
            defocus_disk_v=jnp.asarray(self.defocus_disk_v, dtype),
            defocus_angle=self.defocus_angle,
            image_width=self.image_width,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraConstants:
    """Device-side camera constants, a pytree usable inside jit."""

    center: jnp.ndarray
    pixel00_loc: jnp.ndarray
    pixel_delta_u: jnp.ndarray
    pixel_delta_v: jnp.ndarray
    defocus_disk_u: jnp.ndarray
    defocus_disk_v: jnp.ndarray
    defocus_angle: float = dataclasses.field(metadata=dict(static=True))
    image_width: int = dataclasses.field(metadata=dict(static=True))


def get_rays(cam: CameraConstants, seed, pixel_ids, sample):
    """Generate one primary ray per entry of ``pixel_ids`` (flat ``j*w + i``).

    Faithful to reference src/camera.rs:112-137:
    - jitter uniformly in the pixel square (:133-137),
    - origin on the defocus disk iff ``defocus_angle > 0`` (:117-121),
    - a *fresh uniform shutter time per ray, always* (:123).

    All draws come from the counter-based RNG addressed by
    ``(seed, pixel_id, sample, site)`` (ops/hashrng.py) — the stream is a pure
    function of those indices, so renders are bitwise independent of pixel
    chunking and mesh shape, and identical to the Pallas megakernel's.

    Returns ``(origin[R,3], direction[R,3], time[R])``.
    """
    dtype = cam.center.dtype
    i = (pixel_ids % cam.image_width).astype(dtype)
    j = (pixel_ids // cam.image_width).astype(dtype)

    r = hashrng.CounterRng(seed, pixel_ids, sample)
    px = r.uniform(hashrng.SITE_PIXEL_JX).astype(dtype) - 0.5
    py = r.uniform(hashrng.SITE_PIXEL_JY).astype(dtype) - 0.5

    pixel_sample = (
        cam.pixel00_loc
        + (i + px)[..., None] * cam.pixel_delta_u
        + (j + py)[..., None] * cam.pixel_delta_v
    )

    if cam.defocus_angle <= 0.0:
        # + zeros_like ties the constant center to the batch operands so the
        # origin carries the same device-varying type under shard_map
        origin = cam.center + jnp.zeros_like(pixel_sample)
    else:
        dx, dy = r.in_unit_disk(hashrng.SITE_DEFOCUS_R, hashrng.SITE_DEFOCUS_TH)
        origin = (
            cam.center
            + dx.astype(dtype)[..., None] * cam.defocus_disk_u
            + dy.astype(dtype)[..., None] * cam.defocus_disk_v
        )

    direction = pixel_sample - origin
    time = r.uniform(hashrng.SITE_TIME).astype(dtype)
    return origin, direction, time
