"""Device mesh construction for distributed rendering.

The reference's only parallelism is rayon's in-process work-stealing pool over
pixels (src/renderer.rs:26-49). The TPU-native decomposition (SURVEY.md §5.8):

- ``rays``  axis: data parallelism over pixel tiles across chips (the rayon
  analog) — each chip owns a contiguous shard of the flat pixel space;
- ``sample`` axis: samples-per-pixel parallelism — spp chunks spread across
  chips, reduced with a psum (the device-side analog of the spp loop,
  renderer.rs:35-41);
- scene arrays are replicated on every chip (the Arc-shared immutable world);
- parameter gradients are psum'd over both axes, riding ICI.

Multi-host entry: call ``jax.distributed.initialize()`` before building the
mesh (fail-fast rendezvous, SURVEY.md §5.3) — then ``jax.devices()`` spans
the pod slice and the same code shards over it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS_AXIS = "rays"
SAMPLE_AXIS = "sample"


def make_mesh(devices: Optional[Sequence] = None,
              sample_parallelism: int = 1) -> Mesh:
    """Build a (rays, sample) mesh over the available devices.

    ``sample_parallelism`` chips cooperate on the spp axis per pixel shard;
    the rest shard pixels. 1 device -> trivial 1x1 mesh (same code path).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sp = max(1, sample_parallelism)
    if n % sp != 0:
        raise ValueError(f"{n} devices not divisible by sample_parallelism={sp}")
    arr = np.asarray(devices).reshape(n // sp, sp)
    return Mesh(arr, (RAYS_AXIS, SAMPLE_AXIS))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Scene tables: fully replicated on every chip."""
    return NamedSharding(mesh, P())


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Flat pixel axis: sharded over the rays axis, replicated over sample."""
    return NamedSharding(mesh, P(RAYS_AXIS))


def pad_pixels(n_pixels: int, mesh: Mesh, multiple: int = 8) -> int:
    """Pad the flat pixel count so it tiles the rays axis evenly."""
    shard = mesh.shape[RAYS_AXIS] * multiple
    return ((n_pixels + shard - 1) // shard) * shard
