"""Perlin gradient noise with XOR-hashed permutation tables.

Faithful to the reference (src/perlin.rs): 256 random gradient vectors in
[-1,1]^3 that are *not normalized* (perlin.rs:16-25), three independent
Fisher-Yates permutation tables (perlin.rs:74-79), lattice hash
``perm_x[i&255] ^ perm_y[j&255] ^ perm_z[k&255]`` (perlin.rs:41-44), Hermite
smoothed trilinear dot-product interpolation (perlin.rs:81-100), and
turbulence = |sum w^k noise(2^k p)| (perlin.rs:52-64).

Tables are generated host-side with a seeded numpy RNG and shipped to device
once; evaluation is fully vectorized (the 2x2x2 corner loop unrolls to 8
gathers fused by XLA).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .tgather import tgather

POINT_COUNT = 256


def make_tables(seed: int = 0):
    """Host-side table generation (reference: src/perlin.rs:14-25,66-79)."""
    rng = np.random.default_rng(seed)
    ranvec = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3))
    perms = [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    return ranvec, perms[0], perms[1], perms[2]


def noise_c(ranvec, perm_x, perm_y, perm_z, px, py, pz):
    """Component-form Perlin noise: dense ``(R,)`` lanes in and out (TPU XLA
    pads a trailing 3-axis to 128 lanes — 42x waste — so the hot paths stay
    in component form). reference: src/perlin.rs:27-49 + :81-100."""
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    ux, uy, uz = px - fx, py - fy, pz - fz
    # Hermite smoothing u*u*(3-2u) (perlin.rs:82-84).
    sx = ux * ux * (3.0 - 2.0 * ux)
    sy = uy * uy * (3.0 - 2.0 * uy)
    sz = uz * uz * (3.0 - 2.0 * uz)
    rx, ry, rz = ranvec[:, 0], ranvec[:, 1], ranvec[:, 2]

    # permutation lookups via tgather too: its TPU lowering is the Pallas
    # lane gather — XLA's own gather nondeterministically serializes here
    # (ops/lanegather.py), which made one octave cost 60 ms at 262k lanes
    hxs = [tgather(perm_x, (ix + di) & 255) for di in (0, 1)]
    hys = [tgather(perm_y, (iy + dj) & 255) for dj in (0, 1)]
    hzs = [tgather(perm_z, (iz + dk) & 255) for dk in (0, 1)]
    acc = jnp.zeros_like(px)
    for di in (0, 1):
        wx = jnp.where(di == 1, sx, 1.0 - sx)
        for dj in (0, 1):
            wy = jnp.where(dj == 1, sy, 1.0 - sy)
            for dk in (0, 1):
                wz = jnp.where(dk == 1, sz, 1.0 - sz)
                h = hxs[di] ^ hys[dj] ^ hzs[dk]  # perlin.rs:41-44
                dot = (tgather(rx, h) * (ux - di) + tgather(ry, h) * (uy - dj)
                       + tgather(rz, h) * (uz - dk))
                acc = acc + wx * wy * wz * dot
    return acc


def noise(ranvec, perm_x, perm_y, perm_z, p):
    """Perlin noise at points ``p[..., 3]`` -> ``[...]`` in roughly [-1, 1].

    Array wrapper over :func:`noise_c` (the component core).
    """
    return noise_c(jnp.asarray(ranvec, p.dtype), perm_x, perm_y, perm_z,
                   p[..., 0], p[..., 1], p[..., 2])


def turbulence_c(ranvec, perm_x, perm_y, perm_z, px, py, pz, depth: int = 7):
    """Component form of :func:`turbulence` (perlin.rs:52-64)."""
    acc = jnp.zeros_like(px)
    weight = 1.0
    s = 1.0
    for _ in range(depth):
        acc = acc + weight * noise_c(ranvec, perm_x, perm_y, perm_z,
                                     px * s, py * s, pz * s)
        weight *= 0.5
        s *= 2.0
    return jnp.abs(acc)


def turbulence(ranvec, perm_x, perm_y, perm_z, p, depth: int = 7):
    """reference: src/perlin.rs:52-64 (absolute value of the octave sum)."""
    return turbulence_c(jnp.asarray(ranvec, p.dtype), perm_x, perm_y, perm_z,
                        p[..., 0], p[..., 1], p[..., 2], depth)
