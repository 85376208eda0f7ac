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

POINT_COUNT = 256


def make_tables(seed: int = 0):
    """Host-side table generation (reference: src/perlin.rs:14-25,66-79)."""
    rng = np.random.default_rng(seed)
    ranvec = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3))
    perms = [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    return ranvec, perms[0], perms[1], perms[2]


def noise(ranvec, perm_x, perm_y, perm_z, p):
    """Perlin noise at points ``p[..., 3]`` -> ``[...]`` in roughly [-1, 1].

    reference: src/perlin.rs:27-49 + trilinear_interpolation :81-100.
    """
    pf = jnp.floor(p)
    ijk = pf.astype(jnp.int32)
    uvw = p - pf
    # Hermite smoothing u*u*(3-2u) (perlin.rs:82-84).
    s = uvw * uvw * (3.0 - 2.0 * uvw)

    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    for di in (0, 1):
        hx = perm_x[(ijk[..., 0] + di) & 255]
        wx = jnp.where(di == 1, s[..., 0], 1.0 - s[..., 0])
        for dj in (0, 1):
            hy = perm_y[(ijk[..., 1] + dj) & 255]
            wy = jnp.where(dj == 1, s[..., 1], 1.0 - s[..., 1])
            for dk in (0, 1):
                hz = perm_z[(ijk[..., 2] + dk) & 255]
                wz = jnp.where(dk == 1, s[..., 2], 1.0 - s[..., 2])
                g = ranvec[hx ^ hy ^ hz]  # perlin.rs:41-44
                weight = jnp.stack(
                    [uvw[..., 0] - di, uvw[..., 1] - dj, uvw[..., 2] - dk],
                    axis=-1,
                )
                acc = acc + wx * wy * wz * jnp.sum(g * weight, axis=-1)
    return acc


def turbulence(ranvec, perm_x, perm_y, perm_z, p, depth: int = 7):
    """reference: src/perlin.rs:52-64 (absolute value of the octave sum)."""
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        acc = acc + weight * noise(ranvec, perm_x, perm_y, perm_z, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(acc)
