"""Counter-based random sampling for the wavefront integrator.

The reference draws from a thread-local OS-seeded PRNG with rejection loops
(reference: src/vec3.rs:42-88). Rejection loops are hostile to XLA (dynamic
trip counts), so every sampler here is closed-form and produces the *same
distribution* (documented per function). Keys are jax.random threefry keys,
split/folded per (pixel, sample, bounce) by the caller, which makes every ray
stream independent and the whole render deterministic under a fixed seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform(key, shape, dtype=jnp.float32, minval=0.0, maxval=1.0):
    """U[minval, maxval) — reference's ``rand::random::<FP>()``."""
    return jax.random.uniform(key, shape, dtype=dtype, minval=minval, maxval=maxval)


def random_unit_vector(key, shape, dtype=jnp.float32):
    """Uniform direction on the unit sphere, shape ``shape + (3,)``.

    Reference (src/vec3.rs:63-66) rejects points outside the unit ball then
    normalizes — the result is exactly uniform on S^2. Normalized Gaussian
    triples have the same law, with no rejection loop.
    """
    v = jax.random.normal(key, shape + (3,), dtype=dtype)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Guard the measure-zero all-zeros draw.
    return v / jnp.maximum(norm, jnp.asarray(1e-12, dtype))


def random_in_unit_sphere(key, shape, dtype=jnp.float32):
    """Uniform point in the unit ball, shape ``shape + (3,)``.

    Reference (src/vec3.rs:54-61) rejection-samples the cube. Equivalent
    closed form: uniform direction scaled by U^(1/3).
    """
    kd, kr = jax.random.split(key)
    d = random_unit_vector(kd, shape, dtype)
    r = jax.random.uniform(kr, shape + (1,), dtype=dtype) ** (1.0 / 3.0)
    return d * r


def random_in_unit_disk(key, shape, dtype=jnp.float32):
    """Uniform point in the unit disk (z=0), shape ``shape + (3,)``.

    Reference (src/vec3.rs:77-88) rejection-samples the square. Equivalent
    closed form: polar with r = sqrt(U).
    """
    ku, kv = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(ku, shape, dtype=dtype))
    theta = jax.random.uniform(kv, shape, dtype=dtype, maxval=2.0 * jnp.pi)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1)


def random_on_hemisphere(key, normal, dtype=jnp.float32):
    """Uniform direction on the hemisphere around ``normal`` (reference:
    src/vec3.rs:67-74). Kept for API parity; the integrator itself uses
    cosine-ish Lambertian scattering like the reference materials."""
    d = random_unit_vector(key, normal.shape[:-1], dtype)
    flip = jnp.sum(d * normal, axis=-1, keepdims=True) > 0.0
    return jnp.where(flip, d, -d)
