"""Vector math on ``[..., 3]`` arrays.

The reference's only linear-algebra type is ``Vec3`` (src/vec3.rs:8-13).
TPU-natively there is no vector *class*: points/directions/colors are plain
``[..., 3]`` jnp arrays and these helpers are thin, fusable elementwise ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    """3-vector dot product; the last axis MUST be exactly 3.

    reference: src/vec3.rs:104-107 (returns ``[...]``).

    Written as explicit left-associated component adds (not a reduce) so the
    [..., 3] array path and the component-form path (ops/replay.py, dense
    (R,) lanes) produce bitwise-identical sums — the replay-equals-direct
    gradient tests compare exactly. Deliberately NOT a generic reduction:
    extra trailing components would be silently dropped, so assert."""
    assert a.shape[-1] == 3 and b.shape[-1] == 3, (
        f"dot expects [..., 3] vectors, got {a.shape} . {b.shape}")
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def length_squared(v):
    return dot(v, v)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v, eps=0.0):
    """reference: src/vec3.rs:133-135. ``eps`` guards zero vectors when >0."""
    n = length(v)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def cross(a, b):
    """reference: src/vec3.rs:137-143."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def reflect(v, n):
    """Mirror ``v`` about normal ``n`` — reference: src/vec3.rs:91-93."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv, n, etai_over_etat):
    """Snell refraction of unit vector ``uv`` — reference: src/vec3.rs:96-101.

    ``etai_over_etat`` broadcasts as ``[...]`` or scalar.
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    eta = jnp.asarray(etai_over_etat)
    if eta.ndim:  # per-ray [...] -> broadcast over the component axis
        eta = eta[..., None]
    r_out_perp = eta * (uv + cos_theta[..., None] * n)
    # grad-safe sqrt: guard the TIR boundary where 1 - |perp|^2 touches 0
    s = jnp.abs(1.0 - length_squared(r_out_perp))
    ok = s > 1e-20
    par = -jnp.sqrt(jnp.where(ok, s, 1.0)) * ok
    return r_out_perp + par[..., None] * n


def ray_at(origin, direction, t):
    """reference: src/ray.rs:30-32."""
    return origin + t[..., None] * direction
