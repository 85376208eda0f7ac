"""Shared counter-based RNG for the XLA wavefront path AND the Pallas
megakernel.

Every random draw in a render is addressed by the tuple
``(seed, pixel_id, sample, bounce, site)`` and produced by a murmur3-style
integer finalizer — a pure function of the address. Consequences:

- renders are **bitwise independent of batching**: pixel chunk size, mesh
  shape, and host count cannot change any pixel's sample stream (the
  exact-equality distributed tests rely on this);
- the XLA path and the fused Pallas megakernel draw **identical streams** for
  the same address, so their images agree to float arithmetic (transcendental
  lowering) rather than to Monte-Carlo noise;
- a draw costs ~10 VPU integer ops — no threefry key chains in the hot loop.

The reference's RNG surface is the thread-local OS-seeded generator
(src/vec3.rs:42-88, camera.rs:123); it is nondeterministic run-to-run, so any
fixed counter-based scheme is an equally faithful sampler of the same
distributions (SURVEY.md §7 "RNG parity").

Site constants: each *call site* in the per-bounce program uses a fixed site
id below, NOT a sequential counter — so optional draws (defocus off, media
masked out) never shift later sites between paths or scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI = 6.283185307179586

# Weights folding each address component into the base counter.
_W = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)
_SITE_MULT = 0x01000193  # FNV prime, spreads site ids

# ---- site ids (shared contract between ops/integrator.py, camera.py and
# ops/megakernel.py; keep in sync or streams diverge) ------------------------
SITE_PIXEL_JX = 1
SITE_PIXEL_JY = 2
SITE_DEFOCUS_R = 3
SITE_DEFOCUS_TH = 4
SITE_TIME = 5
# per-bounce sites
SITE_SCATTER_Z = 10      # unit vector z
SITE_SCATTER_PHI = 11    # unit vector phi
SITE_FUZZ_Z = 12         # metal fuzz ball: unit vector z
SITE_FUZZ_PHI = 13       # metal fuzz ball: unit vector phi
SITE_FUZZ_R = 14         # metal fuzz ball: radius U^(1/3)
SITE_SCHLICK = 15        # dielectric reflect/refract coin
SITE_MEDIUM = 64         # medium i draws at SITE_MEDIUM + i


def _mix(h):
    """murmur3 fmix32 finalizer (public constants)."""
    h = jax.lax.bitwise_xor(h, jax.lax.shift_right_logical(h, jnp.uint32(16)))
    h = h * jnp.uint32(0x85EBCA6B)
    h = jax.lax.bitwise_xor(h, jax.lax.shift_right_logical(h, jnp.uint32(13)))
    h = h * jnp.uint32(0xC2B2AE35)
    h = jax.lax.bitwise_xor(h, jax.lax.shift_right_logical(h, jnp.uint32(16)))
    return h


def _bits_to_unit_float(h):
    """uint32 -> f32 in [0, 1) via mantissa stuffing (exact, branch-free)."""
    mant = jax.lax.bitwise_or(
        jax.lax.shift_right_logical(h, jnp.uint32(9)),
        jnp.uint32(0x3F800000),
    )
    return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0


class CounterRng:
    """RNG scoped to an address prefix (e.g. ``(seed, pixel, sample, bounce)``).

    ``indices`` are scalars or arrays (broadcast together); draws return f32
    arrays of the broadcast shape. Use ``uniform(site)`` with an explicit site
    id for single draws; the composite samplers consume fixed site pairs.
    """

    def __init__(self, *indices):
        base = jnp.uint32(0)
        for i, ix in enumerate(indices):
            base = base + jnp.asarray(ix).astype(jnp.uint32) * jnp.uint32(_W[i])
        self.base = base

    def uniform(self, site: int):
        h = _mix(self.base + jnp.uint32((site * _SITE_MULT) & 0xFFFFFFFF))
        return _bits_to_unit_float(h)

    def unit_vector(self, site_z: int, site_phi: int):
        """Uniform direction on S^2 (component tuple, closed form)."""
        z = 1.0 - 2.0 * self.uniform(site_z)
        phi = _TWO_PI * self.uniform(site_phi)
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        return s * jnp.cos(phi), s * jnp.sin(phi), z

    def in_unit_sphere(self, site_z: int, site_phi: int, site_r: int):
        """Uniform point in the unit ball: direction x U^(1/3).

        U^(1/3) via exp/log (no cbrt in the Pallas TPU lowering)."""
        ux, uy, uz = self.unit_vector(site_z, site_phi)
        u = jnp.maximum(self.uniform(site_r), 1e-30)
        r = jnp.exp(jnp.log(u) * (1.0 / 3.0))
        return r * ux, r * uy, r * uz

    def in_unit_disk(self, site_r: int, site_th: int):
        """Uniform point in the unit disk: polar with r = sqrt(U)."""
        r = jnp.sqrt(self.uniform(site_r))
        th = _TWO_PI * self.uniform(site_th)
        return r * jnp.cos(th), r * jnp.sin(th)
