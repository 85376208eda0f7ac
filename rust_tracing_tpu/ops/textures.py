"""Branchless texture evaluation over type-coded texture tables.

Reference trait ``Texture::value(u, v, p)`` (src/texture.rs:12-14) dispatched
dynamically per hit; here every texture *type* present in the scene is
evaluated vectorized and the per-ray result selected by type code. Static
``has_*`` flags on the compiled scene prune whole families at trace time so
e.g. Cornell never pays for Perlin octaves.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.scene import TEX_CHECKER, TEX_IMAGE, TEX_NOISE
from . import perlin as perlin_ops


def _leaf_value(scene, tid, u, v, p, turb=None):
    """Value of non-checker textures (solid/image/noise) for ids ``tid``."""
    val = scene.tex_rgb[tid]  # solid (texture.rs:16-36)
    ttype = scene.tex_type[tid]

    if scene.has_image:
        # Nearest-neighbor, u clamp, v flip, gamma-decoded at load
        # (texture.rs:83-93; decode in models/scene.py image_texture).
        h, w = scene.image.shape[0], scene.image.shape[1]
        uc = jnp.clip(u, 0.0, 1.0)
        vc = 1.0 - jnp.clip(v, 0.0, 1.0)
        i = (uc * (w - 1)).astype(jnp.int32)
        j = (vc * (h - 1)).astype(jnp.int32)
        img_val = scene.image[j, i]
        val = jnp.where((ttype == TEX_IMAGE)[..., None], img_val, val)

    if scene.has_noise:
        # Marble: sin(scale*z + 10*turbulence(p,7))*0.5+0.5 (texture.rs:107-111).
        scale = scene.tex_noise_scale[tid]
        marble = jnp.sin(scale * p[..., 2] + 10.0 * turb) * 0.5 + 0.5
        val = jnp.where((ttype == TEX_NOISE)[..., None], marble[..., None], val)

    return val


def texture_value(scene, tid, u, v, p):
    """Evaluate texture ids ``tid`` at (u, v, p) -> ``[..., 3]``."""
    turb = None
    if scene.has_noise:
        turb = perlin_ops.turbulence(
            scene.perlin_ranvec, scene.perlin_px, scene.perlin_py, scene.perlin_pz,
            p, depth=7,
        )

    val = _leaf_value(scene, tid, u, v, p, turb)

    if scene.has_checker:
        # 3-D world-space parity of floor(p / scale) (texture.rs:59-70).
        f = jnp.floor(scene.tex_inv_scale[tid][..., None] * p).astype(jnp.int32)
        is_even = (f[..., 0] + f[..., 1] + f[..., 2]) % 2 == 0
        even_val = _leaf_value(scene, scene.tex_even[tid], u, v, p, turb)
        odd_val = _leaf_value(scene, scene.tex_odd[tid], u, v, p, turb)
        checker_val = jnp.where(is_even[..., None], even_val, odd_val)
        val = jnp.where((scene.tex_type[tid] == TEX_CHECKER)[..., None], checker_val, val)

    return val
