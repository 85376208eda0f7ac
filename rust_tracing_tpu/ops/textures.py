"""Branchless texture evaluation over type-coded texture tables.

Reference trait ``Texture::value(u, v, p)`` (src/texture.rs:12-14) dispatched
dynamically per hit; here every texture *type* present in the scene is
evaluated vectorized and the per-ray result selected by type code. Static
``has_*`` flags on the compiled scene prune whole families at trace time so
e.g. Cornell never pays for Perlin octaves.

The implementation is COMPONENT FORM (``texture_value_c``: dense ``(R,)``
channel lanes — TPU XLA pads a trailing 3-axis to 128 vector lanes, a 42x
memory/bandwidth waste, so the hot wavefront paths never materialize
``(R, 3)``); ``texture_value`` is the thin array wrapper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import TEX_CHECKER, TEX_IMAGE, TEX_NOISE
from . import perlin as perlin_ops
from .tgather import tgather


def _leaf_value_c(scene, tid, u, v, px, py, pz, turb=None):
    """(r, g, b) of non-checker textures (solid/image/noise) for ids ``tid``."""
    # solid (texture.rs:16-36): per-channel column gathers
    r = tgather(scene.tex_rgb[:, 0], tid)
    g = tgather(scene.tex_rgb[:, 1], tid)
    b = tgather(scene.tex_rgb[:, 2], tid)
    ttype = tgather(scene.tex_type, tid)

    if scene.has_image:
        # Nearest-neighbor, u clamp, v flip, gamma-decoded at load
        # (texture.rs:83-93; decode in models/scene.py image_texture).
        h, w = scene.image.shape[0], scene.image.shape[1]
        uc = jnp.clip(u, 0.0, 1.0)
        vc = 1.0 - jnp.clip(v, 0.0, 1.0)
        i = (uc * (w - 1)).astype(jnp.int32)
        j = (vc * (h - 1)).astype(jnp.int32)
        # ONE row gather of the (H*W, 3) image, isolated by optimization
        # barriers: the table is far past the lane-gather cap, and fusing
        # this gather risks XLA's serial scalar-core lowering
        # (ops/lanegather.py); isolated row gathers take the fast path.
        lin = jax.lax.optimization_barrier(j * w + i)
        texel = scene.image.reshape(-1, 3)[lin]
        tr, tg, tb = (jax.lax.optimization_barrier(texel[:, c])
                      for c in range(3))
        is_img = ttype == TEX_IMAGE
        r = jnp.where(is_img, tr, r)
        g = jnp.where(is_img, tg, g)
        b = jnp.where(is_img, tb, b)

    if scene.has_noise:
        # Marble: sin(scale*z + 10*turbulence(p,7))*0.5+0.5 (texture.rs:107-111).
        scale = tgather(scene.tex_noise_scale, tid)
        marble = jnp.sin(scale * pz + 10.0 * turb) * 0.5 + 0.5
        is_noise = ttype == TEX_NOISE
        r = jnp.where(is_noise, marble, r)
        g = jnp.where(is_noise, marble, g)
        b = jnp.where(is_noise, marble, b)

    return r, g, b


def texture_value_c(scene, tid, u, v, px, py, pz):
    """Component-form texture evaluation -> ``(r, g, b)`` dense lanes."""
    turb = None
    if scene.has_noise:
        # fused-kernel turbulence on TPU (one dispatch instead of ~210 lane
        # gathers), bitwise equal to perlin.turbulence_c; XLA elsewhere
        from . import perlin_tpu

        turb = perlin_tpu.turbulence(
            jnp.asarray(scene.perlin_ranvec, px.dtype), scene.perlin_px,
            scene.perlin_py, scene.perlin_pz, px, py, pz, depth=7)

    r, g, b = _leaf_value_c(scene, tid, u, v, px, py, pz, turb)

    if scene.has_checker:
        # 3-D world-space parity of floor(p / scale) (texture.rs:59-70).
        inv = tgather(scene.tex_inv_scale, tid)
        fsum = (jnp.floor(inv * px).astype(jnp.int32)
                + jnp.floor(inv * py).astype(jnp.int32)
                + jnp.floor(inv * pz).astype(jnp.int32))
        is_even = fsum % 2 == 0
        er, eg, eb = _leaf_value_c(scene, tgather(scene.tex_even, tid), u, v,
                                   px, py, pz, turb)
        orr, og, ob = _leaf_value_c(scene, tgather(scene.tex_odd, tid), u, v,
                                    px, py, pz, turb)
        is_chk = tgather(scene.tex_type, tid) == TEX_CHECKER
        r = jnp.where(is_chk, jnp.where(is_even, er, orr), r)
        g = jnp.where(is_chk, jnp.where(is_even, eg, og), g)
        b = jnp.where(is_chk, jnp.where(is_even, eb, ob), b)

    return r, g, b


def texture_value(scene, tid, u, v, p):
    """Evaluate texture ids ``tid`` at (u, v, p) -> ``[..., 3]`` (array
    wrapper over the component core)."""
    r, g, b = texture_value_c(scene, tid, u, v,
                              p[..., 0], p[..., 1], p[..., 2])
    return jnp.stack([r, g, b], axis=-1)
