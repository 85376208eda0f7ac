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

# Block-sparse expensive-texture evaluation. XLA TPU lowers the big-table
# image row gather to a SERIAL scalar loop whenever it sits fused inside the
# bounce graph (measured: 73 ms of a 98 ms bounce at 3.84M lanes on
# final_scene, where <1% of lanes touch the earth texture), and the Perlin
# kernel runs full width for every noise scene. When the needing lanes
# cluster into few 512-lane BLOCKS (they do: the wavefront sorts lanes by
# ray coherence, and bounce-0/deferred lanes arrive in pixel order), we
# gather just those blocks, evaluate, and row-scatter the results back.
# Every serial op is then per-BLOCK (thousands) instead of per-LANE
# (millions): the block-id nonzero runs its bincount over R/512 entries and
# the write-back is a row scatter of cap_blocks rows. Values are exactly the
# lane values the dense path computes — bitwise-safe. A lax.cond falls back
# to the dense path whenever more blocks qualify than the static cap.
SPARSE_BLOCK = 512
SPARSE_BLOCK_FRACTION = 16  # cap_blocks = nblk // FRACTION
SPARSE_MIN_R = 1 << 16


def sparse_blocked(need, inputs, fn, n_out: int, out_dtype):
    """Evaluate lane-wise ``fn(*inputs)`` only on 512-lane blocks where any
    ``need`` lane is set; other lanes return 0. Falls back to dense full
    width (runtime lax.cond) when the qualifying blocks exceed the cap."""
    R = need.shape[0]
    if need.ndim != 1 or R < SPARSE_MIN_R or R % SPARSE_BLOCK:
        out = fn(*inputs)
        return (out,) if n_out == 1 else out

    nblk = R // SPARSE_BLOCK
    capb = max(64, nblk // SPARSE_BLOCK_FRACTION)
    blk_any = need.reshape(nblk, SPARSE_BLOCK).any(axis=1)

    def sparse(inputs):
        (bpos,) = jnp.nonzero(blk_any, size=capb, fill_value=nblk)
        safe = jnp.minimum(bpos, nblk - 1)
        sub = tuple(a.reshape(nblk, SPARSE_BLOCK)[safe].reshape(-1)
                    for a in inputs)
        vals = fn(*sub)
        if n_out == 1:
            vals = (vals,)
        outs = []
        for v in vals:
            buf = jnp.zeros((nblk, SPARSE_BLOCK), out_dtype)
            outs.append(buf.at[bpos].set(
                v.reshape(capb, SPARSE_BLOCK), mode="drop").reshape(R))
        return tuple(outs)

    def dense(inputs):
        out = fn(*inputs)
        return (out,) if n_out == 1 else tuple(out)

    nb = jnp.sum(blk_any.astype(jnp.int32))
    return jax.lax.cond(nb <= capb, sparse, dense, tuple(inputs))


def _image_texels(image, lin, is_img):
    """(r, g, b) texels of ``image.reshape(-1, 3)`` at rows ``lin`` for lanes
    where ``is_img``; other lanes return 0 (selected away by the caller)."""
    flat = image.reshape(-1, 3)

    def dense(lin):
        lin = jax.lax.optimization_barrier(lin)
        texel = flat[lin]
        tr, tg, tb = (jax.lax.optimization_barrier(texel[:, c])
                      for c in range(3))
        return tr, tg, tb

    return sparse_blocked(is_img, (lin,), dense, 3, flat.dtype)


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
        is_img = ttype == TEX_IMAGE
        tr, tg, tb = _image_texels(scene.image, j * w + i, is_img)
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


def _needs_noise(scene, tid):
    """Lanes whose texture chain can reach the noise marble: the texture
    itself, or (checker) either child."""
    ttype = tgather(scene.tex_type, tid)
    need = ttype == TEX_NOISE
    if scene.has_checker:
        is_chk = ttype == TEX_CHECKER
        for child in (scene.tex_even, scene.tex_odd):
            ct = tgather(scene.tex_type, tgather(child, tid))
            need = need | (is_chk & (ct == TEX_NOISE))
    return need


def texture_value_c(scene, tid, u, v, px, py, pz):
    """Component-form texture evaluation -> ``(r, g, b)`` dense lanes."""
    turb = None
    if scene.has_noise:
        # fused-kernel turbulence on TPU (one dispatch instead of ~210 lane
        # gathers), bitwise equal to perlin.turbulence_c; XLA elsewhere
        from . import perlin_tpu

        def turb_at(qx, qy, qz):
            return perlin_tpu.turbulence(
                jnp.asarray(scene.perlin_ranvec, px.dtype), scene.perlin_px,
                scene.perlin_py, scene.perlin_pz, qx, qy, qz, depth=7)

        # evaluate the 7-octave marble only on blocks whose texture chain
        # reaches the noise texture (block-sparse; dense fallback inside)
        need = _needs_noise(scene, tid)
        (turb,) = sparse_blocked(need, (px, py, pz), turb_at, 1, px.dtype)

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
