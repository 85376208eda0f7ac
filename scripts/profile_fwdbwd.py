"""Dissect the fwd+bwd (replay) pipeline cost on the real chip.

Breaks loss_and_grad into its stages and times each separately:
  1. recorder (Pallas record_paths)
  2. replay forward only (radiance_mean_replay_rays)
  3. replay forward+backward (value_and_grad)
plus variants: remat policy on/off, different sample chunks.

Usage: python scripts/profile_fwdbwd.py [--spp N] [--width W] [--trace DIR]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _pull(out):
    """Force a HOST TRANSFER: on the axon tunnel, jax.block_until_ready
    returns before the device work finishes — only a transfer really waits."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])
    return out


def timed(fn, *args, n=3, **kw):
    _pull(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = _pull(fn(*args, **kw))
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--width", type=int, default=600)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu import grad as grad_mod
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.ops import megakernel as mk

    b, settings = builders.cornell_box()
    settings = dataclasses.replace(settings, image_width=args.width,
                                   samples_per_pixel=args.spp,
                                   max_depth=args.depth)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float32)
    n_pix = camera.image_width * camera.image_height
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    seed = jnp.uint32(1)
    spp, depth = args.spp, args.depth

    # 1. recorder
    t_rec, recs = timed(
        lambda: jax.block_until_ready(
            grad_mod.get_records(scene, camera, 1, spp, depth)))
    recs = grad_mod.get_records(scene, camera, 1, spp, depth)
    print(f"records shape {recs.shape} dtype {recs.dtype}")
    n_rays = float(jnp.sum(recs != 0) + jnp.sum(recs == 0) * 0)  # not rays
    print(f"recorder: {t_rec*1e3:.1f} ms")

    # 2. replay forward only
    fwd = jax.jit(functools.partial(grad_mod.radiance_mean_replay_rays,
                                    spp=spp, max_depth=depth))
    t_fwd, (img, nrays) = timed(fwd, scene, cam, pixel_ids, seed, recs)
    nrays = float(nrays)
    print(f"replay fwd:  {t_fwd*1e3:8.1f} ms  {nrays/t_fwd/1e6:8.1f} Mrays/s "
          f"({nrays/1e6:.1f}M rays)")

    # 3. replay fwd+bwd
    def loss(scene_):
        img, nr = grad_mod.radiance_mean_replay_rays(
            scene_, cam, pixel_ids, seed, recs, spp=spp, max_depth=depth)
        return jnp.mean(img), nr

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    is_diff = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]

    @jax.jit
    def vag(diff, frozen):
        def f(diff):
            it_d, it_f = iter(diff), iter(frozen)
            merged = [next(it_d) if d else next(it_f) for d in is_diff]
            return loss(jax.tree_util.tree_unflatten(treedef, merged))
        (l, nr), g = jax.value_and_grad(f, has_aux=True)(
            [l for l, d in zip(leaves, is_diff) if d])
        return l, nr, g

    diff = [l for l, d in zip(leaves, is_diff) if d]
    frozen = [l for l, d in zip(leaves, is_diff) if not d]
    t_vag, (l, nr, g) = timed(vag, diff, frozen)
    print(f"replay f+b:  {t_vag*1e3:8.1f} ms  {nrays/t_vag/1e6:8.1f} Mrays/s")
    print(f"end-to-end (rec + f+b): "
          f"{nrays/(t_rec+t_vag)/1e6:8.1f} Mrays/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(2):
                jax.block_until_ready(vag(diff, frozen))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
