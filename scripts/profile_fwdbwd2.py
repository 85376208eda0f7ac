"""Bisect the replay backward cost: remat policy vs tgather transposes vs
chunk checkpointing. Calls trace_replay directly on one flattened wavefront.

Usage: python scripts/profile_fwdbwd2.py
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu import grad as grad_mod
    from rust_tracing_tpu.camera import get_rays
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.ops import replay as replay_mod

    SPP, DEPTH, WIDTH = 8, 8, 600
    b, settings = builders.cornell_box()
    settings = dataclasses.replace(settings, image_width=WIDTH,
                                   samples_per_pixel=SPP, max_depth=DEPTH)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float32)
    n_pix = camera.image_width * camera.image_height
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    seed = jnp.uint32(1)

    recs = grad_mod.get_records(scene, camera, 1, SPP, DEPTH)
    # flatten all spp into one wavefront: (R,) with R = SPP * n_pix
    pix = jnp.tile(pixel_ids, SPP)
    samp = jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), n_pix)
    o, d, t = get_rays(cam, seed, pix, samp)
    recs_flat = jnp.asarray(recs).reshape(DEPTH, SPP * n_pix)  # depth-major

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    is_diff = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
    diff = [l for l, dd in zip(leaves, is_diff) if dd]
    frozen = [l for l, dd in zip(leaves, is_diff) if not dd]

    def make_vag(remat):
        @jax.jit
        def vag(diff, frozen):
            def f(diff):
                it_d, it_f = iter(diff), iter(frozen)
                merged = [next(it_d) if dd else next(it_f) for dd in is_diff]
                sc = jax.tree_util.tree_unflatten(treedef, merged)
                rad, nb = replay_mod.trace_replay(
                    sc, o, d, t, (seed, pix, samp), recs_flat, DEPTH,
                    remat=remat)
                return jnp.mean(rad), jnp.sum(nb)
            (l, nr), g = jax.value_and_grad(f, has_aux=True)(diff)
            return l, nr, g
        return vag

    @jax.jit
    def fwd_only(diff, frozen):
        it_d, it_f = iter(diff), iter(frozen)
        merged = [next(it_d) if dd else next(it_f) for dd in is_diff]
        sc = jax.tree_util.tree_unflatten(treedef, merged)
        rad, nb = replay_mod.trace_replay(sc, o, d, t, (seed, pix, samp),
                                          recs_flat, DEPTH, remat=False)
        return jnp.mean(rad), jnp.sum(nb)

    t_f, (lv, nr) = timed(fwd_only, diff, frozen)
    nrays = float(nr)
    print(f"fwd only            : {t_f*1e3:8.1f} ms {nrays/t_f/1e6:8.1f} Mrays/s")

    for name, remat in (("f+b remat=True ", True), ("f+b remat=False", False)):
        try:
            t_g, _ = timed(make_vag(remat), diff, frozen)
            print(f"{name}    : {t_g*1e3:8.1f} ms {nrays/t_g/1e6:8.1f} Mrays/s")
        except Exception as e:
            print(f"{name}    : FAIL {type(e).__name__} {str(e)[:120]}")

    # tgather -> plain gather (monkeypatch all importers)
    import rust_tracing_tpu.ops.tgather as tg_mod
    import rust_tracing_tpu.ops.materials as mat_mod
    import rust_tracing_tpu.ops.textures as tex_mod
    import rust_tracing_tpu.ops.perlin as per_mod
    plain = lambda col, idx: col[idx]
    saved = tg_mod.tgather
    for m in (mat_mod, tex_mod, per_mod, replay_mod):
        m.tgather = plain
    try:
        for name, remat in (("f+b plain remat=T", True),
                            ("f+b plain remat=F", False)):
            try:
                t_g, _ = timed(make_vag(remat), diff, frozen)
                print(f"{name}  : {t_g*1e3:8.1f} ms {nrays/t_g/1e6:8.1f} Mrays/s")
            except Exception as e:
                print(f"{name}  : FAIL {type(e).__name__} {str(e)[:120]}")
    finally:
        for m in (mat_mod, tex_mod, per_mod, replay_mod):
            m.tgather = saved


if __name__ == "__main__":
    main()
