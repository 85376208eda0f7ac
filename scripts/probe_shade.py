"""Isolate the wavefront shade cost on final_scene: hit_from_record_c
(prim-table gathers + winner math) vs scatter_and_emit_c (materials,
textures, RNG) at production lane counts.

Timing per CLAUDE.md: amortize REPS inside one jit (fori_loop with varied
seeds) and force a host transfer — block_until_ready does not block on the
axon tunnel.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=6)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--scene", type=int, default=8)
    args = ap.parse_args()

    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu.camera import get_rays
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.ops import hashrng, megakernel as mk, replay
    import dataclasses

    b, settings = builders.SCENES[args.scene]()
    settings = dataclasses.replace(settings, image_width=args.width,
                                   samples_per_pixel=args.spp)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float32)
    n_pix = camera.image_width * camera.image_height
    k = args.spp
    R = k * n_pix
    print(f"lanes: {R/1e6:.2f}M  prims: sph={scene.sph_radius.shape[0]} "
          f"quad={scene.quad_mat.shape[0]}")

    pix = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), k)
    samp = jnp.repeat(jnp.arange(k, dtype=jnp.int32), n_pix)
    seed0 = jnp.uint32(0)
    o, d, t = get_rays(cam, seed0, pix, samp)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    # one hit-kernel pass for real records
    n_rows = -(-R // mk.TILE) * mk.TILE // mk.LANES
    hit_fn, dev_args = mk.hit_kernel_call(scene, camera, n_rows)
    blk = lambda a: a.reshape(n_rows, mk.LANES)
    scal = jnp.stack([jnp.int32(0), jnp.int32(0), jnp.int32(0)])
    alive = jnp.ones(R, jnp.float32)
    (rec_blk,) = hit_fn(*dev_args, scal, blk(ox), blk(oy), blk(oz),
                        blk(dx), blk(dy), blk(dz), blk(t),
                        blk(pix), blk(samp), blk(alive))
    rec = rec_blk.reshape(-1)
    kinds = np.asarray(rec >> 24)
    print("record kinds:", dict(zip(*[list(x) for x in
                                      np.unique(kinds, return_counts=True)])))

    REPS = args.reps

    def timeit(name, fn, *fargs):
        out = fn(jnp.uint32(1), *fargs)
        np.asarray(out)
        t0 = time.perf_counter()
        out = fn(jnp.uint32(2), *fargs)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:24s} {dt*1e3:8.2f} ms/call "
              f"({R/dt/1e6:8.1f} Mlanes/s)", flush=True)
        return dt

    @jax.jit
    def run_hit(seed, pix, samp, ox, oy, oz, dx, dy, dz, t, rec):
        def body(i, acc):
            rngb = hashrng.CounterRng(seed + i, pix, samp, jnp.int32(0))
            h = replay.hit_from_record_c(scene, ox, oy, oz, dx, dy, dz,
                                         t, rngb, rec)
            return acc + h.t + h.px + h.u + h.mat_id.astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(ox))

    @jax.jit
    def run_hit_once(seed, pix, samp, ox, oy, oz, dx, dy, dz, t, rec):
        rngb = hashrng.CounterRng(seed, pix, samp, jnp.int32(0))
        return replay.hit_from_record_c(scene, ox, oy, oz, dx, dy, dz,
                                        t, rngb, rec)

    h0 = run_hit_once(jnp.uint32(0), pix, samp, ox, oy, oz, dx, dy, dz,
                      t, rec)

    @jax.jit
    def run_scatter(seed, pix, samp, dx, dy, dz, h0):
        from rust_tracing_tpu.ops.materials import scatter_and_emit_c
        def body(i, acc):
            rngb = hashrng.CounterRng(seed + i, pix, samp, jnp.int32(0))
            s = scatter_and_emit_c(scene, rngb, dx, dy, dz,
                                   h0.nx, h0.ny, h0.nz, h0.front_face,
                                   h0.mat_id, h0.u, h0.v,
                                   h0.px, h0.py, h0.pz)
            return acc + s.ar + s.er + s.dx
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(dx))

    @jax.jit
    def run_bounce(seed, pix, samp, ox, oy, oz, dx, dy, dz, t, rec):
        one = jnp.ones_like(ox)
        zero = jnp.zeros_like(ox)
        def body(i, acc):
            rngb = hashrng.CounterRng(seed + i, pix, samp, jnp.int32(0))
            out = replay.bounce_c(scene, rngb, rec, ox, oy, oz, dx, dy, dz,
                                  t, one, one, one, zero, zero, zero,
                                  t < jnp.inf)
            return acc + out[6] + out[9]
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(ox))

    timeit("hit_from_record_c", run_hit, pix, samp, ox, oy, oz,
           dx, dy, dz, t, rec)
    timeit("scatter_and_emit_c", run_scatter, pix, samp, dx, dy, dz, h0)
    timeit("bounce_c (full shade)", run_bounce, pix, samp, ox, oy, oz,
           dx, dy, dz, t, rec)


if __name__ == "__main__":
    main()
