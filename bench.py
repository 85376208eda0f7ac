"""Headline benchmark: forward+backward rays/s/chip on the Cornell box —
the BASELINE.json north-star metric ("rays/s/chip forward+backward, Cornell
600x600 @ 200spp", reference workload main.rs:406-418 at the contract's spp).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the documented estimate of the Rust reference on
a modern multi-core CPU (BASELINE.md): the reference publishes no numbers and
cargo isn't available here, so 20 Mrays/s (16-core rayon path tracing of this
scene class) is used as the denominator and recorded in BASELINE.md.

What runs:
  1. forward+backward (HEADLINE): a TRUE full-frame 600x600 @ 200spp
     value_and_grad of the mean radiance w.r.t. all float scene parameters —
     the record/replay pipeline (Pallas recorder + O(rays) replay with the
     vectorized small-table transpose, chunked two-pass accumulation for the
     2.3 GB record volume) — with exact on-device ray counting. Reported
     rays/s uses the forward scene-query count (the backward replays the
     same paths), measured over the full loss_and_grad call INCLUDING
     recording.
  2. forward (aux): the production render path — the fused Pallas megakernel
     on TPU, XLA wavefront elsewhere — same frame, exact ray counting.
  3. parity gate (aux): megakernel vs XLA wavefront mean-image ratio on
     hardware (skipped off-TPU); target |1-r| < 1%.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CPU_RAYS_PER_SEC = 20e6  # documented estimate, see BASELINE.md

WIDTH = 600
SPP = 200
MAX_DEPTH = 8
PARITY_WIDTH = 200
PARITY_SPP = 512


def main():
    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu import grad as grad_mod
    from rust_tracing_tpu import renderer
    from rust_tracing_tpu.models import builders

    b, settings = builders.cornell_box()
    settings = dataclasses.replace(settings, image_width=WIDTH,
                                   samples_per_pixel=SPP, max_depth=MAX_DEPTH)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    on_tpu = jax.default_backend() == "tpu"

    # ---- forward (aux): production path, full cornell 600x600 @ SPP
    img, stats = renderer.render(scene, camera)  # includes compile
    img, stats = renderer.render(scene, camera, seed=1)  # timed run
    fwd_rays_per_sec = stats.rays_per_sec
    avg_bounces = stats.rays / (WIDTH * settings.image_height * SPP)

    # ---- parity gate: megakernel vs XLA wavefront on the same hardware
    parity_ratio = None
    if on_tpu:
        psettings = dataclasses.replace(
            settings, image_width=PARITY_WIDTH, samples_per_pixel=PARITY_SPP)
        pcam = Camera.create(psettings)
        img_mk, _ = renderer.render(scene, pcam, seed=7, use_megakernel=True)
        img_xla, _ = renderer.render(scene, pcam, seed=7, use_megakernel=False)
        parity_ratio = float(np.mean(img_mk) / np.mean(img_xla))

    # ---- forward+backward (HEADLINE): full contract workload value_and_grad
    loss_fn = lambda im, pid: jnp.mean(im)

    def run_grad(seed):
        loss, g, nrays = grad_mod.loss_and_grad(
            scene, camera, loss_fn, seed=seed, spp=SPP,
            max_depth=MAX_DEPTH, with_rays=True, linear_loss=True)
        jax.block_until_ready(g.sph_center)
        return nrays

    run_grad(0)  # compile
    t0 = time.perf_counter()
    n_rep = 2
    grad_rays = sum(run_grad(i + 1) for i in range(n_rep))
    fwdbwd_rays_per_sec = grad_rays / (time.perf_counter() - t0)

    # ---- forward+backward, NONLINEAR (L2) loss (aux): the fit_scene-style
    # training objective — runs the general path (dedicated forward render
    # for the cotangent), so training-loop perf is tracked machine-readably
    # and can't silently regress behind the linear-loss headline.
    l2_fn = grad_mod.l2_to_target(
        jnp.asarray(img.reshape(-1, 3), jnp.float32))

    def run_grad_l2(seed):
        loss, g, nrays = grad_mod.loss_and_grad(
            scene, camera, l2_fn, seed=seed, spp=SPP,
            max_depth=MAX_DEPTH, with_rays=True)
        jax.block_until_ready(g.sph_center)
        return nrays

    run_grad_l2(0)  # compile
    t0 = time.perf_counter()
    l2_rays = sum(run_grad_l2(i + 1) for i in range(n_rep))
    fwdbwd_l2_rays_per_sec = l2_rays / (time.perf_counter() - t0)

    result = {
        "metric": "cornell600_200spp_fwdbwd_rays_per_sec_per_chip",
        "value": round(fwdbwd_rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(fwdbwd_rays_per_sec / REFERENCE_CPU_RAYS_PER_SEC,
                             4),
        "aux": {
            "fwdbwd_workload": f"{WIDTH}x{settings.image_height}@{SPP}spp "
                               f"d{MAX_DEPTH} full frame, all scene params",
            "fwdbwd_l2_rays_per_sec": round(fwdbwd_l2_rays_per_sec),
            "forward_rays_per_sec": round(fwd_rays_per_sec),
            "forward_vs_baseline": round(
                fwd_rays_per_sec / REFERENCE_CPU_RAYS_PER_SEC, 4),
            "forward_seconds": round(stats.seconds, 3),
            "forward_path": "megakernel" if on_tpu else "xla_wavefront",
            "parity_ratio_megakernel_vs_xla": parity_ratio,
            "avg_bounces": round(avg_bounces, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
