"""Headline benchmark: rays/s/chip forward+backward on Cornell box
(BASELINE.json metric: cornell 600x600 @ 200spp).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the documented estimate of the Rust reference on
a modern multi-core CPU (BASELINE.md): the reference publishes no numbers and
cargo isn't available here, so 20 Mrays/s (16-core rayon path tracing of this
scene class) is used as the denominator and recorded in BASELINE.md.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CPU_RAYS_PER_SEC = 20e6  # documented estimate, see BASELINE.md

WIDTH = 600
SPP = 200
MAX_DEPTH = 8
GRAD_SPP = 8  # backward-pass spp batch (amortized measurement)


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

    # ---- forward: full cornell 600x600 @ SPP
    img, stats = renderer.render(scene, camera)  # includes compile (cached after)
    img, stats = renderer.render(scene, camera, seed=1)  # timed run
    fwd_rays_per_sec = stats.rays_per_sec
    fwd_rays = stats.rays

    # ---- forward+backward: value_and_grad of mean radiance on a pixel chunk
    cam = camera.constants(jnp.float32)
    chunk = 65536
    pixel_ids = jnp.arange(chunk, dtype=jnp.int32)
    loss_fn = lambda im, pid: jnp.mean(im)

    def run_grad(seed):
        loss, g = grad_mod.loss_and_grad(scene, camera, loss_fn, seed=seed,
                                         spp=GRAD_SPP, max_depth=MAX_DEPTH,
                                         pixel_ids=pixel_ids)
        jax.block_until_ready(g.sph_center)
        return loss

    run_grad(0)  # compile
    t0 = time.perf_counter()
    n_rep = 3
    for i in range(n_rep):
        run_grad(i + 1)
    dt = time.perf_counter() - t0
    # rays traced per grad run: chunk * spp * avg_bounces (use forward avg)
    avg_bounces = fwd_rays / (WIDTH * settings.image_height * SPP)
    grad_rays = chunk * GRAD_SPP * avg_bounces * n_rep
    fwdbwd_rays_per_sec = grad_rays / dt

    result = {
        "metric": "cornell600_fwd+bwd_rays_per_sec_per_chip",
        "value": round(fwdbwd_rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(fwdbwd_rays_per_sec / REFERENCE_CPU_RAYS_PER_SEC, 4),
        "aux": {
            "forward_rays_per_sec": round(fwd_rays_per_sec),
            "forward_seconds": round(stats.seconds, 3),
            "avg_bounces": round(avg_bounces, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
