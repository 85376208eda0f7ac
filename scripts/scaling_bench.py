"""Multi-device scaling-efficiency harness (SURVEY.md §5.8, BASELINE.md
target: >=90% rays/s efficiency 1 host -> N).

Runs the distributed renderer over growing mesh sizes and reports rays/s and
efficiency vs the single-device run. On a CPU host this exercises the SPMD
program shape over virtual devices (functional validation + collective
overhead measurement; absolute numbers are CPU-bound). On a real pod slice,
run per host with `--multihost` (jax.distributed.initialize) and the same
mesh code scales over ICI/DCN:

    # on every host of the slice
    python scripts/scaling_bench.py            # single-process, all local chips
    python -m rust_tracing_tpu.cli --multihost --distributed --scene 6

Usage: [JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python scripts/scaling_bench.py [--width 128] [--spp 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", type=int, default=6)
    ap.add_argument("--force-cpu8", action="store_true",
                    help="pin to 8 virtual CPU devices before jax init")
    args = ap.parse_args()

    if args.force_cpu8:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.force_cpu8:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.parallel import mesh as mesh_mod
    from rust_tracing_tpu.parallel import render_dist

    b, settings = builders.build_scene(args.scene)
    settings = dataclasses.replace(settings, image_width=args.width,
                                   samples_per_pixel=args.spp, max_depth=6)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float32)
    n_pix = camera.image_width * camera.image_height

    import json

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    base = None
    rows = []
    print(f"scene {args.scene} {camera.image_width}x{camera.image_height}"
          f"@{args.spp}spp over {len(devices)} {devices[0].platform} devices")
    for n in sizes:
        mesh = mesh_mod.make_mesh(devices[:n])
        n_padded = mesh_mod.pad_pixels(n_pix, mesh)
        pixel_ids = jnp.minimum(jnp.arange(n_padded, dtype=jnp.int32),
                                n_pix - 1)
        # TRACED rays (scene queries), not primary rays: the honest numerator
        # for scaling comparisons (VERDICT r2 #3). Padding duplicates a few
        # clamped edge pixels per mesh shape, so the per-mesh count can
        # differ slightly; efficiency uses the mesh-1 count as the USEFUL
        # work numerator (padded duplicates are overhead, not progress).
        fn = render_dist.make_distributed_renderer(mesh, args.spp, 6,
                                                   with_rays=True)
        out, nrays = fn(scene, cam, pixel_ids, jnp.uint32(0))
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            out, nrays = fn(scene, cam, pixel_ids, jnp.uint32(0))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        rays = float(nrays)
        if base is None:
            base_rays = rays
        rate = base_rays / dt  # useful-work rate
        if base is None:
            base = rate
        eff = rate / (base * n)
        rows.append({"mesh": n, "seconds": round(dt, 4),
                     "traced_mrays_per_sec": round(rate / 1e6, 2),
                     "rays_incl_padding": rays,
                     "efficiency_pct": round(eff * 100, 1)})
        print(f"  mesh {n:2d}: {dt:7.3f}s  {rate / 1e6:8.2f} Mtraced-rays/s  "
              f"efficiency {eff * 100:6.1f}%")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "scaling_cpu8.json")
    if os.environ.get("RT_SCALING_OUT"):
        out_path = os.environ["RT_SCALING_OUT"]
    try:
        with open(out_path, "w") as f:
            json.dump({"scene": args.scene,
                       "workload": f"{camera.image_width}x"
                                   f"{camera.image_height}@{args.spp}spp d6",
                       "platform": devices[0].platform,
                       "rows": rows}, f, indent=1)
        print(f"wrote {out_path}")
    except OSError:
        pass


if __name__ == "__main__":
    main()
