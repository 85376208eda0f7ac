"""Multi-device scaling-efficiency harness (SURVEY.md §5.8, BASELINE.md
target: >=90% rays/s efficiency 1 host -> N).

Measures all three distributed paths over growing mesh sizes:

  - ``wavefront``:   the sharded XLA wavefront renderer (generic fallback)
  - ``megakernel``:  the sharded Pallas megakernel (production forward;
                     interpret mode on CPU meshes)
  - ``replay_grad``: the sharded record/replay gradient
                     (parallel/grad_dist.py — production training), plus the
                     single-chip grad.loss_and_grad on the same SSE loss so
                     the sharding overhead of the gradient path is explicit

On a CPU host this exercises the SPMD program shape over virtual devices
(functional validation + collective overhead; absolute numbers are CPU-bound
— the artifact embeds the physical core count and a caveat). On a real pod
slice, run per host with jax.distributed.initialize and the same mesh code
scales over ICI/DCN:

    # on every host of the slice
    python scripts/scaling_bench.py            # single-process, all local chips
    python -m rust_tracing_tpu.cli --multihost --distributed --scene 6

Usage: [JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python scripts/scaling_bench.py [--width 128] [--spp 64]
                                       [--paths wavefront,megakernel,replay_grad]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, reps=3):
    out = fn()  # compile
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--grad-spp", type=int, default=8)
    ap.add_argument("--scene", type=int, default=6)
    ap.add_argument("--paths", default="wavefront,megakernel,replay_grad")
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
    import numpy as np

    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu import grad as grad_mod
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.ops import megakernel as mk
    from rust_tracing_tpu.parallel import grad_dist, mesh as mesh_mod
    from rust_tracing_tpu.parallel import render_dist

    b, settings = builders.build_scene(args.scene)
    settings = dataclasses.replace(settings, image_width=args.width,
                                   samples_per_pixel=args.spp, max_depth=6)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float32)
    n_pix = camera.image_width * camera.image_height
    paths = args.paths.split(",")

    devices = jax.devices()
    on_cpu = devices[0].platform == "cpu"
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    sections = {}
    print(f"scene {args.scene} {camera.image_width}x{camera.image_height}"
          f"@{args.spp}spp over {len(devices)} {devices[0].platform} devices")

    # ---------------- wavefront renderer (generic fallback path)
    if "wavefront" in paths:
        rows, base_rate, base_rays = [], None, None
        for n in sizes:
            mesh = mesh_mod.make_mesh(devices[:n])
            n_padded = mesh_mod.pad_pixels(n_pix, mesh)
            pixel_ids = jnp.minimum(jnp.arange(n_padded, dtype=jnp.int32),
                                    n_pix - 1)
            fn = render_dist.make_distributed_renderer(mesh, args.spp, 6,
                                                       with_rays=True)
            dt, (out, nrays) = _timed(
                lambda: fn(scene, cam, pixel_ids, jnp.uint32(0)))
            # TRACED rays (scene queries) — the honest numerator; padded
            # duplicate pixels are overhead, so efficiency uses the mesh-1
            # ray count as useful work.
            if base_rays is None:
                base_rays = float(nrays)
            rate = base_rays / dt
            if base_rate is None:
                base_rate = rate
            eff = rate / (base_rate * n)
            rows.append({"mesh": n, "seconds": round(dt, 4),
                         "traced_mrays_per_sec": round(rate / 1e6, 2),
                         "efficiency_pct": round(eff * 100, 1)})
            print(f"  wavefront   mesh {n:2d}: {dt:7.3f}s "
                  f"{rate / 1e6:8.2f} Mrays/s  eff {eff * 100:6.1f}%")
        sections["wavefront"] = rows

    # ---------------- sharded megakernel (production forward)
    if "megakernel" in paths:
        rows, base_rate, base_rays = [], None, None
        interp = on_cpu
        for n in sizes:
            mesh = mesh_mod.make_mesh(devices[:n])
            dt, (img, nrays) = _timed(
                lambda: mk.render_fast_sharded(scene, camera, mesh,
                                               spp=args.spp, max_depth=6,
                                               interpret=interp,
                                               with_stats=True))
            if base_rays is None:
                base_rays = float(nrays)
            rate = base_rays / dt
            if base_rate is None:
                base_rate = rate
            eff = rate / (base_rate * n)
            rows.append({"mesh": n, "seconds": round(dt, 4),
                         "traced_mrays_per_sec": round(rate / 1e6, 2),
                         "efficiency_pct": round(eff * 100, 1),
                         "interpret": interp})
            print(f"  megakernel  mesh {n:2d}: {dt:7.3f}s "
                  f"{rate / 1e6:8.2f} Mrays/s  eff {eff * 100:6.1f}%")
        # single-device megakernel for the sharding-overhead column
        dt1, (img1, nr1) = _timed(
            lambda: mk.render_fast(scene, camera, spp=args.spp, max_depth=6,
                                   interpret=interp, with_stats=True))
        sections["megakernel"] = {
            "rows": rows, "single_device_seconds": round(dt1, 4),
            "mesh1_overhead_pct": round(
                (rows[0]["seconds"] / dt1 - 1.0) * 100, 2)}
        print(f"  megakernel  single-device: {dt1:7.3f}s "
              f"(mesh-1 overhead "
              f"{sections['megakernel']['mesh1_overhead_pct']:+.2f}%)")

    # ---------------- sharded replay gradient (production training)
    if "replay_grad" in paths:
        gspp = args.grad_spp
        img, _ = __import__("rust_tracing_tpu").render(
            scene, camera, seed=99, spp=4, max_depth=6)
        target = np.asarray(img)
        recorder = "xla" if on_cpu else "kernel"
        rows, base_rate, base_rays = [], None, None
        for n in sizes:
            mesh = mesh_mod.make_mesh(devices[:n])
            dt, (loss, g, nrays) = _timed(
                lambda: grad_dist.replay_loss_and_grad(
                    scene, camera, mesh, target, seed=1, spp=gspp,
                    max_depth=6, recorder=recorder))
            if base_rays is None:
                base_rays = float(nrays)
            rate = base_rays / dt
            if base_rate is None:
                base_rate = rate
            eff = rate / (base_rate * n)
            rows.append({"mesh": n, "seconds": round(dt, 4),
                         "fwdbwd_mrays_per_sec": round(rate / 1e6, 2),
                         "efficiency_pct": round(eff * 100, 1),
                         "recorder": recorder})
            print(f"  replay_grad mesh {n:2d}: {dt:7.3f}s "
                  f"{rate / 1e6:8.2f} Mrays/s fwd+bwd  "
                  f"eff {eff * 100:6.1f}%")
        # single-chip loss_and_grad on the SAME SSE loss: the gradient
        # path's sharding overhead at mesh=1
        t_flat = jnp.asarray(target.reshape(-1, 3))
        loss_fn = lambda im, pid: jnp.sum((im - t_flat) ** 2)
        dt1, _ = _timed(lambda: grad_mod.loss_and_grad(
            scene, camera, loss_fn, seed=1, spp=gspp, max_depth=6,
            use_recorder=True, with_rays=True))
        sections["replay_grad"] = {
            "rows": rows, "single_chip_seconds": round(dt1, 4),
            "mesh1_overhead_pct": round(
                (rows[0]["seconds"] / dt1 - 1.0) * 100, 2)}
        print(f"  replay_grad single-chip:   {dt1:7.3f}s "
              f"(mesh-1 overhead "
              f"{sections['replay_grad']['mesh1_overhead_pct']:+.2f}%)")

    result = {
        "scene": args.scene,
        "workload": f"{camera.image_width}x{camera.image_height}"
                    f"@{args.spp}spp d6 (grad @{args.grad_spp}spp)",
        "platform": devices[0].platform,
        "physical_cores": os.cpu_count(),
        "sections": sections,
    }
    if on_cpu:
        result["caveat"] = (
            f"CPU mesh over {len(devices)} VIRTUAL devices on "
            f"{os.cpu_count()} physical cores: the mesh-1 baseline already "
            "saturates the cores via XLA intra-op threading, so the "
            "efficiency column measures CORE CONTENTION, not the SPMD "
            "program — total speedup is capped at the physical core count. "
            "The meaningful CPU-mesh signal is the exactness tests "
            "(tests/test_parallel.py: sharded == single). Real scaling "
            "numbers require a pod slice.")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "scaling_cpu8.json" if on_cpu else "scaling_tpu.json")
    if os.environ.get("RT_SCALING_OUT"):
        out_path = os.environ["RT_SCALING_OUT"]
    try:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}")
    except OSError:
        pass


if __name__ == "__main__":
    main()
