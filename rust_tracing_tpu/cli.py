"""Command-line interface.

Mirrors the reference CLI surface (src/main.rs:40-54): ``--live``, ``--scene``
(0-8), ``--output``; plus TPU-era extras: spp/size/depth overrides, seed,
distributed mesh options, checkpoint/resume, and gradient self-check.

Run: ``python -m rust_tracing_tpu.cli --scene 6 --output cornell``.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rust_tracing_tpu",
        description="TPU-native differentiable path tracer "
                    "(capabilities of rust-tracing)")
    # the reference's three flags (main.rs:40-54)
    p.add_argument("-l", "--live", action="store_true",
                   help="progressive rendering mode: accumulate 1-sample "
                        "passes, write preview PNGs as they refine")
    p.add_argument("-s", "--scene", type=int, default=0,
                   help="scene index (0:random balls, 1:two spheres, 2:earth, "
                        "3:perlin spheres, 4:quads, 5:simple light, "
                        "6:cornell box, 7:cornell smoke, 8:final scene)")
    p.add_argument("-o", "--output", type=str, default="output",
                   help="output file name (without .png)")
    # TPU-era extras
    p.add_argument("--spp", type=int, default=None, help="override samples/pixel")
    p.add_argument("--width", type=int, default=None, help="override image width")
    p.add_argument("--max-depth", type=int, default=None, help="override bounce depth")
    p.add_argument("--seed", type=int, default=0, help="RNG seed")
    p.add_argument("--scene-seed", type=int, default=0,
                   help="seed for randomized scene content (scenes 0 and 8)")
    p.add_argument("--distributed", action="store_true",
                   help="shard pixels/samples over all visible devices")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "rendezvous before building the mesh (fail-fast if "
                        "the coordinator is unreachable); implies "
                        "--distributed")
    p.add_argument("--sample-parallelism", type=int, default=1,
                   help="mesh chips cooperating on the spp axis")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the render into DIR")
    p.add_argument("--report-occupancy", action="store_true",
                   help="print per-bounce live-ray fractions (wavefront "
                        "divergence telemetry) before rendering")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="progressive checkpoint file (.npz) to save/resume")
    p.add_argument("--checkpoint-every", type=int, default=32,
                   help="samples between checkpoint writes in --live mode")
    p.add_argument("--preview-every", type=int, default=8,
                   help="samples between preview PNG writes in --live mode")
    p.add_argument("--dtype", choices=("float32", "float64"), default="float32")
    p.add_argument("--metrics", type=str, nargs="?", const="1", default=None,
                   metavar="FILE",
                   help="emit one JSON metrics line per render/step "
                        "(SURVEY.md §5.5): to stderr, or appended to FILE")
    p.add_argument("--grad-check", action="store_true",
                   help="before rendering, validate the differentiable "
                        "pipeline on this scene: autodiff gradient vs "
                        "central finite differences of the same fixed-RNG "
                        "estimator (BASELINE.json gradient-correctness "
                        "metric), printed and exit-status-gated")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Args: {args}")

    import jax
    import jax.numpy as jnp

    from . import Camera, compile_scene, render
    from .models import builders
    from .renderer import progressive_init, progressive_step
    from .utils import checkpoint as ckpt
    from .utils.image_io import write_png
    from .utils.progress import ProgressBar

    dtype = jnp.float32 if args.dtype == "float32" else jnp.float64
    if dtype is jnp.float64:
        jax.config.update("jax_enable_x64", True)

    if args.metrics:
        from .utils import metrics as metrics_mod

        metrics_mod.enable(None if args.metrics == "1" else args.metrics)

    if args.multihost:
        # Multi-host rendezvous (SURVEY.md §5.8): fail-fast — a missing or
        # misconfigured coordinator raises here instead of hanging the render.
        jax.distributed.initialize()
        args.distributed = True
        print(f"distributed: process {jax.process_index()}/{jax.process_count()}"
              f" with {jax.local_device_count()} local devices")

    t0 = time.perf_counter()
    b, settings = builders.build_scene(args.scene, seed=args.scene_seed)
    overrides = {}
    if args.width:
        overrides["image_width"] = args.width
    if args.spp:
        overrides["samples_per_pixel"] = args.spp
    if args.max_depth:
        overrides["max_depth"] = args.max_depth
    if overrides:
        settings = dataclasses.replace(settings, **overrides)
    scene = compile_scene(b, dtype=dtype)
    camera = Camera.create(settings)
    print(f"Scene compile: {time.perf_counter() - t0:.2f}s "
          f"({b.num_spheres} spheres, {b.num_quads} quads, {b.num_media} media; "
          f"{camera.image_width}x{camera.image_height} @ "
          f"{camera.samples_per_pixel}spp depth {camera.max_depth})")

    out_png = f"{args.output}.png"

    if args.grad_check:
        # Differentiable-pipeline self-check (BASELINE.json gradient metric):
        # autodiff vs central finite differences of the SAME fixed-RNG
        # estimator. The RNG is counter-addressed, so the estimator is
        # deterministic in the parameters and FD is exact up to f32
        # arithmetic + curvature. Probes the strongest coordinates among the
        # SMOOTH parameter families; scenes where a family's gradient is
        # legitimately zero (e.g. earth's solid-color table is unused) fall
        # through to the next family rather than failing.
        import numpy as np

        from . import grad as grad_mod

        n_pix = camera.image_width * camera.image_height
        stride = max(1, n_pix // 2048)
        pixel_ids = jnp.arange(0, n_pix, stride, dtype=jnp.int32)
        spp_c, depth_c = 8, min(4, camera.max_depth)
        loss_fn = lambda im, pid: jnp.mean(im)

        def loss_at(s):
            # forward-only evaluation (no wasted backward pass)
            img, _ = grad_mod.radiance_mean_rays(
                s, camera.constants(dtype), pixel_ids, jnp.uint32(args.seed),
                spp_c, depth_c)
            return float(loss_fn(img, pixel_ids))

        _, g = grad_mod.loss_and_grad(scene, camera, loss_fn, seed=args.seed,
                                      spp=spp_c, max_depth=depth_c,
                                      pixel_ids=pixel_ids, dtype=dtype,
                                      use_recorder=False)
        ok, checked, eps = True, 0, 1e-2
        fields = ("tex_rgb", "mat_albedo", "tex_noise_scale",
                  "med_neg_inv_density")
        for field in fields:
            g_f = np.asarray(getattr(g, field), np.float64)
            order = np.argsort(np.abs(g_f).ravel())[::-1][:3]
            for lin in order:
                if abs(g_f.ravel()[lin]) < 1e-7:
                    continue
                arr = np.asarray(getattr(scene, field), np.float64)
                delta = eps * (np.arange(arr.size).reshape(arr.shape) == lin)
                base = getattr(scene, field)
                up = dataclasses.replace(
                    scene, **{field: jnp.asarray(arr + delta, base.dtype)})
                dn = dataclasses.replace(
                    scene, **{field: jnp.asarray(arr - delta, base.dtype)})
                fd = (loss_at(up) - loss_at(dn)) / (2 * eps)
                ad = g_f.ravel()[lin]
                rel = abs(fd - ad) / max(abs(fd), 1e-12)
                idx = np.unravel_index(lin, arr.shape)
                print(f"grad-check {field}{list(idx)}: ad={ad:+.6e} "
                      f"fd={fd:+.6e} rel_err={rel:.3e}")
                ok &= rel < 5e-2 or abs(fd - ad) < 1e-6
                checked += 1
            if checked >= 3:
                break
        verdict = "OK" if ok and checked else ("SKIP (no smooth nonzero-"
                  "gradient parameter at this config)" if ok else "FAIL")
        print(f"grad-check: {verdict} ({checked} coordinates)")
        if not ok:
            return 1

    if args.report_occupancy:
        from .renderer import measure_occupancy

        occ = measure_occupancy(scene, camera, seed=args.seed)
        frac = " ".join(f"{x:.3f}" for x in occ)
        print(f"occupancy per bounce: {frac} (mean {occ.mean():.3f})")

    if args.live:
        state = None
        if args.checkpoint:
            import os

            if os.path.exists(args.checkpoint):
                # A present-but-unreadable checkpoint is an error, not a
                # silent restart — that would throw away paid-for samples.
                state = ckpt.load(args.checkpoint)
                if state.accum.shape[:2] != (camera.image_height,
                                             camera.image_width):
                    raise SystemExit(
                        f"checkpoint {args.checkpoint} is {state.accum.shape[1]}x"
                        f"{state.accum.shape[0]} but the render is "
                        f"{camera.image_width}x{camera.image_height}")
                print(f"Resumed {args.checkpoint} at {state.num_samples} spp")
        if state is None:
            state = progressive_init(camera, seed=args.seed)
        from .utils.viewer import TerminalViewer

        viewer = TerminalViewer()
        t0 = time.perf_counter()
        while state.num_samples < camera.samples_per_pixel:
            state = progressive_step(scene, camera, state, samples=1,
                                     dtype=dtype)
            n = state.num_samples
            status = (f"spp {n}/{camera.samples_per_pixel} "
                      f"({time.perf_counter() - t0:.1f}s)")
            viewer.show(state.accum, status)
            if not viewer.enabled:
                print(f"\r{status}", end="", file=sys.stderr)
            if n % args.preview_every == 0 or n == camera.samples_per_pixel:
                write_png(out_png, state.accum)
            if args.checkpoint and n % args.checkpoint_every == 0:
                ckpt.save(args.checkpoint, state)
        print(file=sys.stderr)
        if args.checkpoint:
            ckpt.save(args.checkpoint, state)
        write_png(out_png, state.accum)
        print(f"Wrote {out_png} at {state.num_samples} spp")
        return 0

    import contextlib

    profile_cm = (jax.profiler.trace(args.profile) if args.profile
                  else contextlib.nullcontext())
    with profile_cm:
        if args.distributed:
            from .parallel import mesh as mesh_mod
            from .parallel.render_dist import render_distributed

            mesh = mesh_mod.make_mesh(sample_parallelism=args.sample_parallelism)
            print(f"Mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
            t0 = time.perf_counter()
            image = render_distributed(scene, camera, mesh, seed=args.seed,
                                       dtype=dtype)
            print(f"Render time: {time.perf_counter() - t0:.2f}s")
        else:
            bar = ProgressBar(camera.image_width * camera.image_height)
            image, stats = render(scene, camera, seed=args.seed, dtype=dtype,
                                  progress=bar)
            print(f"Render time: {stats.seconds:.2f}s "
                  f"({stats.rays_per_sec / 1e6:.2f} Mrays/s)")
    if args.profile:
        print(f"Profiler trace written to {args.profile}")

    t0 = time.perf_counter()
    write_png(out_png, image)
    print(f"PNG encoding: {time.perf_counter() - t0:.2f}s -> {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
