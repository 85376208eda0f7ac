"""Regenerate the BASELINE.md nine-workload table on the current backend.

Runs every reference workload (scene x resolution x spp x depth exactly as
pinned in reference main.rs — see BASELINE.md) through the production render
path, writes artifacts/workloads_tpu.json (the provenance file BASELINE.md
cites) and one PNG per scene.

Usage:
    python scripts/run_workloads.py                 # all nine, full spp
    python scripts/run_workloads.py --scenes 6 7    # subset
    python scripts/run_workloads.py --scale-spp 0.5 # reduced-spp smoke run
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (scene idx, spp, max_depth) straight from reference main.rs; resolution
# comes from each builder's RenderSettings (verified field-for-field).
WORKLOADS = {
    0: ("random_balls", 128, 8),
    1: ("two_spheres", 128, 8),
    2: ("earth", 128, 8),
    3: ("two_perlin_spheres", 128, 8),
    4: ("quads", 128, 8),
    5: ("simple_light", 1024, 8),
    6: ("cornell_box", 4096, 8),
    7: ("cornell_smoke", 4096, 8),
    8: ("final_scene", 8192, 40),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, nargs="*", default=list(range(9)))
    ap.add_argument("--scale-spp", type=float, default=1.0)
    ap.add_argument("--scene8-spp", type=int, default=None,
                    help="spp override for final_scene only (the full 8192 "
                         "is a ~2 h run; a reduced-spp row measures the "
                         "same sustained rate and is marked as such)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from rust_tracing_tpu import Camera, compile_scene, render
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.utils.image_io import write_png

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(repo, "artifacts")
    os.makedirs(art, exist_ok=True)
    out_path = args.out or os.path.join(art, "workloads_tpu.json")

    results = {"device": str(jax.devices()[0]),
               "backend": jax.default_backend(),
               "scale_spp": args.scale_spp,
               "rows": []}
    for idx in args.scenes:
        name, spp, depth = WORKLOADS[idx]
        spp = max(1, int(spp * args.scale_spp))
        spp_note = None
        if idx == 8 and args.scene8_spp:
            spp_note = f"sustained-rate row at {args.scene8_spp}spp of 8192"
            spp = args.scene8_spp
        b, settings = builders.build_scene(idx)
        settings = dataclasses.replace(settings, samples_per_pixel=spp,
                                       max_depth=depth)
        scene = compile_scene(b)
        camera = Camera.create(settings)
        w, h = camera.image_width, camera.image_height
        print(f"[{idx}] {name} {w}x{h}@{spp}spp d{depth} ...", flush=True)
        # Warm the compile cache off the clock — the kernel's static config
        # includes spp, so only a same-config run warms it exactly. For the
        # hours-scale final_scene workload we skip the duplicate run: its
        # dispatch is chunked over many pallas_calls, so the one compile
        # amortizes inside the measurement (noted per row).
        warmed = idx != 8 or args.scene8_spp is not None
        if warmed:
            render(scene, camera, seed=0, spp=spp, max_depth=depth)
        t0 = time.perf_counter()
        img, stats = render(scene, camera, seed=0, spp=spp, max_depth=depth)
        dt = time.perf_counter() - t0
        mrays = stats.rays / dt / 1e6
        row = {"scene": idx, "name": name,
               "workload": f"{w}x{h}@{spp}spp d{depth}",
               "seconds": round(dt, 2), "traced_mrays_per_sec": round(mrays, 1),
               "rays": int(stats.rays), "compile_excluded": warmed}
        if spp_note:
            row["note"] = spp_note
        results["rows"].append(row)
        print(f"    {dt:.2f}s  {mrays:.1f} Mrays/s", flush=True)
        write_png(os.path.join(art, f"{name}_tpu.png"), img)
        with open(out_path, "w") as f:  # write-as-you-go: partial runs count
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
