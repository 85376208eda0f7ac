"""final_scene at the FULL reference workload (800x800 @ 8192spp depth 40,
main.rs:624-636), run as resumable spp slices.

One monolithic render is hours of chip time that a single kill throws away;
this driver renders ``--slice-spp`` samples at a time via the megakernel's
runtime ``sample_offset`` (one compiled kernel for every slice), accumulates
the exact progressive mean (sample addressing is global, so the result is
bitwise the same image as a single 8192-spp render of the same association
order per slice), and checkpoints after every slice:

  - artifacts/final_scene_full_progress.json  (slices done, rays, rate)
  - artifacts/final_scene_tpu.png             (current accumulated image)

Re-running resumes from the recorded slice count. On completion, merges the
row into artifacts/workloads_tpu.json.

Usage: python scripts/final_scene_full.py [--slice-spp 128] [--spp 8192]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
PROGRESS = os.path.join(ART, "final_scene_full_progress.json")
STATE_NPY = os.path.join(ART, "final_scene_full_accum.npy")  # legacy pair
STATE_NPZ = os.path.join(ART, "final_scene_full_state.npz")  # atomic state


def _atomic_write(path, write_fn):
    """write_fn(tmp_path) then atomic rename — a kill can only ever leave
    the previous consistent state on disk."""
    tmp = path + ".tmp"
    write_fn(tmp)
    os.replace(tmp, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8192)
    ap.add_argument("--slice-spp", type=int, default=128)
    ap.add_argument("--max-depth", type=int, default=40)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing progress and restart")
    args = ap.parse_args()

    import numpy as np

    from rust_tracing_tpu import Camera, compile_scene, render
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.utils.image_io import write_png

    os.makedirs(ART, exist_ok=True)
    b, settings = builders.build_scene(8)
    settings = dataclasses.replace(settings, samples_per_pixel=args.spp,
                                   max_depth=args.max_depth)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    w, h = camera.image_width, camera.image_height
    n_slices = (args.spp + args.slice_spp - 1) // args.slice_spp

    workload = f"{w}x{h}@{args.spp}spp d{args.max_depth}"
    done, rays, seconds = 0, 0.0, 0.0
    accum = np.zeros((h, w, 3), np.float64)
    if not args.fresh and os.path.exists(STATE_NPZ):
        # atomic single-file state: accumulator + counters always consistent
        st = np.load(STATE_NPZ, allow_pickle=False)
        if (str(st["workload"]) == workload
                and int(st["slice_spp"]) == args.slice_spp):
            done = int(st["slices_done"])
            rays = float(st["rays"])
            seconds = float(st["seconds"])
            accum = st["accum"]
    elif not args.fresh and os.path.exists(PROGRESS) and os.path.exists(STATE_NPY):
        # legacy two-file pair (pre-atomic runs)
        with open(PROGRESS) as f:
            p = json.load(f)
        if (p.get("slice_spp") == args.slice_spp
                and p.get("workload") == workload):
            done, rays, seconds = p["slices_done"], p["rays"], p["seconds"]
            accum = np.load(STATE_NPY)
    if done:
        print(f"resuming at slice {done}/{n_slices} "
              f"({seconds:.0f}s, {rays/1e9:.2f}G rays so far)", flush=True)

    for s in range(done, n_slices):
        k = min(args.slice_spp, args.spp - s * args.slice_spp)
        t0 = time.perf_counter()
        img, stats = render(scene, camera, seed=0, spp=k,
                            max_depth=args.max_depth,
                            sample_offset=s * args.slice_spp)
        dt = time.perf_counter() - t0
        # incremental mean over global sample index (renderer.rs:114)
        n0 = s * args.slice_spp
        accum += (img - accum) * (k / (n0 + k))
        rays += stats.rays
        seconds += dt
        done = s + 1
        _atomic_write(STATE_NPZ, lambda t: np.savez(
            open(t, "wb"), accum=accum, slices_done=done, rays=rays,
            seconds=seconds, workload=workload, slice_spp=args.slice_spp))
        write_png(os.path.join(ART, "final_scene_tpu.png"), accum)
        _atomic_write(PROGRESS, lambda t: json.dump(
            {"workload": workload, "slice_spp": args.slice_spp,
             "slices_done": done, "n_slices": n_slices,
             "rays": rays, "seconds": round(seconds, 1),
             "traced_mrays_per_sec": round(rays / seconds / 1e6, 2),
             "complete": done == n_slices}, open(t, "w"), indent=1))
        print(f"slice {done}/{n_slices}: {dt:.1f}s "
              f"{stats.rays/dt/1e6:.2f} Mrays/s "
              f"(cum {rays/seconds/1e6:.2f} Mrays/s, "
              f"eta {(n_slices-done)*seconds/done/60:.0f} min)", flush=True)

    # merge the honest row into the provenance table
    wl_path = os.path.join(ART, "workloads_tpu.json")
    table = {"rows": []}
    if os.path.exists(wl_path):
        with open(wl_path) as f:
            table = json.load(f)
    table["rows"] = [r for r in table.get("rows", []) if r.get("scene") != 8]
    table["rows"].append({
        "scene": 8, "name": "final_scene",
        "workload": f"{w}x{h}@{args.spp}spp d{args.max_depth}",
        "seconds": round(seconds, 1),
        "traced_mrays_per_sec": round(rays / seconds / 1e6, 2),
        "rays": int(rays), "compile_excluded": False,
        "note": f"rendered as {n_slices} resumable {args.slice_spp}-spp "
                f"slices (global sample addressing; exact accumulation)"})
    with open(wl_path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"DONE: {seconds:.0f}s total, {rays/seconds/1e6:.2f} Mrays/s; "
          f"merged into {wl_path}", flush=True)


if __name__ == "__main__":
    main()
