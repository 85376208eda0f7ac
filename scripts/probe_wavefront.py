"""End-to-end sorted-wavefront probe on final_scene: warm render timing at
the production config, comparing sort cadences."""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--sort-every", default="1,2")
    args = ap.parse_args()

    from rust_tracing_tpu import Camera, compile_scene
    from rust_tracing_tpu.models import builders
    from rust_tracing_tpu.ops import wavefront

    b, settings = builders.final_scene()
    settings = dataclasses.replace(settings, image_width=args.width,
                                   samples_per_pixel=args.spp,
                                   max_depth=args.depth)
    scene = compile_scene(b)
    camera = Camera.create(settings)

    for se in [int(x) for x in args.sort_every.split(",")]:
        img, stats = wavefront.render_sorted(scene, camera, seed=3,
                                             exact=False, sort_every=se)
        img, stats = wavefront.render_sorted(scene, camera, seed=4,
                                             exact=False, sort_every=se)
        print(f"sort_every={se}: {stats.seconds:7.2f}s "
              f"{stats.rays/stats.seconds/1e6:6.2f} Mrays/s "
              f"({stats.rays/1e6:.0f}M rays)", flush=True)


if __name__ == "__main__":
    main()
