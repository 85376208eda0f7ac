"""Golden-image acceptance tests against the reference's shipped screenshots.

The reference's de-facto test fixtures are the rendered screenshots embedded
in its README (README.md:20-39 -> screenshots/*.png) — SURVEY.md §4. These
tests decode those actual PNGs and compare our renders against them.

Method: render each scene at reduced resolution/spp, convert both images to
gamma space, downsample both to a coarse GxG grid (block averaging kills
Monte-Carlo noise and resolution mismatch), and bound the mean absolute
difference. Per-scene tolerances:

- deterministic-geometry scenes (two_spheres, earth, simple_light,
  cornell_box, cornell_smoke): tight bounds — same geometry, same camera, same
  shading formulas; residual = MC noise + our reduced spp/depth.
- two_perlin_spheres: the reference seeds its Perlin tables from the OS RNG at
  every run (perlin.rs:16-25), so the marble *pattern* differs by run even for
  the reference itself; coarse means still match (looser bound).
- random_balls / final_scene: scene geometry itself is OS-random in the
  reference (main.rs:70-76,523), so the screenshot shows *a different random
  scene*; only coarse global statistics are gated (documented caveat —
  SURVEY.md §7 "RNG parity"). random_balls' screenshot also predates the
  committed 600x337 config (it is 1200x675 RGBA).

quads has no screenshot in the reference repo (8 screenshots, 9 scenes).
"""

import os

import numpy as np
import pytest

from rust_tracing_tpu import Camera, compile_scene, render
from rust_tracing_tpu.models import builders
from rust_tracing_tpu.utils import color as color_util
from rust_tracing_tpu.utils.image_io import read_image_rgb8

SCREENSHOT_DIR = "/root/reference/screenshots"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCREENSHOT_DIR),
    reason="reference screenshots not available",
)


def block_mean(img: np.ndarray, g: int) -> np.ndarray:
    """Downsample (H,W,3) to (g,g,3) by block averaging (crops remainders)."""
    h, w, _ = img.shape
    bh, bw = h // g, w // g
    assert bh > 0 and bw > 0
    return img[: bh * g, : bw * g].reshape(g, bh, g, bw, 3).mean(axis=(1, 3))


def render_gamma_grid(scene_idx: int, width: int, spp: int, g: int,
                      max_depth=None, seed: int = 3) -> np.ndarray:
    b, settings = builders.build_scene(scene_idx, seed=0)
    import dataclasses

    overrides = dict(image_width=width, samples_per_pixel=spp)
    if max_depth is not None:
        overrides["max_depth"] = max_depth
    settings = dataclasses.replace(settings, **overrides)
    # BVH on for the big scene: the while_loop traversal is the right kernel
    # on CPU, and final_scene brute force would be too slow for the suite.
    scene = compile_scene(b, use_bvh=(scene_idx == 8) or None)
    camera = Camera.create(settings)
    img, _ = render(scene, camera, seed=seed)
    return block_mean(color_util.linear_to_gamma(np.clip(img, 0.0, 1.0)), g)


def reference_gamma_grid(name: str, g: int) -> np.ndarray:
    png = read_image_rgb8(os.path.join(SCREENSHOT_DIR, f"{name}.png"))
    return block_mean(png.astype(np.float64) / 255.0, g)


# (scene idx, screenshot, render width, spp, grid, tolerance, max_depth)
DETERMINISTIC_CASES = [
    (1, "checker", 160, 32, 8, 0.045, None),
    (5, "simple_light", 160, 96, 8, 0.05, None),
    (6, "cornell_box", 128, 96, 8, 0.06, None),
    (7, "cornell_smoke", 128, 96, 8, 0.06, None),
]


@pytest.mark.parametrize(
    "idx,name,width,spp,g,tol,depth", DETERMINISTIC_CASES,
    ids=[c[1] for c in DETERMINISTIC_CASES])
def test_golden_deterministic(idx, name, width, spp, g, tol, depth):
    ours = render_gamma_grid(idx, width, spp, g, max_depth=depth)
    ref = reference_gamma_grid(name, g)
    mad = float(np.mean(np.abs(ours - ref)))
    assert mad < tol, f"{name}: grid mean-abs-diff {mad:.4f} >= {tol}"


def test_golden_earth():
    """earth.png predates the reference's gamma decode of image textures:
    with the *current* reference semantics (texture.rs:92 rgb_to_color ->
    gamma_to_linear, which we implement) the screenshot's globe is uniformly
    ~0.2 brighter in gamma space (measured grid MAD 0.105), while rendering
    the texture WITHOUT the decode matches at MAD 0.019. So this test gates
    the screenshot against the no-decode vintage and separately pins today's
    decode semantics via the unit tests in test_textures.py."""
    if not os.path.exists("/root/reference/assets/earth-large.jpg"):
        pytest.skip("earth asset not available (procedural fallback differs)")
    import dataclasses

    from rust_tracing_tpu.config import RenderSettings
    from rust_tracing_tpu.models.scene import SceneBuilder, TEX_IMAGE

    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    img8 = read_image_rgb8("/root/reference/assets/earth-large.jpg")
    b.images.append((img8.astype(np.float64) / 255.0).astype(np.float32))
    tid = b._add_texture(TEX_IMAGE, image=0)
    b.add_sphere((0, 0, 0), 2.0, b.lambertian(tid))
    settings = RenderSettings(
        aspect_ratio=16.0 / 9.0, image_width=160, samples_per_pixel=32,
        max_depth=8, background=(0.7, 0.8, 1.0), vfov=20.0,
        look_from=(12.0, 0.0, 0.0), look_at=(0.0, 0.0, 0.0))
    scene = compile_scene(b)
    camera = Camera.create(settings)
    img, _ = render(scene, camera, seed=3)
    ours = block_mean(color_util.linear_to_gamma(np.clip(img, 0.0, 1.0)), 8)
    ref = reference_gamma_grid("earth", 8)
    mad = float(np.mean(np.abs(ours - ref)))
    assert mad < 0.045, f"earth (no-decode vintage): MAD {mad:.4f}"


def test_golden_perlin_coarse():
    """Marble pattern is a fresh OS-random draw per reference run — gate the
    coarse brightness structure only (ground/sphere/sky layout)."""
    ours = render_gamma_grid(3, 160, 24, 6)
    ref = reference_gamma_grid("perlin", 6)
    mad = float(np.mean(np.abs(ours - ref)))
    assert mad < 0.08, f"perlin: grid mean-abs-diff {mad:.4f}"


def test_golden_random_balls_stats():
    """Geometry is OS-random in the reference (main.rs:70-76): compare global
    statistics only. Sky + gray ground dominate both images."""
    ours = render_gamma_grid(0, 200, 16, 4)
    ref = reference_gamma_grid("random_balls", 4)
    mad = float(np.mean(np.abs(ours - ref)))
    assert mad < 0.12, f"random_balls: grid mean-abs-diff {mad:.4f}"


@pytest.mark.slow
def test_golden_final_scene_stats():
    """Geometry is OS-random and our spp/depth are far below 8192/40: gate
    coarse global statistics (documented caveat)."""
    ours = render_gamma_grid(8, 120, 16, 4, max_depth=12)
    ref = reference_gamma_grid("final_scene", 4)
    mad = float(np.mean(np.abs(ours - ref)))
    assert mad < 0.14, f"final_scene: grid mean-abs-diff {mad:.4f}"
