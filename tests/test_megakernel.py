"""Fused Pallas megakernel vs the XLA wavefront path (interpret mode on CPU;
statistical agreement — the RNG streams differ by design)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene, render
from rust_tracing_tpu.models import builders
from rust_tracing_tpu.ops import megakernel


def test_supports_flags():
    # Full coverage: every reference scene family runs in the kernel
    # (noise via hash-lattice gradients, images via mipped lane gathers).
    for build in (builders.cornell_box, builders.two_perlin_spheres,
                  builders.earth):
        b, _ = build()
        assert megakernel.supports(compile_scene(b))


def test_background_exact():
    b = SceneBuilder(background=(0.2, 0.4, 0.8))
    scene = compile_scene(b)
    cam = Camera.create(RenderSettings(
        image_width=32, aspect_ratio=2.0, samples_per_pixel=2, max_depth=3,
        background=(0.2, 0.4, 0.8)))
    img = megakernel.render_fast(scene, cam, interpret=True)
    np.testing.assert_allclose(img, np.broadcast_to([0.2, 0.4, 0.8], img.shape),
                               rtol=1e-6)


def test_emitter_exact():
    b = SceneBuilder(background=(0, 0, 0))
    b.add_quad((-1, -1, 2), (2, 0, 0), (0, 2, 0), b.diffuse_light((3, 2, 1)))
    scene = compile_scene(b)
    cam = Camera.create(RenderSettings(
        image_width=32, aspect_ratio=1.0, samples_per_pixel=2, max_depth=2,
        vfov=60.0, look_from=(0, 0, 0), look_at=(0, 0, 2)))
    img = megakernel.render_fast(scene, cam, interpret=True)
    np.testing.assert_allclose(img[16, 16], [3, 2, 1], rtol=1e-6)
    np.testing.assert_allclose(img[0, 0], 0, atol=1e-7)


def test_cornell_statistics_match_xla():
    b, settings = builders.cornell_box()
    settings = dataclasses.replace(settings, image_width=32,
                                   samples_per_pixel=64, max_depth=4)
    scene = compile_scene(b)
    cam = Camera.create(settings)
    img_m = megakernel.render_fast(scene, cam, interpret=True)
    img_x, _ = render(scene, cam)
    assert img_m.shape == img_x.shape
    assert abs(img_m.mean() / img_x.mean() - 1.0) < 0.05
    # spatial structure agrees (correlation over pixels)
    a = img_m.reshape(-1, 3).mean(-1)
    c = img_x.reshape(-1, 3).mean(-1)
    corr = np.corrcoef(a, c)[0, 1]
    assert corr > 0.98


def test_media_and_materials_smoke():
    # metal + dielectric + medium + motion blur, defocus camera
    b = SceneBuilder(background=(0.6, 0.7, 1.0))
    b.add_sphere((0, -100.5, -2), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -2), 0.5, b.metal((0.9, 0.8, 0.7), 0.3))
    b.add_sphere((1.1, 0, -2), 0.5, b.dielectric(1.5))
    b.add_sphere((-1.1, 0.2, -2), 0.3, b.lambertian((0.8, 0.2, 0.2)),
                 target=(-1.1, 0.5, -2))
    b.add_box_medium((-0.4, -0.5, -2.6), (0.4, 0.5, -1.6), 0.7, (1, 1, 1))
    scene = compile_scene(b)
    cam = Camera.create(RenderSettings(
        image_width=24, aspect_ratio=1.0, samples_per_pixel=16, max_depth=5,
        vfov=60.0, look_from=(0, 0, 1), look_at=(0, 0, -2),
        defocus_angle=1.0, focus_dist=3.0, background=(0.6, 0.7, 1.0)))
    img_m = megakernel.render_fast(scene, cam, interpret=True)
    img_x, _ = render(scene, cam)
    assert np.isfinite(img_m).all()
    assert abs(img_m.mean() / img_x.mean() - 1.0) < 0.12
