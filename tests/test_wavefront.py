"""Sorted deferred wavefront renderer (ops/wavefront.py): the big-scene
production path must reproduce the direct XLA estimator exactly — the
per-bounce coherence sort and the compaction may change WHICH rays share a
kernel tile, never any value."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene
from rust_tracing_tpu import grad as grad_mod
from rust_tracing_tpu.ops import wavefront


def _bvh_scene():
    """~40 mixed primitives + a medium: enough for a real BVH walk."""
    rng = np.random.default_rng(0)
    b = SceneBuilder(background=(0.6, 0.7, 1.0))
    b.add_sphere((0, -100.5, -2), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    for i in range(30):
        p = rng.uniform(-2, 2, 3)
        p[1] = rng.uniform(-0.4, 0.8)
        p[2] = -2 + rng.uniform(-1.5, 1.5)
        m = [b.lambertian(tuple(rng.uniform(0.1, 0.9, 3))),
             b.metal((0.8, 0.7, 0.6), 0.2), b.dielectric(1.5)][i % 3]
        b.add_sphere(tuple(p), 0.25, m)
    b.add_cube((-0.5, -0.5, -3.2), (0.5, 0.5, -2.6),
               b.lambertian((0.7, 0.3, 0.2)))
    b.add_box_medium((1.0, -0.5, -2.0), (1.8, 0.5, -1.2), 0.6, (1, 1, 1))
    scene = compile_scene(b)
    camera = Camera.create(RenderSettings(
        image_width=24, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4,
        vfov=60.0, look_from=(0, 0, 1), look_at=(0, 0, -2),
        background=(0.6, 0.7, 1.0)))
    return scene, camera


def test_wavefront_bitwise_equals_direct():
    scene, camera = _bvh_scene()
    cam = camera.constants(jnp.float32)
    img_s, st = wavefront.render_sorted(scene, camera, seed=3,
                                        interpret=True, use_bvh=True)
    img_u, _ = wavefront.render_sorted(scene, camera, seed=3, sort=False,
                                       interpret=True, use_bvh=True)
    pid = jnp.arange(24 * 24, dtype=jnp.int32)
    direct, nr = grad_mod.radiance_mean_rays(
        scene, cam, pid, jnp.uint32(3), 4, 4, sample_chunk=4)
    d = np.asarray(direct).reshape(24, 24, 3)
    # sort permutes lanes only: identical image either way, and bitwise
    # equal to the direct estimator (same RNG addresses, same reduction)
    np.testing.assert_array_equal(img_s, img_u)
    np.testing.assert_array_equal(np.asarray(img_s, np.float32),
                                  np.asarray(d, np.float32))
    assert st.rays == int(float(nr))


def test_wavefront_compaction_matches():
    """Production mode (exact=False, dead-tail compaction + per-pixel
    banking): identical per-path radiance; only float-sum association
    differs."""
    scene, camera = _bvh_scene()
    cam = camera.constants(jnp.float32)
    img_c, st = wavefront.render_sorted(scene, camera, seed=3,
                                        interpret=True, use_bvh=True,
                                        exact=False)
    pid = jnp.arange(24 * 24, dtype=jnp.int32)
    direct, nr = grad_mod.radiance_mean_rays(
        scene, cam, pid, jnp.uint32(3), 4, 4, sample_chunk=4)
    d = np.asarray(direct).reshape(24, 24, 3)
    np.testing.assert_allclose(img_c, d, rtol=3e-6, atol=3e-7)
    assert st.rays == int(float(nr))


def test_wavefront_exact_compaction_bitwise(monkeypatch):
    """exact=True WITH compaction: dropped lanes retain their radiance and
    rejoin the one original-order reduction, so aggressive compaction is
    bitwise-invisible. Forced by compacting whenever any lane is dead."""
    scene, camera = _bvh_scene()
    cam = camera.constants(jnp.float32)
    monkeypatch.setattr(wavefront, "COMPACT_BELOW", 1.01)
    monkeypatch.setattr(wavefront, "SEG_BOUNCES", 2)
    img_c, st = wavefront.render_sorted(scene, camera, seed=3, max_depth=8,
                                        interpret=True, use_bvh=True,
                                        exact=True)
    pid = jnp.arange(24 * 24, dtype=jnp.int32)
    direct, nr = grad_mod.radiance_mean_rays(
        scene, cam, pid, jnp.uint32(3), 4, 8, sample_chunk=4)
    d = np.asarray(direct).reshape(24, 24, 3)
    np.testing.assert_array_equal(np.asarray(img_c, np.float32),
                                  np.asarray(d, np.float32))
    assert st.rays == int(float(nr))


def test_wavefront_spp_chunking_and_depth_exit():
    """Multi-chunk spp path + early exit when every lane dies before the
    depth budget (black background kills misses immediately)."""
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    b.add_quad((-1, -1, 2), (2, 0, 0), (0, 2, 0), b.diffuse_light((3, 2, 1)))
    scene = compile_scene(b)
    camera = Camera.create(RenderSettings(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=4, max_depth=8,
        vfov=60.0, look_from=(0, 0, 0), look_at=(0, 0, 2)))
    old = wavefront.WAVEFRONT_LANE_BUDGET
    wavefront.WAVEFRONT_LANE_BUDGET = 16 * 16 * 2  # force 2 chunks
    try:
        img, st = wavefront.render_sorted(scene, camera, seed=1,
                                          interpret=True, use_bvh=True)
    finally:
        wavefront.WAVEFRONT_LANE_BUDGET = old
    pid = jnp.arange(16 * 16, dtype=jnp.int32)
    direct, nr = grad_mod.radiance_mean_rays(
        scene, camera.constants(jnp.float32), pid, jnp.uint32(1), 4, 8,
        sample_chunk=2)
    np.testing.assert_array_equal(np.asarray(img, np.float32).reshape(-1, 3),
                                  np.asarray(direct))
