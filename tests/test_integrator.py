"""Wavefront integrator semantics (reference: src/renderer.rs:139-155)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rust_tracing_tpu import (Camera, RenderSettings, SceneBuilder,
                              compile_scene, render)
from rust_tracing_tpu.ops import integrator


def _trace_one(scene, o, d, depth, seed=0, dtype=jnp.float64):
    o = jnp.asarray(o, dtype).reshape(1, 3)
    d = jnp.asarray(d, dtype).reshape(1, 3)
    rad, nb = integrator.trace(scene, o, d, jnp.zeros(1, dtype),
                               (seed, jnp.zeros(1, jnp.int32), 0), depth)
    return np.asarray(rad)[0], int(nb[0])


def test_miss_returns_background():
    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    b.add_sphere((0, 0, -100), 1.0, b.lambertian((1, 1, 1)))
    scene = compile_scene(b, dtype=jnp.float64)
    rad, nb = _trace_one(scene, (0, 0, 0), (0, 0, 1), depth=8)
    np.testing.assert_allclose(rad, [0.7, 0.8, 1.0], rtol=1e-12)
    assert nb == 1


def test_depth_zero_is_black():
    b = SceneBuilder(background=(1, 1, 1))
    scene = compile_scene(b, dtype=jnp.float64)
    rad, _ = _trace_one(scene, (0, 0, 0), (0, 0, 1), depth=0)
    np.testing.assert_allclose(rad, 0.0, atol=1e-12)


def test_emitter_direct():
    # renderer.rs:145-150: hit emitter -> emission, recursion stops
    b = SceneBuilder(background=(0, 0, 0))
    b.add_sphere((0, 0, 5), 1.0, b.diffuse_light((2.0, 3.0, 4.0)))
    scene = compile_scene(b, dtype=jnp.float64)
    rad, nb = _trace_one(scene, (0, 0, 0), (0, 0, 1), depth=8)
    np.testing.assert_allclose(rad, [2.0, 3.0, 4.0], rtol=1e-12)
    assert nb == 1


def test_throughput_product():
    # lambertian bounce then emitter: L = albedo * E exactly when every
    # scattered ray still reaches the emitter (enclosing light sphere)
    b = SceneBuilder(background=(0, 0, 0))
    b.add_sphere((0, 0, 0), 1.0, b.lambertian((0.5, 0.25, 1.0)))
    b.add_sphere((0, 0, 0), 50.0, b.diffuse_light((1.0, 1.0, 1.0)))
    scene = compile_scene(b, dtype=jnp.float64)
    # camera inside the big light sphere, ray at the small sphere
    rads = []
    for seed in range(64):
        rad, _ = _trace_one(scene, (0, 0, -3), (0, 0, 1), depth=4, seed=seed)
        rads.append(rad)
    rads = np.stack(rads)
    np.testing.assert_allclose(rads, np.tile([[0.5, 0.25, 1.0]], (64, 1)),
                               rtol=1e-9)


def test_depth_exhaustion_black():
    # mirror box ping-pong: depth runs out -> contributes black (renderer.rs:140)
    b = SceneBuilder(background=(9, 9, 9))
    b.add_quad((-1, -1, 0), (2, 0, 0), (0, 2, 0), b.metal((1, 1, 1), 0.0))
    b.add_quad((-1, -1, 4), (2, 0, 0), (0, 2, 0), b.metal((1, 1, 1), 0.0))
    scene = compile_scene(b, dtype=jnp.float64)
    rad, nb = _trace_one(scene, (0, 0, 1), (0, 0, 1), depth=6)
    np.testing.assert_allclose(rad, 0.0, atol=1e-12)
    assert nb == 6


def test_render_background_only():
    b = SceneBuilder(background=(0.2, 0.4, 0.6))
    scene = compile_scene(b, dtype=jnp.float32)
    cam = Camera.create(RenderSettings(
        image_width=16, aspect_ratio=2.0, samples_per_pixel=4, max_depth=3,
        background=(0.2, 0.4, 0.6)))
    img, stats = render(scene, cam)
    assert img.shape == (8, 16, 3)
    np.testing.assert_allclose(img, np.broadcast_to([0.2, 0.4, 0.6], img.shape),
                               rtol=1e-5)


def test_render_deterministic_under_seed():
    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    b.add_sphere((0, -1000.5, 0), 1000.0, b.lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, 0), 0.5, b.metal((0.9, 0.9, 0.9), 0.1))
    scene = compile_scene(b, dtype=jnp.float32)
    cam = Camera.create(RenderSettings(
        image_width=32, samples_per_pixel=8, max_depth=4,
        vfov=40.0, look_from=(0, 0.5, 3), look_at=(0, 0, 0),
        background=(0.7, 0.8, 1.0)))
    img1, _ = render(scene, cam, seed=7)
    img2, _ = render(scene, cam, seed=7)
    img3, _ = render(scene, cam, seed=8)
    np.testing.assert_array_equal(img1, img2)
    assert np.abs(img1 - img3).max() > 0  # different seed, different noise


def test_progressive_mean_matches_batch():
    from rust_tracing_tpu import progressive_init, progressive_step
    b = SceneBuilder(background=(0.3, 0.3, 0.3))
    b.add_sphere((0, 0, -3), 1.0, b.lambertian((0.8, 0.2, 0.2)))
    scene = compile_scene(b, dtype=jnp.float32)
    cam = Camera.create(RenderSettings(
        image_width=24, samples_per_pixel=100, max_depth=3,
        look_from=(0, 0, 1), look_at=(0, 0, -3), background=(0.3, 0.3, 0.3)))
    state = progressive_init(cam, seed=0)
    for _ in range(4):
        state = progressive_step(scene, cam, state, samples=2)
    assert state.num_samples == 8
    img, _ = render(scene, cam, spp=64, seed=123)
    # same scene statistics within MC noise
    assert abs(state.accum.mean() - img.mean()) < 0.05
