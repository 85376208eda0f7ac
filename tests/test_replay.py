"""Record/replay differentiable pipeline (ops/replay.py + the Pallas
recorder): the hit search runs once, detached; the differentiable pass
replays recorded winners with O(rays) work. Contract: bit-identical to the
direct path — same RNG addresses, same winners, same estimator."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import Camera, compile_scene
from rust_tracing_tpu import grad as gm
from rust_tracing_tpu.models import builders
from rust_tracing_tpu.ops import megakernel, replay


def _cornell(width=24, spp=4, depth=4):
    b, settings = builders.cornell_box()
    settings = dataclasses.replace(settings, image_width=width,
                                   samples_per_pixel=spp, max_depth=depth)
    return compile_scene(b), Camera.create(settings)


def _smoke(width=20, spp=4, depth=4):
    b, settings = builders.cornell_smoke()
    settings = dataclasses.replace(settings, image_width=width,
                                   samples_per_pixel=spp, max_depth=depth)
    return compile_scene(b), Camera.create(settings)


@pytest.mark.parametrize("mk", [_cornell, _smoke], ids=["cornell", "smoke"])
def test_replay_equals_direct(mk):
    scene, camera = mk()
    cam = camera.constants(jnp.float32)
    n = camera.image_width * camera.image_height
    pid = jnp.arange(n, dtype=jnp.int32)
    seed = jnp.uint32(5)
    recs = replay.records_xla(scene, cam, pid, seed, 4, 4)
    img_rep, nr_rep = gm.radiance_mean_replay_rays(scene, cam, pid, seed,
                                                   recs, 4, 4)
    img_dir, nr_dir = gm.radiance_mean_rays(scene, cam, pid, seed, 4, 4)
    np.testing.assert_array_equal(np.asarray(img_rep), np.asarray(img_dir))
    assert float(nr_rep) == float(nr_dir)


def test_replay_gradients_equal_direct():
    scene, camera = _cornell()
    loss_fn = lambda im, p: jnp.mean(im * jnp.asarray([1.0, 2.0, 0.5]))
    l1, g1 = gm.loss_and_grad(scene, camera, loss_fn, seed=5, spp=4,
                              max_depth=4, use_recorder=False)
    l2, g2 = gm.loss_and_grad(scene, camera, loss_fn, seed=5, spp=4,
                              max_depth=4, use_recorder=True)
    assert float(l1) == float(l2)
    for f in ("tex_rgb", "mat_albedo", "sph_center", "quad_u"):
        np.testing.assert_array_equal(np.asarray(getattr(g1, f)),
                                      np.asarray(getattr(g2, f)))


def test_chunked_grad_accumulation_matches_single_shot(monkeypatch):
    """The two-pass gradient accumulator (record budget exceeded -> per-slice
    VJPs with the loss cotangent) must equal the single-shot gradient up to
    float-sum association of the slice partition."""
    scene, camera = _cornell(spp=8)
    loss_fn = lambda im, p: jnp.mean((im - 0.25) ** 2)
    l1, g1 = gm.loss_and_grad(scene, camera, loss_fn, seed=3, spp=8,
                              max_depth=4, use_recorder=True)
    # force slicing: budget below one sample's records
    monkeypatch.setattr(gm, "RECORD_BUDGET_ENTRIES",
                        3 * 4 * camera.image_width * camera.image_height)
    l2, g2 = gm.loss_and_grad(scene, camera, loss_fn, seed=3, spp=8,
                              max_depth=4, use_recorder=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for f in ("tex_rgb", "mat_albedo", "sph_center", "quad_u"):
        np.testing.assert_allclose(np.asarray(getattr(g1, f)),
                                   np.asarray(getattr(g2, f)),
                                   rtol=2e-5, atol=1e-7)

    # linear_loss fast path (mean IS linear): same gradient, same loss
    loss_lin = lambda im, p: jnp.mean(im)
    l3, g3 = gm.loss_and_grad(scene, camera, loss_lin, seed=3, spp=8,
                              max_depth=4, use_recorder=True)
    l4, g4 = gm.loss_and_grad(scene, camera, loss_lin, seed=3, spp=8,
                              max_depth=4, use_recorder=True,
                              linear_loss=True)
    np.testing.assert_allclose(float(l3), float(l4), rtol=1e-6)
    for f in ("tex_rgb", "quad_u"):
        np.testing.assert_allclose(np.asarray(getattr(g3, f)),
                                   np.asarray(getattr(g4, f)),
                                   rtol=2e-5, atol=1e-7)


def test_kernel_recorder_matches_xla_records():
    scene, camera = _cornell(width=16, spp=3, depth=3)
    cam = camera.constants(jnp.float32)
    pid = jnp.arange(16 * 16, dtype=jnp.int32)
    recs_x = np.asarray(replay.records_xla(scene, cam, pid, jnp.uint32(7),
                                           3, 3))
    recs_k = megakernel.record_paths(scene, camera, 7, 3, 3, interpret=True)
    np.testing.assert_array_equal(recs_x, recs_k)


def test_replay_fd_gradient():
    """Finite differences of the REPLAY estimator (fixed records + fixed RNG)
    match its autodiff gradient. The scene must have a SMOOTH dependence on
    the perturbed parameter — the Perlin marble texture gives one (solid
    colors and checker parity are piecewise-constant, legitimately zero-
    gradient almost everywhere)."""
    import jax

    b, settings = builders.two_perlin_spheres()
    settings = dataclasses.replace(settings, image_width=16,
                                   samples_per_pixel=4, max_depth=3)
    # f64 + tiny eps: the 7-octave turbulence oscillates at ~0.01-unit scale,
    # so the FD step must sit well inside the highest octave (verified to
    # converge: fd(1e-6) agrees with autodiff to 4 digits, fd(1e-3) does not
    # even get the sign right — the estimator is that wiggly, not wrong).
    scene = compile_scene(b, dtype=jnp.float64)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float64)
    pid = jnp.arange(16 * 9, dtype=jnp.int32)
    seed = jnp.uint32(1)
    recs = replay.records_xla(scene, cam, pid, seed, 4, 3)

    def f(dy):
        dy = jnp.float64(dy)
        s2 = dataclasses.replace(
            scene, sph_center=scene.sph_center + jnp.stack(
                [jnp.zeros_like(dy), dy, jnp.zeros_like(dy)]))
        img, _ = gm.radiance_mean_replay_rays(s2, cam, pid, seed, recs, 4, 3)
        return jnp.sum(img)

    g = float(jax.grad(f)(jnp.float64(0.0)))
    eps = 1e-5
    fd = (float(f(eps)) - float(f(-eps))) / (2 * eps)
    assert abs(fd) > 1e-3, "perturbation should be smooth and nonzero"
    assert abs(g - fd) < 0.02 * abs(fd) + 1e-3, (g, fd)
