"""Differentiability gate: autodiff pixel gradients vs finite differences
(BASELINE.json metric; SURVEY.md §7 build plan stage 4)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene
from rust_tracing_tpu import grad as grad_mod


def _mini_cornell():
    """Small closed-ish box with a light and a test sphere.

    NB with fixed RNG and *solid* albedos everywhere, radiance is piecewise
    constant in pure geometry parameters (throughput is a product of
    constants), so interior gradients w.r.t. centers/radii would be honestly
    zero. Spatially-varying textures (checker floor, marble wall) open the
    continuous channel geometry -> hit point -> texture value that makes
    geometry gradients nonzero — and finite differences agree.
    """
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    marble = b.lambertian(b.noise_texture(2.0))
    checker = b.lambertian(b.checker_texture(0.5, (0.8, 0.8, 0.2), (0.1, 0.1, 0.4)))
    red = b.lambertian((0.65, 0.05, 0.05))
    b.add_quad((-2, -2, 4), (4, 0, 0), (0, 4, 0), marble)     # back wall
    b.add_quad((-2, -2, 0), (0, 0, 4), (0, 4, 0), red)        # left wall
    b.add_quad((-2, -2, 0), (4, 0, 0), (0, 0, 4), checker)    # floor
    b.add_quad((-1, 1.9, 1), (2, 0, 0), (0, 0, 2), b.diffuse_light((6, 6, 6)))
    b.add_sphere((0.3, -1.2, 2.0), 0.8, b.lambertian(b.noise_texture(3.0)))
    settings = RenderSettings(
        aspect_ratio=1.0, image_width=24, samples_per_pixel=32, max_depth=4,
        vfov=60.0, look_from=(0.0, 0.0, -3.0), look_at=(0.0, 0.0, 2.0),
        background=(0.0, 0.0, 0.0),
    )
    return b, settings


def _loss_for(scene, camera, seed=3):
    loss_fn = lambda img, pid: jnp.mean(img)
    return grad_mod.loss_and_grad(scene, camera, loss_fn, seed=seed,
                                  dtype=jnp.float64)


def _render(scene, camera, seed=3):
    cam = camera.constants(jnp.float64)
    pid = jnp.arange(camera.image_width * camera.image_height, dtype=jnp.int32)
    key = jnp.uint32(seed)
    return np.asarray(grad_mod.radiance_mean(
        scene, cam, pid, key, camera.samples_per_pixel, camera.max_depth))


def _masked_fd_vs_ad(scene, camera, field, index, eps, seed=3):
    """Interior-gradient comparison (SURVEY.md §7 'gradients through discrete
    events'): the fixed-RNG estimator is piecewise smooth — a parameter step
    flips discrete decisions (silhouette hit/miss, material branch, Schlick
    coin) on a sparse set of pixels, each flip an O(1/spp) jump that dominates
    the O(eps) interior change and that autodiff deliberately excludes
    (detached-discrete). Detect flipped pixels by their jump magnitude
    (> 30*eps while interior deltas are ~eps*grad) and compare FD vs AD of the
    mean over the surviving interior pixels only."""
    arr = np.asarray(getattr(scene, field)).copy()
    arr_p, arr_m = arr.copy(), arr.copy()
    arr_p[index] += eps
    arr_m[index] -= eps
    img_p = _render(dataclasses.replace(scene, **{field: jnp.asarray(arr_p)}),
                    camera, seed)
    img_m = _render(dataclasses.replace(scene, **{field: jnp.asarray(arr_m)}),
                    camera, seed)
    jump = np.abs(img_p - img_m).max(-1) > 30 * eps
    mask = jnp.asarray(~jump, jnp.float64)
    n_keep = int(mask.sum())
    # the flipped set must be sparse, else the mask hides a broken gradient
    assert n_keep >= 0.95 * jump.size, f"too many boundary pixels: {n_keep}"
    fd = float(((img_p - img_m) / (2 * eps))[~jump].mean())
    loss_fn = lambda img, pid: jnp.sum(img * mask[:, None]) / (n_keep * 3)
    _, g = grad_mod.loss_and_grad(scene, camera, loss_fn, seed=seed,
                                  dtype=jnp.float64)
    ad = float(np.asarray(getattr(g, field))[index])
    return fd, ad


@pytest.fixture(scope="module")
def setup():
    b, settings = _mini_cornell()
    scene = compile_scene(b, dtype=jnp.float64)
    camera = Camera.create(settings)
    loss, g = _loss_for(scene, camera)
    return scene, camera, float(loss), g


def test_grads_finite_and_nonzero(setup):
    scene, camera, loss, g = setup
    assert np.isfinite(loss) and loss > 0
    for field in ("sph_center", "sph_radius", "tex_rgb", "quad_q",
                  "mat_albedo", "mat_fuzz", "med_neg_inv_density"):
        arr = np.asarray(getattr(g, field))
        assert np.isfinite(arr).all(), f"non-finite grad in {field}"
    # the visible sphere's parameters must actually receive gradient
    assert np.abs(np.asarray(g.sph_center)[0]).max() > 0
    assert abs(np.asarray(g.sph_radius)[0]) > 0
    assert np.abs(np.asarray(g.tex_rgb)).max() > 0


@pytest.mark.parametrize("field,index,eps", [
    ("sph_radius", (0,), 1e-5),
    ("sph_center", (0, 0), 1e-5),
    ("sph_center", (0, 2), 1e-5),
    ("tex_rgb", (1, 0), 1e-5),        # checker even color red channel
    ("tex_rgb", (5, 0), 1e-5),        # light red channel
    ("tex_noise_scale", (0,), 1e-5),  # marble frequency (texture param)
])
def test_autodiff_matches_finite_differences(setup, field, index, eps):
    scene, camera, _, _ = setup
    fd, ad = _masked_fd_vs_ad(scene, camera, field, index, eps)
    assert np.isfinite(fd) and np.isfinite(ad)
    tol = max(0.03 * max(abs(fd), abs(ad)), 1e-7)
    assert abs(fd - ad) <= tol, f"{field}{index}: fd={fd:.3e} ad={ad:.3e}"


def test_fit_recovers_albedo():
    # inverse rendering: perturb the sphere albedo, fit it back to the target
    b, settings = _mini_cornell()
    settings = dataclasses.replace(settings, image_width=16, samples_per_pixel=8)
    scene0 = compile_scene(b, dtype=jnp.float64)
    camera = Camera.create(settings)
    cam = camera.constants(jnp.float64)
    pid = jnp.arange(16 * 16, dtype=jnp.int32)
    key = jnp.uint32(0)
    # same (seed, spp) as the fit below -> identical estimator, zero loss at truth
    target = grad_mod.radiance_mean(scene0, cam, pid, key, 8, 4)

    wrong = np.asarray(scene0.tex_rgb).copy()
    true_albedo = wrong[1].copy()  # checker even color
    wrong[1] = [0.2, 0.2, 0.9]
    scene = dataclasses.replace(scene0, tex_rgb=jnp.asarray(wrong))

    scene, losses = grad_mod.fit_scene(
        scene, camera, np.asarray(target).reshape(16, 16, 3), steps=40,
        learning_rates={"tex_rgb": 6.0}, spp=8, max_depth=4, seed=0,
        resample=False)
    # gradient correctness is covered by the FD tests; this demonstrates the
    # inverse-rendering loop actually optimizes: loss halves and the albedo
    # moves most of the way back to the truth
    assert losses[-1] < losses[0] * 0.5
    got = np.asarray(scene.tex_rgb)[1]
    err0 = np.abs(np.array([0.2, 0.2, 0.9]) - true_albedo).max()
    assert np.abs(got - true_albedo).max() < 0.5 * err0


def test_jacfwd_through_textured_scene(setup):
    """Forward-mode parity (VERDICT r3 missing #4): tgather is a primitive
    with an explicit jvp rule, so jax.jacfwd works through the full replay
    path — checked against reverse mode (jacrev), which uses the custom
    dense-reduce transpose."""
    scene, camera, _, _ = setup
    cam = camera.constants(jnp.float64)
    pid = 24 * 12 + jnp.arange(24, dtype=jnp.int32)  # middle pixel row
    key = jnp.uint32(3)
    recs = grad_mod.get_records(scene, camera, 3, 4, 3, pixel_ids=pid,
                                dtype=jnp.float64)

    def f(tex_rgb):
        s = dataclasses.replace(scene, tex_rgb=tex_rgb)
        img, _ = grad_mod.radiance_mean_replay_rays(s, cam, pid, key, recs,
                                                    4, 3)
        return jnp.mean(img, axis=-1)  # (24,)

    j_fwd = np.asarray(jax.jacfwd(f)(scene.tex_rgb))
    j_rev = np.asarray(jax.jacrev(f)(scene.tex_rgb))
    assert np.isfinite(j_fwd).all()
    assert np.abs(j_fwd).max() > 0
    np.testing.assert_allclose(j_fwd, j_rev, rtol=1e-10, atol=1e-12)


def test_linear_loss_probe_rejects_nonlinear():
    """linear_loss=True with a nonlinear loss must fail loudly (ADVICE r3):
    the probe catches it before any rendering happens."""
    b, settings = _mini_cornell()
    settings = dataclasses.replace(settings, image_width=8,
                                   samples_per_pixel=2)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    l2 = lambda img, pid: jnp.mean(img ** 2)
    with pytest.raises(ValueError, match="linearity probe"):
        grad_mod.loss_and_grad(scene, camera, l2, spp=2, max_depth=2,
                               linear_loss=True)
    # affine losses pass the probe
    lin = lambda img, pid: jnp.mean(img) * 3.0 + 1.0
    loss, g = grad_mod.loss_and_grad(scene, camera, lin, spp=2, max_depth=2,
                                     linear_loss=True)
    assert np.isfinite(float(loss))
