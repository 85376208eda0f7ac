"""Multi-device sharding on the 8-virtual-CPU mesh (SURVEY.md §4: the 'fake
backend' the reference lacks): sharded render == single-device render,
psum'd distributed gradients == single-device gradients."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene
from rust_tracing_tpu import grad as grad_mod
from rust_tracing_tpu.parallel import mesh as mesh_mod
from rust_tracing_tpu.parallel import render_dist


def _scene():
    b = SceneBuilder(background=(0.6, 0.7, 1.0))
    b.add_sphere((0, -100.5, -2), 100.0,
                 b.lambertian(b.checker_texture(0.4, (0.8, 0.7, 0.2), (0.2, 0.3, 0.7))))
    b.add_sphere((0, 0, -2), 0.5, b.metal((0.9, 0.8, 0.7), 0.05))
    b.add_sphere((-1.1, 0, -2), 0.5, b.lambertian(b.noise_texture(3.0)))
    settings = RenderSettings(
        aspect_ratio=1.0, image_width=16, samples_per_pixel=8, max_depth=4,
        vfov=60.0, look_from=(0, 0, 1), look_at=(0, 0, -2),
        background=(0.6, 0.7, 1.0))
    return compile_scene(b, dtype=jnp.float32), Camera.create(settings)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("sample_par", [1, 2, 4])
def test_sharded_render_matches_single_device(sample_par):
    """RNG is addressed by (seed, pixel, sample) — mesh coordinates never
    enter it — so any mesh shape renders the SAME samples as one device.
    rays-only sharding is bitwise identical; splitting the sample axis changes
    only the float summation tree (psum of partial sums), so the bound is
    float associativity, not Monte-Carlo noise."""
    scene, camera = _scene()
    mesh8 = mesh_mod.make_mesh(sample_parallelism=sample_par)
    mesh1 = mesh_mod.make_mesh(jax.devices()[:1])
    img8 = render_dist.render_distributed(scene, camera, mesh8, seed=5)
    img1 = render_dist.render_distributed(scene, camera, mesh1, seed=5)
    assert img8.shape == img1.shape
    if sample_par == 1:
        np.testing.assert_array_equal(img8, img1)
    else:
        np.testing.assert_allclose(img8, img1, rtol=3e-6, atol=3e-7)


def test_sharded_render_deterministic():
    scene, camera = _scene()
    mesh8 = mesh_mod.make_mesh(sample_parallelism=2)
    a = render_dist.render_distributed(scene, camera, mesh8, seed=3)
    b = render_dist.render_distributed(scene, camera, mesh8, seed=3)
    np.testing.assert_array_equal(a, b)


def test_distributed_grads_match_psum_identity():
    """Distributed train-step gradient == the same computation on a 1-device
    mesh (exactness of the psum decomposition, not just statistics)."""
    scene, camera = _scene()
    cam = camera.constants(jnp.float32)
    n_pix = camera.image_width * camera.image_height

    results = {}
    for sp, devs in ((2, None), (1, jax.devices()[:1])):
        mesh = mesh_mod.make_mesh(devs, sample_parallelism=sp)
        n_padded = mesh_mod.pad_pixels(n_pix, mesh)
        pixel_ids = jnp.minimum(jnp.arange(n_padded, dtype=jnp.int32), n_pix - 1)
        target = jnp.zeros((n_padded, 3), jnp.float32)
        step = render_dist.make_distributed_train_step(
            mesh, spp=4, max_depth=3, learning_rate=0.1)
        new_scene, loss = step(scene, cam, pixel_ids, target,
                               jnp.uint32(0))
        results[sp] = (new_scene, float(loss))

    # Mesh shape never enters the RNG: the 8-device and 1-device steps compute
    # the same estimator on the same samples; only float-sum association
    # differs (psum trees + the reverse-mode transpose of the sample split).
    assert np.isfinite(results[2][1]) and np.isfinite(results[1][1])
    np.testing.assert_allclose(results[2][1], results[1][1], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(results[2][0].tex_rgb),
                               np.asarray(results[1][0].tex_rgb),
                               rtol=1e-3, atol=1e-6)

    # and the update must have moved the differentiable leaves
    moved = np.abs(np.asarray(results[2][0].tex_rgb) -
                   np.asarray(scene.tex_rgb)).max()
    assert moved > 0


def test_sharded_megakernel_matches_single():
    """The SPMD megakernel (per-device tile ranges + sample-axis psum) must
    reproduce the single-device megakernel: RNG is (seed, pixel, sample)-
    addressed so tiles and sample ranges shard without changing any sample.
    Interpret mode on the CPU mesh — the same program shards over real chips."""
    from rust_tracing_tpu.ops import megakernel as mk

    b, settings = (__import__("rust_tracing_tpu.models.builders",
                              fromlist=["cornell_box"]).cornell_box())
    settings = dataclasses.replace(settings, image_width=64,
                                   samples_per_pixel=4, max_depth=3)
    scene = compile_scene(b, dtype=jnp.float32)
    camera = Camera.create(settings)

    img1, n1 = mk.render_fast(scene, camera, interpret=True, with_stats=True)

    # rays-only mesh: same sample set per pixel -> bitwise equality
    mesh_r = mesh_mod.make_mesh()
    img_r, n_r = mk.render_fast_sharded(scene, camera, mesh_r, interpret=True,
                                        with_stats=True)
    np.testing.assert_array_equal(img1, img_r)
    assert n1 == n_r

    # sample-split mesh: psum of equal-spp means; float-associativity bound
    mesh_s = mesh_mod.make_mesh(sample_parallelism=2)
    img_s, n_s = mk.render_fast_sharded(scene, camera, mesh_s, interpret=True,
                                        with_stats=True)
    np.testing.assert_allclose(img_s, img1, rtol=3e-6, atol=3e-7)
    assert n1 == n_s


def test_distributed_train_reduces_loss():
    scene, camera = _scene()
    cam = camera.constants(jnp.float32)
    mesh = mesh_mod.make_mesh(sample_parallelism=2)
    n_pix = camera.image_width * camera.image_height
    n_padded = mesh_mod.pad_pixels(n_pix, mesh)
    pixel_ids = jnp.minimum(jnp.arange(n_padded, dtype=jnp.int32), n_pix - 1)

    # target: render of the true scene; start: perturbed checker color
    render_fn = render_dist.make_distributed_renderer(mesh, spp=4, max_depth=3)
    target = render_fn(scene, cam, pixel_ids, jnp.uint32(0))

    wrong = np.asarray(scene.tex_rgb).copy()
    wrong[1] = [0.1, 0.1, 0.9]
    bad = dataclasses.replace(scene, tex_rgb=jnp.asarray(wrong))

    step = render_dist.make_distributed_train_step(
        mesh, spp=4, max_depth=3, learning_rate=0.016, trainable=("tex_rgb",))
    losses = []
    s = bad
    for i in range(6):
        s, loss = step(s, cam, pixel_ids, target, jnp.uint32(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1


# ---------------------------------------------------------------------------
# Distributed record/replay gradient pipeline (parallel/grad_dist.py):
# the production training path — sharded recorder + per-shard replay VJP +
# psum'd parameter gradients.
# ---------------------------------------------------------------------------

def _replay_setup():
    from rust_tracing_tpu.parallel import grad_dist

    scene, camera = _scene()
    # target from an independent render so the loss/gradient are nontrivial
    img1, _ = __import__("rust_tracing_tpu").render(
        scene, camera, seed=99, spp=4, max_depth=3)
    return grad_dist, scene, camera, np.asarray(img1)


@pytest.mark.parametrize("sample_par,recorder", [
    (1, "xla"), (2, "xla"), (1, "kernel"), (2, "kernel"),
])
def test_replay_loss_and_grad_matches_single_chip(sample_par, recorder):
    """Distributed replay loss_and_grad == single-chip loss_and_grad on the
    SAME loss (SSE over real pixels): mesh coordinates never enter the RNG,
    records are identical per (pixel, sample), so the only tolerance is
    float-sum association across the mesh partition (VERDICT r3 item #1)."""
    grad_dist, scene, camera, target = _replay_setup()

    mesh = mesh_mod.make_mesh(sample_parallelism=sample_par)
    loss_d, g_d, nrays_d = grad_dist.replay_loss_and_grad(
        scene, camera, mesh, target, seed=7, spp=8, max_depth=3,
        recorder=recorder, interpret=(recorder == "kernel"))

    # single-chip reference: the SAME estimator through grad.loss_and_grad
    t_flat = jnp.asarray(target.reshape(-1, 3), jnp.float32)
    loss_fn = lambda img, pid: jnp.sum((img - t_flat) ** 2)
    loss_1, g_1, nrays_1 = grad_mod.loss_and_grad(
        scene, camera, loss_fn, seed=7, spp=8, max_depth=3,
        use_recorder=True, with_rays=True)

    assert np.isfinite(float(loss_d))
    np.testing.assert_allclose(float(loss_d), float(loss_1), rtol=2e-5)
    # ray accounting: same scene queries (padding lanes excluded is not
    # guaranteed — clamped duplicate lanes also trace — so allow >=)
    assert nrays_d >= nrays_1 * 0.99
    for field in ("tex_rgb", "sph_center", "sph_radius", "mat_albedo",
                  "mat_fuzz", "background"):
        a = np.asarray(getattr(g_d, field), np.float64)
        b = np.asarray(getattr(g_1, field), np.float64)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-5 * scale,
                                   err_msg=field)
    assert np.abs(np.asarray(g_d.tex_rgb)).max() > 0


def test_replay_train_step_reduces_loss():
    from rust_tracing_tpu.parallel import grad_dist

    scene, camera = _scene()
    img, _ = __import__("rust_tracing_tpu").render(
        scene, camera, seed=0, spp=4, max_depth=3)

    wrong = np.asarray(scene.tex_rgb).copy()
    wrong[1] = [0.1, 0.1, 0.9]
    bad = dataclasses.replace(scene, tex_rgb=jnp.asarray(wrong))

    mesh = mesh_mod.make_mesh(sample_parallelism=2)
    step = grad_dist.make_replay_train_step(
        mesh, camera, spp=4, max_depth=3, learning_rate=0.004,
        trainable=("tex_rgb",), recorder="xla")
    losses = []
    s = bad
    for i in range(6):
        s, loss = step(s, np.asarray(img), seed=0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses
