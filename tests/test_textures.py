"""Texture evaluation vs reference semantics (src/texture.rs, src/perlin.rs)."""

import numpy as np
import jax.numpy as jnp

from rust_tracing_tpu import SceneBuilder, compile_scene
from rust_tracing_tpu.ops import perlin as perlin_ops
from rust_tracing_tpu.ops.textures import texture_value
from rust_tracing_tpu.utils import color as color_util

import oracles


def _tv(scene, tid, u, v, p):
    n = len(p)
    return np.asarray(texture_value(
        scene, jnp.full((n,), tid, jnp.int32),
        jnp.asarray(u, jnp.float64), jnp.asarray(v, jnp.float64),
        jnp.asarray(p, jnp.float64)))


def test_solid():
    b = SceneBuilder()
    tid = b.solid_texture((0.1, 0.2, 0.3))
    b.add_sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = compile_scene(b, dtype=jnp.float64)
    got = _tv(scene, tid, [0.5], [0.5], [[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(got, [[0.1, 0.2, 0.3]], rtol=1e-12)


def test_checker_world_space_parity(rng):
    # texture.rs:59-70: parity of floor(p/scale) summed over xyz
    b = SceneBuilder()
    tid = b.checker_texture(0.32, (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    b.add_sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = compile_scene(b, dtype=jnp.float64)
    p = rng.uniform(-10, 10, (200, 3))
    got = _tv(scene, tid, np.zeros(200), np.zeros(200), p)
    inv = 1.0 / 0.32
    parity = (np.floor(inv * p).astype(int).sum(-1)) % 2
    want = np.where(parity[:, None] == 0, [[1.0, 0, 0]], [[0, 1.0, 0]])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_image_nearest_vflip_clamp_gamma():
    # texture.rs:83-93 + color.rs:21-27
    img = np.zeros((2, 4, 3), np.uint8)
    img[0, 0] = [255, 0, 0]     # top-left
    img[1, 3] = [0, 0, 255]     # bottom-right
    img[0, 3] = [0, 255, 0]
    b = SceneBuilder()
    tid = b.image_texture(img)
    b.add_sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = compile_scene(b, dtype=jnp.float64)
    p = np.zeros((4, 3))
    # v flipped: v=1 -> top row; u clamped
    got = _tv(scene, tid, [0.0, 1.0, 2.0, -1.0], [1.0, 0.0, 1.0, 0.0], p)
    lin = color_util.rgb8_to_color(np.array([255], np.uint8))[0]
    np.testing.assert_allclose(got[0], [lin, 0, 0], rtol=1e-5)   # u=0,v=1 top-left
    np.testing.assert_allclose(got[1], [0, 0, lin], rtol=1e-5)   # u=1,v=0 bottom-right
    np.testing.assert_allclose(got[2], [0, lin, 0], rtol=1e-5)   # u clamp -> top-right
    np.testing.assert_allclose(got[3], [0, 0, 0], atol=1e-7)     # u clamp -> bottom-left


def test_perlin_noise_vs_oracle(rng):
    ranvec, px, py, pz = perlin_ops.make_tables(seed=0)
    pts = rng.uniform(-20, 20, (64, 3))
    got = np.asarray(perlin_ops.noise(
        jnp.asarray(ranvec), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        jnp.asarray(pts)))
    want = np.array([oracles.perlin_noise(ranvec, px, py, pz, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_turbulence_vs_oracle(rng):
    ranvec, px, py, pz = perlin_ops.make_tables(seed=0)
    pts = rng.uniform(-5, 5, (16, 3))
    got = np.asarray(perlin_ops.turbulence(
        jnp.asarray(ranvec), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        jnp.asarray(pts), depth=7))
    want = np.array([oracles.perlin_turbulence(ranvec, px, py, pz, p, 7) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    assert (got >= 0).all()


def test_marble_formula(rng):
    # texture.rs:107-111: sin(scale*z + 10*turb(p,7))*0.5+0.5, gray splat
    b = SceneBuilder()
    tid = b.noise_texture(4.0)
    b.add_sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = compile_scene(b, dtype=jnp.float64)
    ranvec, px, py, pz = perlin_ops.make_tables(seed=0)
    pts = rng.uniform(-3, 3, (32, 3))
    got = _tv(scene, tid, np.zeros(32), np.zeros(32), pts)
    turb = np.array([oracles.perlin_turbulence(ranvec, px, py, pz, p, 7) for p in pts])
    want = np.sin(4.0 * pts[:, 2] + 10.0 * turb) * 0.5 + 0.5
    np.testing.assert_allclose(got, np.tile(want[:, None], (1, 3)), rtol=1e-7)


def test_checker_with_nested_noise_child(rng):
    b = SceneBuilder()
    noise_id = b.noise_texture(2.0)
    tid = b.checker_texture(1.0, noise_id, (0.0, 0.0, 1.0))
    b.add_sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = compile_scene(b, dtype=jnp.float64)
    pts = rng.uniform(-4, 4, (64, 3))
    got = _tv(scene, tid, np.zeros(64), np.zeros(64), pts)
    parity = (np.floor(pts).astype(int).sum(-1)) % 2
    ranvec, px, py, pz = perlin_ops.make_tables(seed=0)
    for i in range(64):
        if parity[i] == 0:
            turb = oracles.perlin_turbulence(ranvec, px, py, pz, pts[i], 7)
            want = np.sin(2.0 * pts[i, 2] + 10.0 * turb) * 0.5 + 0.5
            np.testing.assert_allclose(got[i], [want] * 3, rtol=1e-7)
        else:
            np.testing.assert_allclose(got[i], [0, 0, 1.0], atol=1e-12)
