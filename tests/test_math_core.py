"""L1 math core: linalg, RNG samplers, color conversion (SURVEY.md §2 #1-6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_tracing_tpu.ops import linalg as la
from rust_tracing_tpu.ops import rng as rrng
from rust_tracing_tpu.utils import color as color_util

import oracles


class TestLinalg:
    def test_dot_cross(self, rng):
        a = rng.normal(size=(100, 3))
        b = rng.normal(size=(100, 3))
        np.testing.assert_allclose(la.dot(jnp.asarray(a), jnp.asarray(b)),
                                   np.sum(a * b, -1), rtol=1e-6)
        np.testing.assert_allclose(la.cross(jnp.asarray(a), jnp.asarray(b)),
                                   np.cross(a, b), rtol=1e-5, atol=1e-6)

    def test_reflect(self, rng):
        v = rng.normal(size=(50, 3))
        n = rng.normal(size=(50, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        got = np.asarray(la.reflect(jnp.asarray(v), jnp.asarray(n)))
        want = np.stack([oracles.reflect(v[i], n[i]) for i in range(50)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_refract(self, rng):
        for _ in range(50):
            uv = rng.normal(size=3)
            uv /= np.linalg.norm(uv)
            n = rng.normal(size=3)
            n /= np.linalg.norm(n)
            if uv @ n > 0:
                n = -n
            eta = rng.uniform(0.5, 2.0)
            got = np.asarray(la.refract(jnp.asarray(uv), jnp.asarray(n), eta))
            np.testing.assert_allclose(got, oracles.refract(uv, n, eta),
                                       rtol=1e-5, atol=1e-6)


class TestRng:
    def test_unit_vector_on_sphere(self):
        v = np.asarray(rrng.random_unit_vector(jax.random.PRNGKey(0), (20000,)))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        # uniform on S^2: mean ~ 0, second moment = I/3
        assert np.abs(v.mean(0)).max() < 0.02
        np.testing.assert_allclose((v[:, :, None] * v[:, None, :]).mean(0),
                                   np.eye(3) / 3, atol=0.01)

    def test_in_unit_sphere_radius_law(self):
        v = np.asarray(rrng.random_in_unit_sphere(jax.random.PRNGKey(1), (20000,)))
        r = np.linalg.norm(v, axis=-1)
        assert r.max() <= 1.0
        # P(R <= r) = r^3 for uniform ball
        for q in (0.3, 0.6, 0.9):
            assert abs((r <= q).mean() - q**3) < 0.015

    def test_in_unit_disk(self):
        v = np.asarray(rrng.random_in_unit_disk(jax.random.PRNGKey(2), (20000,)))
        assert np.all(v[:, 2] == 0.0)
        r = np.linalg.norm(v[:, :2], axis=-1)
        assert r.max() <= 1.0
        for q in (0.3, 0.6, 0.9):
            assert abs((r <= q).mean() - q**2) < 0.015

    def test_on_hemisphere(self):
        n = jnp.asarray(np.tile([0.0, 0.0, 1.0], (5000, 1)))
        v = np.asarray(rrng.random_on_hemisphere(jax.random.PRNGKey(3), n))
        assert (v[:, 2] > 0).all()


class TestColor:
    def test_gamma_is_2p2_not_sqrt(self):
        # reference src/color.rs:3-10 uses pow(1/2.2), not sqrt
        assert abs(color_util.linear_to_gamma(0.25) - 0.25 ** (1 / 2.2)) < 1e-12
        assert abs(color_util.gamma_to_linear(0.5) - 0.5**2.2) < 1e-12

    def test_quantization_rule(self):
        # reference src/color.rs:12-19: (256 * clamp(gamma, 0, 0.999)) as u8
        c = np.array([[0.0, 0.5, 10.0]])
        got = color_util.color_to_rgb8(c)[0]
        assert got[0] == 0
        assert got[1] == int(256 * min(0.5 ** (1 / 2.2), 0.999))
        assert got[2] == int(256 * 0.999)

    def test_roundtrip(self, rng):
        rgb = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
        back = color_util.color_to_rgb8(color_util.rgb8_to_color(rgb))
        np.testing.assert_array_equal(back, rgb)
