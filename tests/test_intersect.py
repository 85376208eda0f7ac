"""Intersection kernels vs numpy f64 oracles (SURVEY.md §4 unit tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import SceneBuilder, Transform, compile_scene
from rust_tracing_tpu.ops import intersect
from rust_tracing_tpu.ops.hashrng import CounterRng


def _rngb(seed, n=1):
    return CounterRng(seed, jnp.arange(n, dtype=jnp.int32), 0, 0)

import oracles


def _random_sphere_scene(rng, n=12):
    b = SceneBuilder()
    mat = b.lambertian((0.5, 0.5, 0.5))
    spheres = []
    for _ in range(n):
        c = rng.uniform(-5, 5, 3)
        r = rng.uniform(0.2, 1.5)
        b.add_sphere(c, r, mat)
        spheres.append((c, r))
    return compile_scene(b, dtype=jnp.float64), spheres


class TestSphere:
    def test_vs_oracle(self, rng):
        scene, spheres = _random_sphere_scene(rng)
        R = 256
        o = rng.uniform(-8, 8, (R, 3))
        d = rng.normal(size=(R, 3))
        t, idx = intersect.sphere_closest(
            scene, jnp.asarray(o), jnp.asarray(d), jnp.zeros(R), jnp.full((R,), jnp.inf)
        )
        t = np.asarray(t)
        for i in range(R):
            best = np.inf
            for c, r in spheres:
                h, th = oracles.sphere_hit(o[i], d[i], c, r, 1e-3, best)
                if h:
                    best = th
            if np.isfinite(best):
                np.testing.assert_allclose(t[i], best, rtol=1e-9)
            else:
                assert not np.isfinite(t[i])

    def test_inside_sphere_far_root(self):
        # origin inside -> near root negative -> far root selected
        # (sphere.rs:77-83 root re-selection)
        b = SceneBuilder()
        b.add_sphere((0, 0, 0), 2.0, b.lambertian((1, 1, 1)))
        scene = compile_scene(b, dtype=jnp.float64)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, _ = intersect.sphere_closest(scene, o, d, jnp.zeros(1), jnp.full((1,), jnp.inf))
        np.testing.assert_allclose(np.asarray(t), [2.0], rtol=1e-12)

    def test_moving_sphere_lerp(self):
        # center lerped by ray time (sphere.rs:53-55,60-64)
        b = SceneBuilder()
        b.add_sphere((0, 0, 0), 1.0, b.lambertian((1, 1, 1)), target=(4, 0, 0))
        scene = compile_scene(b, dtype=jnp.float64)
        o = jnp.array([[2.0, 0.0, -10.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        # at time 0.5 the center is at x=2 -> direct hit at t=9
        t, _ = intersect.sphere_closest(scene, o, d, jnp.full((1,), 0.5),
                                        jnp.full((1,), jnp.inf))
        np.testing.assert_allclose(np.asarray(t), [9.0], rtol=1e-12)
        # at time 0 the sphere is at origin -> miss
        t0, _ = intersect.sphere_closest(scene, o, d, jnp.zeros(1),
                                         jnp.full((1,), jnp.inf))
        assert not np.isfinite(np.asarray(t0)[0])

    def test_uv_poles_and_equator(self):
        for n, (eu, ev) in [
            ((1.0, 0.0, 0.0), (0.5, 0.5)),   # +x equator
            ((0.0, 1.0, 0.0), (None, 1.0)),  # north pole v=1
            ((0.0, -1.0, 0.0), (None, 0.0)),  # south pole v=0
            ((0.0, 0.0, 1.0), (0.25, 0.5)),
        ]:
            u, v = intersect._sphere_uv(jnp.asarray([n], jnp.float64))
            ou, ov = oracles.sphere_uv(np.array(n))
            np.testing.assert_allclose(float(v[0]), ov, atol=1e-7)
            if eu is not None:
                np.testing.assert_allclose(float(u[0]), ou, atol=1e-7)


class TestQuad:
    def test_vs_oracle(self, rng):
        b = SceneBuilder()
        mat = b.lambertian((1, 1, 1))
        quads = []
        for _ in range(8):
            q = rng.uniform(-4, 4, 3)
            u = rng.normal(size=3) * 2
            v = rng.normal(size=3) * 2
            b.add_quad(q, u, v, mat)
            quads.append((q, u, v))
        scene = compile_scene(b, dtype=jnp.float64)
        R = 256
        o = rng.uniform(-6, 6, (R, 3))
        d = rng.normal(size=(R, 3))
        t, idx, alpha, beta = intersect.quad_closest(
            scene, jnp.asarray(o), jnp.asarray(d), jnp.zeros(R), jnp.full((R,), jnp.inf)
        )
        t, alpha, beta = map(np.asarray, (t, alpha, beta))
        for i in range(R):
            best, ba, bb = np.inf, None, None
            for q, u, v in quads:
                h, th, a_, b_ = oracles.quad_hit(o[i], d[i], q, u, v, 1e-3, best)
                if h:
                    best, ba, bb = th, a_, b_
            if np.isfinite(best):
                np.testing.assert_allclose(t[i], best, rtol=1e-9)
                np.testing.assert_allclose(alpha[i], ba, rtol=1e-6, atol=1e-9)
                np.testing.assert_allclose(beta[i], bb, rtol=1e-6, atol=1e-9)
            else:
                assert not np.isfinite(t[i])

    def test_no_backface_culling(self):
        # quad.rs:104-112: hits from both sides
        b = SceneBuilder()
        b.add_quad((0, 0, 0), (1, 0, 0), (0, 1, 0), b.lambertian((1, 1, 1)))
        scene = compile_scene(b, dtype=jnp.float64)
        for zdir in (1.0, -1.0):
            o = jnp.array([[0.5, 0.5, -zdir]])
            d = jnp.array([[0.0, 0.0, zdir]])
            t, _, _, _ = intersect.quad_closest(scene, o, d, jnp.zeros(1),
                                                jnp.full((1,), jnp.inf))
            np.testing.assert_allclose(np.asarray(t), [1.0], rtol=1e-12)

    def test_parallel_ray_rejected(self):
        b = SceneBuilder()
        b.add_quad((0, 0, 0), (1, 0, 0), (0, 1, 0), b.lambertian((1, 1, 1)))
        scene = compile_scene(b, dtype=jnp.float64)
        o = jnp.array([[0.5, 0.5, 0.0]])  # in the plane
        d = jnp.array([[1.0, 0.0, 0.0]])
        t, _, _, _ = intersect.quad_closest(scene, o, d, jnp.zeros(1),
                                            jnp.full((1,), jnp.inf))
        assert not np.isfinite(np.asarray(t)[0])


class TestClosestHit:
    def test_normal_faces_ray_and_front_face(self, rng):
        # hittable.rs:22-37 invariants on random sphere scenes
        scene, _ = _random_sphere_scene(rng)
        R = 512
        o = jnp.asarray(rng.uniform(-8, 8, (R, 3)))
        d = jnp.asarray(rng.normal(size=(R, 3)))
        hit = intersect.closest_hit(scene, o, d, jnp.zeros(R), _rngb(0, R))
        h = np.asarray(hit.hit)
        n = np.asarray(hit.normal)
        dn = np.sum(np.asarray(d) * n, -1)
        assert (dn[h] < 1e-12).all()  # normal always against the ray
        # unit normals for surface hits
        np.testing.assert_allclose(np.linalg.norm(n[h], axis=-1), 1.0, atol=1e-9)

    def test_sphere_quad_priority(self):
        # closest wins across primitive types
        b = SceneBuilder()
        m = b.lambertian((1, 1, 1))
        b.add_sphere((0, 0, 5), 1.0, m)          # hit at t=4
        b.add_quad((-2, -2, 3), (4, 0, 0), (0, 4, 0), m)  # hit at t=3
        scene = compile_scene(b, dtype=jnp.float64)
        hit = intersect.closest_hit(
            scene, jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]),
            jnp.zeros(1), _rngb(0))
        np.testing.assert_allclose(np.asarray(hit.t), [3.0], rtol=1e-12)

    def test_medium_sphere_entry_exit(self):
        # dense medium: scatter t must lie inside the boundary segment
        b = SceneBuilder()
        b.add_sphere_medium((0, 0, 5), 1.0, density=1e4, albedo=(1, 1, 1))
        scene = compile_scene(b, dtype=jnp.float64)
        R = 64
        o = jnp.zeros((R, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
        ts = []
        for k in range(R):
            hit = intersect.closest_hit(scene, o[:1], d[:1], jnp.zeros(1),
                                        _rngb(k))
            assert bool(hit.hit[0])
            assert not bool(hit.is_surface[0])
            ts.append(float(hit.t[0]))
        ts = np.array(ts)
        assert (ts >= 4.0).all() and (ts <= 6.0).all()
        assert ts.max() < 4.1  # density 1e4 -> scatters ~immediately at entry

    def test_medium_zero_chance_when_far(self):
        # thin medium behind a wall: exit clamped by surface -> never scatters
        b = SceneBuilder()
        m = b.lambertian((1, 1, 1))
        b.add_quad((-5, -5, 2), (10, 0, 0), (0, 10, 0), m)  # wall at z=2
        b.add_sphere_medium((0, 0, 5), 1.0, density=10.0, albedo=(1, 1, 1))
        scene = compile_scene(b, dtype=jnp.float64)
        hit = intersect.closest_hit(
            scene, jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]),
            jnp.zeros(1), _rngb(1))
        assert bool(hit.is_surface[0])
        np.testing.assert_allclose(np.asarray(hit.t), [2.0], rtol=1e-12)

    def test_rotated_box_medium_frame(self):
        # box rotated 45° about Y: ray along x must enter through the edge
        b = SceneBuilder()
        b.add_box_medium((-1, -1, -1), (1, 1, 1), density=1e5, albedo=(1, 1, 1),
                         transform=Transform(rotate_y_deg=45.0))
        scene = compile_scene(b, dtype=jnp.float64)
        hit = intersect.closest_hit(
            scene, jnp.array([[-5.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]),
            jnp.zeros(1), _rngb(2))
        # rotated cube corner reaches sqrt(2) along x
        assert bool(hit.hit[0])
        np.testing.assert_allclose(np.asarray(hit.t), [5.0 - np.sqrt(2.0)],
                                   rtol=1e-3)
