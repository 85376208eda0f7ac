"""BVH: flattened-tree invariants + traversal == brute force (the property
the reference guarantees by construction, bvh.rs:91-112 vs hittable.rs:62-74)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene, render
from rust_tracing_tpu.models import builders, bvh as bvh_mod
from rust_tracing_tpu.ops import intersect
from rust_tracing_tpu.ops.bvh_traverse import closest_hit_bvh


def _random_builder(rng, n_sph=60, n_quad=40, media=True):
    b = SceneBuilder(background=(0.5, 0.6, 0.9))
    mats = [b.lambertian((0.5, 0.5, 0.5)), b.metal((0.8, 0.8, 0.8), 0.2),
            b.dielectric(1.5), b.diffuse_light((3, 3, 3))]
    for i in range(n_sph):
        target = tuple(rng.uniform(-10, 10, 3)) if i % 7 == 0 else None
        b.add_sphere(rng.uniform(-10, 10, 3), rng.uniform(0.2, 1.5),
                     mats[i % 4], target=target)
    for i in range(n_quad):
        b.add_quad(rng.uniform(-10, 10, 3), rng.normal(size=3) * 2,
                   rng.normal(size=3) * 2, mats[i % 4])
    if media:
        b.add_sphere_medium((0, 0, 0), 3.0, 0.5, (1, 1, 1))
    return b


class TestFlatten:
    def test_structure_invariants(self, rng):
        b = _random_builder(rng, 50, 30, media=False)
        flat = bvh_mod.build_for(b, seed=1)
        N = len(flat.skip)
        leaves = flat.prim_type >= 0
        assert leaves.sum() == 50 + 30  # every primitive in exactly one leaf
        # skip links always advance and stay in range
        assert (flat.skip > np.arange(N)).all()
        assert (flat.skip <= N).all()
        # leaf skip is the next node
        np.testing.assert_array_equal(flat.skip[leaves],
                                      np.arange(N)[leaves] + 1)
        # root box contains every leaf box
        assert (flat.node_min[0] <= flat.node_min[leaves] + 1e-12).all()
        assert (flat.node_max[0] >= flat.node_max[leaves] - 1e-12).all()

    def test_motion_sphere_box_unions_endpoints(self):
        b = SceneBuilder()
        b.add_sphere((0, 0, 0), 1.0, b.lambertian((1, 1, 1)), target=(5, 0, 0))
        lo, hi, _, _ = bvh_mod.primitive_boxes(b)
        np.testing.assert_allclose(lo[0], [-1, -1, -1])
        np.testing.assert_allclose(hi[0], [6, 1, 1])

    def test_quad_box_padded(self):
        b = SceneBuilder()
        b.add_quad((0, 0, 0), (1, 0, 0), (0, 1, 0), b.lambertian((1, 1, 1)))
        lo, hi, _, _ = bvh_mod.primitive_boxes(b)
        assert hi[0][2] - lo[0][2] == pytest.approx(1e-4)  # quad.rs:42


class TestNativeBuilder:
    def test_native_matches_contract_and_python_hits(self, rng):
        n = 500
        lo = rng.uniform(-50, 50, (n, 3))
        hi = lo + rng.uniform(0.1, 4, (n, 3))
        pt = (rng.random(n) < 0.5).astype(np.int32)
        pi = np.arange(n, dtype=np.int32)
        nat = bvh_mod.build_native(lo, hi, pt, pi, seed=7)
        if nat is None:
            pytest.skip("native toolchain unavailable")
        py = bvh_mod.build(lo, hi, pt, pi, seed=7, native=False)
        for f in (nat, py):
            N = len(f.skip)
            leaves = f.prim_type >= 0
            assert leaves.sum() == n
            assert (f.skip > np.arange(N)).all() and (f.skip <= N).all()
            assert set(f.prim_idx[leaves]) == set(range(n))
            # root bounds everything
            assert (f.node_min[0] <= lo.min(0) + 1e-12).all()
            assert (f.node_max[0] >= hi.max(0) - 1e-12).all()
        # determinism per seed
        nat2 = bvh_mod.build_native(lo, hi, pt, pi, seed=7)
        np.testing.assert_array_equal(nat.skip, nat2.skip)
        np.testing.assert_array_equal(nat.prim_idx, nat2.prim_idx)


class TestTraversal:
    def test_equals_brute_force(self, rng):
        b = _random_builder(rng)
        scene_b = compile_scene(b, dtype=jnp.float64, use_bvh=False)
        scene_t = compile_scene(b, dtype=jnp.float64, use_bvh=True)
        assert scene_t.has_bvh and not scene_b.has_bvh
        R = 2048
        o = jnp.asarray(rng.uniform(-12, 12, (R, 3)))
        d = jnp.asarray(rng.normal(size=(R, 3)))
        t = jnp.asarray(rng.uniform(0, 1, R))
        from rust_tracing_tpu.ops.hashrng import CounterRng
        rngb = CounterRng(11, jnp.arange(o.shape[0], dtype=jnp.int32), 0, 0)
        h1 = intersect.closest_hit(scene_b, o, d, t, rngb)
        h2 = closest_hit_bvh(scene_t, o, d, t, rngb)
        np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
        m = np.asarray(h1.hit)
        np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m],
                                   rtol=1e-9)
        np.testing.assert_array_equal(np.asarray(h1.mat_id)[m],
                                      np.asarray(h2.mat_id)[m])
        np.testing.assert_allclose(np.asarray(h1.normal)[m],
                                   np.asarray(h2.normal)[m], atol=1e-9)
        np.testing.assert_allclose(np.asarray(h1.u)[m], np.asarray(h2.u)[m],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(h1.front_face)[m],
                                   np.asarray(h2.front_face)[m])

    def test_render_identical_under_same_rng(self, rng):
        # same RNG stream + equivalent hits -> bitwise-equal renders
        b = _random_builder(rng, 40, 20, media=False)
        settings = RenderSettings(image_width=32, samples_per_pixel=4,
                                  max_depth=4, vfov=50.0,
                                  look_from=(0, 0, 25), look_at=(0, 0, 0),
                                  background=(0.5, 0.6, 0.9))
        cam = Camera.create(settings)
        img_b, _ = render(compile_scene(b, dtype=jnp.float64, use_bvh=False), cam, dtype=jnp.float64)
        img_t, _ = render(compile_scene(b, dtype=jnp.float64, use_bvh=True), cam, dtype=jnp.float64)
        np.testing.assert_allclose(img_b, img_t, rtol=1e-12, atol=1e-12)

    def test_final_scene_uses_bvh_and_renders(self):
        b, settings = builders.final_scene()
        settings = dataclasses.replace(settings, image_width=24,
                                       samples_per_pixel=2, max_depth=4)
        # auto-threshold prefers brute force on TPU at this size; force the
        # BVH path to exercise it end-to-end
        scene = compile_scene(b, use_bvh=True)
        assert scene.has_bvh
        img, stats = render(scene, Camera.create(settings), pixel_chunk=1024)
        assert np.isfinite(img).all()
        assert img.max() > 0
