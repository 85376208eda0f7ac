"""Scene builder + compiler: instancing baking, padding, derived frames."""

import numpy as np
import jax.numpy as jnp

from rust_tracing_tpu import SceneBuilder, Transform, compile_scene
from rust_tracing_tpu.models import builders, scene as scene_mod


def test_transform_composition_matches_reference_order():
    # Translate(RotateY(obj, 15), off): rotate first, then translate
    t = Transform(rotate_y_deg=90.0, translate=(10.0, 0.0, 0.0))
    p = t.apply_point(np.array([1.0, 0.0, 0.0]))
    # RotateY(90): object->world (x,z) -> (x cos + z sin, -x sin + z cos)
    np.testing.assert_allclose(p, [10.0, 0.0, -1.0], atol=1e-12)


def test_cube_builds_closed_box_with_baked_transform():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    xf = Transform(rotate_y_deg=30.0, translate=(5.0, 1.0, -2.0))
    b.add_cube((0, 0, 0), (2, 3, 4), m, xf)
    assert b.num_quads == 6
    # every face vertex must be a transformed corner of the box
    corners = np.array([[x, y, z] for x in (0, 2) for y in (0, 3) for z in (0, 4)],
                       np.float64)
    world_corners = xf.apply_point(corners)
    for i in range(6):
        q = b.quad_q[i]
        for vtx in (q, q + b.quad_u[i], q + b.quad_v[i],
                    q + b.quad_u[i] + b.quad_v[i]):
            dist = np.linalg.norm(world_corners - vtx, axis=1).min()
            assert dist < 1e-9


def test_sphere_motion_vector_transformed():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    xf = Transform(rotate_y_deg=90.0, translate=(1.0, 2.0, 3.0))
    b.add_sphere((1, 0, 0), 0.5, m, target=(1, 1, 0), transform=xf)
    np.testing.assert_allclose(b.sph_center[0], [1.0, 2.0, 2.0], atol=1e-12)
    # motion vector (0,1,0) is rotation-invariant here
    np.testing.assert_allclose(b.sph_cvec[0], [0.0, 1.0, 0.0], atol=1e-12)


def test_padding_and_masks():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.add_sphere((0, 0, 0), 1.0, m)
    b.add_quad((0, 0, 0), (1, 0, 0), (0, 1, 0), m)
    scene = compile_scene(b, pad_multiple=8)
    assert scene.sph_radius.shape[0] == 8
    assert scene.quad_mat.shape[0] == 8
    assert np.asarray(scene.sph_valid).sum() == 1
    assert np.asarray(scene.quad_valid).sum() == 1
    # padded quad frames stay finite
    normal, d, w = scene.quad_frame()
    assert np.isfinite(np.asarray(normal)).all()
    assert np.isfinite(np.asarray(w)).all()


def test_quad_frame_matches_reference_definition(rng):
    # quad.rs:23-38: n = u x v, normal = n/|n|, d = normal . q, w = n/|n|^2
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    q, u, v = rng.normal(size=(3, 3))
    b.add_quad(q, u, v, m)
    scene = compile_scene(b, dtype=jnp.float64)
    normal, d, w = scene.quad_frame()
    n = np.cross(u, v)
    np.testing.assert_allclose(np.asarray(normal)[0], n / np.linalg.norm(n), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d)[0], (n / np.linalg.norm(n)) @ q, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(w)[0], n / (n @ n), rtol=1e-12)


def test_all_nine_scenes_compile():
    for idx in range(9):
        b, settings = builders.build_scene(idx)
        scene = compile_scene(b)
        assert scene.background.shape == (3,)
        # static flags match content
        assert scene.has_media == (b.num_media > 0)
    # spot checks against main.rs structure
    b6, s6 = builders.cornell_box()
    assert b6.num_quads == 6 + 12  # walls + two cubes
    assert s6.samples_per_pixel == 4096 and s6.max_depth == 8
    b8, s8 = builders.final_scene()
    assert b8.num_spheres == 1 + 2 + 1 + 1 + 1 + 1000  # main.rs:543-622
    assert b8.num_quads == 400 * 6 + 1
    assert b8.num_media == 2
    assert s8.samples_per_pixel == 8192 and s8.max_depth == 40
