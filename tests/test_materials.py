"""Material scatter/emission semantics vs the reference (src/material.rs)."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_tracing_tpu import SceneBuilder, compile_scene
from rust_tracing_tpu.ops import intersect
from rust_tracing_tpu.ops.hashrng import CounterRng
from rust_tracing_tpu.ops.materials import scatter_and_emit


def _rngb(seed, n=1):
    """Per-bounce RNG scope over n distinct ray addresses."""
    return CounterRng(seed, jnp.arange(n, dtype=jnp.int32), 0, 0)

import oracles


def _hit_for(scene, mat_id, normal=(0.0, 0.0, 1.0), front_face=True, n=1,
             p=(0.0, 0.0, 0.0), uv=(0.3, 0.7)):
    z = jnp.zeros((n,))
    return intersect.Hit(
        hit=jnp.ones((n,), bool),
        t=jnp.ones((n,)),
        p=jnp.tile(jnp.asarray([p], jnp.float64), (n, 1)),
        normal=jnp.tile(jnp.asarray([normal], jnp.float64), (n, 1)),
        front_face=jnp.full((n,), front_face),
        mat_id=jnp.full((n,), mat_id, jnp.int32),
        u=z + uv[0],
        v=z + uv[1],
        is_surface=jnp.ones((n,), bool),
    )


def _scene_with(fn):
    b = SceneBuilder()
    mid = fn(b)
    b.add_sphere((0, 0, 0), 1.0, mid)  # keep arrays non-degenerate
    return compile_scene(b, dtype=jnp.float64), mid


def test_lambertian_distribution_and_albedo():
    scene, mid = _scene_with(lambda b: b.lambertian((0.25, 0.5, 0.75)))
    n = 8000
    d_in = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64), (n, 1))
    s = scatter_and_emit(scene, _rngb(0, n), d_in, _hit_for(scene, mid, n=n))
    assert np.asarray(s.scattered).all()
    np.testing.assert_allclose(np.asarray(s.attenuation),
                               np.tile([[0.25, 0.5, 0.75]], (n, 1)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.emitted), 0.0, atol=1e-12)
    d = np.asarray(s.direction)
    # direction = n + unit_vector: mean == normal, components in [-1, 1]+n
    np.testing.assert_allclose(d.mean(0), [0, 0, 1], atol=0.03)
    assert (d[:, 2] > -1e-9).all() and (d[:, 2] < 2 + 1e-9).all()
    # cosine-weighted: E[cos theta] of normalized dir = 2/3
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    assert abs(dn[:, 2].mean() - 2 / 3) < 0.01


def test_metal_mirror_and_fuzz_absorb():
    scene, mid = _scene_with(lambda b: b.metal((0.8, 0.6, 0.2), 0.0))
    d_in = jnp.asarray([[1.0, 0.0, -1.0]], jnp.float64)
    s = scatter_and_emit(scene, _rngb(0), d_in, _hit_for(scene, mid))
    want = oracles.reflect(np.array([1.0, 0, -1.0]) / np.sqrt(2), np.array([0, 0, 1.0]))
    np.testing.assert_allclose(np.asarray(s.direction)[0], want, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.attenuation)[0], [0.8, 0.6, 0.2], rtol=1e-12)
    assert bool(s.scattered[0])

    # heavy fuzz at grazing incidence: some rays absorbed (material.rs:57-63)
    scene2, mid2 = _scene_with(lambda b: b.metal((1, 1, 1), 1.0))
    n = 2000
    d_in = jnp.tile(jnp.asarray([[1.0, 0.0, -0.02]], jnp.float64), (n, 1))
    s2 = scatter_and_emit(scene2, _rngb(1, n), d_in,
                          _hit_for(scene2, mid2, n=n))
    frac = np.asarray(s2.scattered).mean()
    assert 0.05 < frac < 0.95
    # every surviving ray is above the surface
    ok = np.asarray(s2.scattered)
    assert (np.asarray(s2.direction)[ok][:, 2] > 0).all()


def test_dielectric_tir_and_refraction():
    scene, mid = _scene_with(lambda b: b.dielectric(1.5))
    # Interior hit at grazing angle -> total internal reflection, always
    sin_crit = 1.0 / 1.5
    ang = np.arcsin(sin_crit) + 0.1
    d_in = jnp.asarray([[np.sin(ang), 0.0, -np.cos(ang)]], jnp.float64)
    hit = _hit_for(scene, mid, front_face=False)  # exiting: ratio = ir
    for seed in range(8):
        s = scatter_and_emit(scene, _rngb(seed), d_in, hit)
        want = oracles.reflect(np.asarray(d_in)[0], np.array([0, 0, 1.0]))
        np.testing.assert_allclose(np.asarray(s.direction)[0], want, atol=1e-12)
    # attenuation is exactly one (material.rs:83)
    np.testing.assert_allclose(np.asarray(s.attenuation)[0], 1.0, rtol=1e-12)

    # Normal incidence from outside: Schlick = 0.04 -> mostly refracts straight
    d_in = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64), (4000, 1))
    s = scatter_and_emit(scene, _rngb(2, 4000), d_in,
                         _hit_for(scene, mid, n=4000, front_face=True))
    d = np.asarray(s.direction)
    refracted = d[:, 2] < 0
    frac_reflect = 1 - refracted.mean()
    schlick = oracles.schlick(1.0, 1 / 1.5)
    assert abs(frac_reflect - schlick) < 0.02
    np.testing.assert_allclose(d[refracted], np.tile([[0, 0, -1.0]],
                                                     (refracted.sum(), 1)), atol=1e-9)


def test_diffuse_light_emits_and_never_scatters():
    scene, mid = _scene_with(lambda b: b.diffuse_light((4.0, 3.0, 2.0)))
    d_in = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64)
    for ff in (True, False):  # emission ignores front_face (renderer.rs:145)
        s = scatter_and_emit(scene, _rngb(0), d_in,
                             _hit_for(scene, mid, front_face=ff))
        assert not bool(s.scattered[0])
        np.testing.assert_allclose(np.asarray(s.emitted)[0], [4.0, 3.0, 2.0],
                                   rtol=1e-12)


def test_isotropic_uniform_sphere():
    scene, mid = _scene_with(lambda b: b.isotropic((0.2, 0.4, 0.9)))
    n = 8000
    d_in = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64), (n, 1))
    s = scatter_and_emit(scene, _rngb(0, n), d_in, _hit_for(scene, mid, n=n))
    d = np.asarray(s.direction)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-9)
    assert np.abs(d.mean(0)).max() < 0.03  # uniform, both hemispheres
    np.testing.assert_allclose(np.asarray(s.attenuation),
                               np.tile([[0.2, 0.4, 0.9]], (n, 1)), rtol=1e-12)
