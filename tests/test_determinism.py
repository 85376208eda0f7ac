"""Determinism contracts of the counter-based RNG (ops/hashrng.py):

- bitwise chunk invariance of the offline renderer;
- progressive accumulation == one offline render, exactly;
- the Pallas megakernel (interpret mode) consumes the SAME streams as the XLA
  wavefront path — images agree to float arithmetic, not Monte-Carlo noise;
- basic statistical quality of the hash generator.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene, render
from rust_tracing_tpu.models import builders
from rust_tracing_tpu.ops import hashrng, megakernel
from rust_tracing_tpu.renderer import progressive_init, progressive_step


def _scene():
    b = SceneBuilder(background=(0.6, 0.7, 1.0))
    b.add_sphere((0, -100.5, -2), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -2), 0.5, b.metal((0.9, 0.8, 0.7), 0.2))
    b.add_sphere((-1.1, 0, -2), 0.5, b.dielectric(1.5))
    settings = RenderSettings(
        aspect_ratio=1.0, image_width=24, samples_per_pixel=8, max_depth=4,
        vfov=60.0, look_from=(0, 0, 1), look_at=(0, 0, -2),
        background=(0.6, 0.7, 1.0))
    return compile_scene(b), Camera.create(settings)


def test_render_bitwise_chunk_invariant():
    scene, camera = _scene()
    imgs = [render(scene, camera, seed=7, pixel_chunk=c)[0]
            for c in (64, 256, 24 * 24)]
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_array_equal(imgs[0], imgs[2])


def test_progressive_equals_offline_exactly():
    scene, camera = _scene()
    offline, _ = render(scene, camera, seed=7, spp=8)
    st = progressive_init(camera, seed=7)
    for samples in (1, 2, 5):  # 8 total, uneven steps
        st = progressive_step(scene, camera, st, samples=samples)
    assert st.num_samples == 8
    # identical samples; the only difference is f32 partial-sum association
    # (offline sums 8 samples in one f32 accumulator, progressive in 1+2+5)
    np.testing.assert_allclose(st.accum, offline, rtol=3e-6, atol=3e-7)


def test_megakernel_streams_match_xla():
    """Same (seed, pixel, sample, bounce, site) addresses on both paths: the
    images agree to float arithmetic. A handful of rays may flip a discrete
    decision (closest-hit tie, Schlick coin at 1 ulp), so gate the fraction of
    disagreeing pixels, not a global allclose."""
    b, settings = builders.cornell_box()
    settings = dataclasses.replace(settings, image_width=24,
                                   samples_per_pixel=8, max_depth=4)
    scene = compile_scene(b)
    camera = Camera.create(settings)
    img_mk = megakernel.render_fast(scene, camera, seed=3, interpret=True)
    img_xla, _ = render(scene, camera, seed=3, use_megakernel=False)
    diff = np.abs(img_mk - img_xla)
    frac_off = float((diff > 1e-3).mean())
    assert frac_off < 0.01, f"{frac_off:.4f} of channels differ > 1e-3"
    np.testing.assert_allclose(img_mk.mean(), img_xla.mean(), rtol=1e-3)


def test_hashrng_uniformity_and_decorrelation():
    n = 1 << 15
    pid = jnp.arange(n, dtype=jnp.int32)
    r = hashrng.CounterRng(0, pid, 0, 0)
    u = np.asarray(r.uniform(hashrng.SITE_SCATTER_Z))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.01
    # adjacent-pixel correlation (same site)
    c = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(c) < 0.02
    # cross-site correlation at the same address
    v = np.asarray(r.uniform(hashrng.SITE_SCATTER_PHI))
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.02
    # adjacent-sample correlation for one pixel
    w0 = np.asarray(hashrng.CounterRng(0, 11, jnp.arange(n), 0)
                    .uniform(hashrng.SITE_TIME))
    assert abs(np.corrcoef(w0[:-1], w0[1:])[0, 1]) < 0.02
    # unit vectors actually land on the sphere uniformly
    x, y, z = hashrng.CounterRng(1, pid, 0, 0).unit_vector(
        hashrng.SITE_SCATTER_Z, hashrng.SITE_SCATTER_PHI)
    v3 = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], -1)
    np.testing.assert_allclose(np.linalg.norm(v3, axis=-1), 1.0, atol=1e-5)
    assert np.abs(v3.mean(0)).max() < 0.02
