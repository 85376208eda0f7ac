"""Camera: viewport precomputation + vectorized primary-ray generation
(reference: src/camera.rs; SURVEY.md §2 #18)."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_tracing_tpu import Camera, RenderSettings, get_rays

import oracles

CORNELL = RenderSettings(
    aspect_ratio=1.0, image_width=600, samples_per_pixel=16, max_depth=8,
    vfov=40.0, look_from=(278.0, 278.0, -800.0), look_at=(278.0, 278.0, 0.0),
)


def test_constants_match_oracle():
    cam = Camera.create(CORNELL)
    o = oracles.camera_constants(CORNELL)
    assert cam.image_height == o["image_height"]
    np.testing.assert_allclose(cam.center, o["center"], rtol=1e-12)
    np.testing.assert_allclose(cam.pixel00_loc, o["pixel00"], rtol=1e-12)
    np.testing.assert_allclose(cam.pixel_delta_u, o["pdu"], rtol=1e-12)
    np.testing.assert_allclose(cam.pixel_delta_v, o["pdv"], rtol=1e-12)


def test_integer_height_truncation():
    # reference camera.rs:69: height = width / aspect as integer truncation
    s = RenderSettings(image_width=600, aspect_ratio=16.0 / 9.0)
    assert Camera.create(s).image_height == 337


def test_ray_statistics():
    cam = Camera.create(CORNELL).constants(jnp.float32)
    pixel_ids = jnp.asarray([0, 599, 600 * 600 - 1, 1234], jnp.int32)
    os_, ds_, ts_ = [], [], []
    for s in range(300):
        o, d, t = get_rays(cam, 0, pixel_ids, s)
        os_.append(np.asarray(o)); ds_.append(np.asarray(d)); ts_.append(np.asarray(t))
    o = np.stack(os_); d = np.stack(ds_); t = np.stack(ts_)

    # no defocus -> origin is exactly the camera center
    np.testing.assert_allclose(o, np.broadcast_to(np.asarray(cam.center), o.shape),
                               atol=1e-6)
    # time ~ U[0,1) always (camera.rs:123)
    assert 0.0 <= t.min() and t.max() < 1.0
    assert abs(t.mean() - 0.5) < 0.02

    # mean target over jitter == exact pixel center (camera.rs:112-115)
    orc = oracles.camera_constants(CORNELL)
    for n, pid in enumerate([0, 599, 600 * 600 - 1, 1234]):
        i, j = pid % 600, pid // 600
        center = orc["pixel00"] + i * orc["pdu"] + j * orc["pdv"]
        target = o[:, n] + d[:, n]
        np.testing.assert_allclose(target.mean(0), center, atol=0.02)
        # jitter never exceeds half a pixel
        off = target - center
        assert np.abs(off @ orc["pdu"] / (orc["pdu"] @ orc["pdu"])).max() <= 0.5 + 1e-3


def test_defocus_disk():
    s = RenderSettings(
        aspect_ratio=1.0, image_width=100, vfov=40.0,
        look_from=(0.0, 0.0, 10.0), look_at=(0.0, 0.0, 0.0),
        defocus_angle=2.0, focus_dist=10.0,
    )
    cam = Camera.create(s).constants(jnp.float32)
    pid = jnp.arange(2000, dtype=jnp.int32)  # distinct RNG addresses
    o, d, t = get_rays(cam, 5, pid, 0)
    o = np.asarray(o)
    r = np.linalg.norm(o - np.array([0, 0, 10.0]), axis=-1)
    defocus_radius = 10.0 * np.tan(np.deg2rad(1.0))
    assert r.max() <= defocus_radius + 1e-5
    assert r.max() > 0.5 * defocus_radius  # actually samples the disk
