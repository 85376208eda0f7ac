"""Progressive/live mode: checkpoint round-trip, resume exactness, viewer."""

import os

import numpy as np
import jax.numpy as jnp

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene, render
from rust_tracing_tpu.renderer import progressive_init, progressive_step
from rust_tracing_tpu.utils import checkpoint as ckpt
from rust_tracing_tpu.utils.viewer import TerminalViewer, frame_ansi


def _scene():
    b = SceneBuilder(background=(0.5, 0.6, 0.9))
    b.add_sphere((0, -100.5, -2), 100.0, b.lambertian((0.4, 0.6, 0.3)))
    b.add_sphere((0, 0, -2), 0.5, b.metal((0.9, 0.8, 0.7), 0.1))
    settings = RenderSettings(
        aspect_ratio=1.0, image_width=16, samples_per_pixel=6, max_depth=3,
        vfov=60.0, look_from=(0, 0, 1), look_at=(0, 0, -2),
        background=(0.5, 0.6, 0.9))
    return compile_scene(b), Camera.create(settings)


def test_checkpoint_roundtrip_and_resume_exactness(tmp_path):
    """Kill-and-resume must reproduce the uninterrupted render EXACTLY: the
    checkpoint is (accum, num_samples, seed) and samples are addressed
    globally, so resuming continues the same sample streams."""
    scene, camera = _scene()
    path = str(tmp_path / "st.npz")

    st = progressive_init(camera, seed=9)
    for _ in range(3):
        st = progressive_step(scene, camera, st)
    ckpt.save(path, st)

    loaded = ckpt.load(path)
    assert loaded.num_samples == 3 and loaded.seed == 9
    np.testing.assert_array_equal(loaded.accum, st.accum)

    # resumed continuation == uninterrupted progressive == offline render
    for _ in range(3):
        loaded = progressive_step(scene, camera, loaded)
        st = progressive_step(scene, camera, st)
    np.testing.assert_array_equal(loaded.accum, st.accum)
    offline, _ = render(scene, camera, seed=9, spp=6)
    np.testing.assert_allclose(loaded.accum, offline, rtol=3e-6, atol=3e-7)


def test_viewer_frame_ansi():
    img = np.linspace(0, 1, 24 * 24 * 3).reshape(24, 24, 3)
    s = frame_ansi(img, cols=12, rows=8)
    assert "\x1b[38;2;" in s and "▀" in s
    assert len(s.splitlines()) <= 8


def test_viewer_disabled_outside_tty(capsys):
    v = TerminalViewer()  # pytest captures stdout -> not a tty
    v.show(np.zeros((8, 8, 3)), "status")
    assert capsys.readouterr().out == ""
