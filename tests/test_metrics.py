"""Structured metrics emitter (utils/metrics.py, SURVEY.md §5.5)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from rust_tracing_tpu import Camera, RenderSettings, SceneBuilder, compile_scene, render
from rust_tracing_tpu.utils import metrics


def _tiny_scene():
    b = SceneBuilder(background=(0.5, 0.6, 0.9))
    b.add_sphere((0, 0, -2), 0.5, b.lambertian((0.7, 0.3, 0.3)))
    settings = RenderSettings(image_width=16, aspect_ratio=1.0,
                              samples_per_pixel=2, max_depth=2,
                              background=(0.5, 0.6, 0.9))
    return compile_scene(b), Camera.create(settings)


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("RT_METRICS", raising=False)
    monkeypatch.setattr(metrics, "_sink", None)
    assert not metrics.enabled()
    metrics.emit("noop", x=1)  # must not raise


def test_emits_parseable_json_lines(tmp_path, monkeypatch):
    out = tmp_path / "metrics.jsonl"
    monkeypatch.setenv("RT_METRICS", str(out))
    monkeypatch.setattr(metrics, "_sink", None)

    scene, camera = _tiny_scene()
    render(scene, camera, use_megakernel=False)
    metrics._sink.flush()

    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines, "no metrics emitted"
    ev = [l for l in lines if l["event"] == "render"]
    assert ev and ev[0]["path"] == "xla_wavefront"
    assert ev[0]["rays"] > 0 and ev[0]["seconds"] > 0
    assert ev[0]["width"] == 16 and ev[0]["spp"] == 2
    # reset module sink so later tests aren't redirected
    monkeypatch.setattr(metrics, "_sink", None)


def test_occupancy_event(tmp_path, monkeypatch):
    out = tmp_path / "m.jsonl"
    monkeypatch.setenv("RT_METRICS", str(out))
    monkeypatch.setattr(metrics, "_sink", None)

    from rust_tracing_tpu.renderer import measure_occupancy

    scene, camera = _tiny_scene()
    frac = measure_occupancy(scene, camera, n_pixels=64, spp=2)
    metrics._sink.flush()
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    occ = [l for l in lines if l["event"] == "occupancy"]
    assert occ and len(occ[0]["per_bounce"]) == camera.max_depth
    np.testing.assert_allclose(occ[0]["per_bounce"], frac, atol=1e-4)
    monkeypatch.setattr(metrics, "_sink", None)
