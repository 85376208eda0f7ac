"""rust_tracing_tpu — a TPU-native differentiable path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the
Husenap/rust-tracing reference (Ray Tracing in One Weekend + The Next Week):
sphere/quad primitives, BVH acceleration, five materials, four textures,
constant-density media, motion/defocus blur, nine canonical scenes, offline +
progressive rendering — re-designed arrays-first for TPU and differentiable
end to end.
"""

from .camera import Camera, get_rays
from .config import RenderSettings
from .models.compile import CompiledScene, compile_scene
from .models.scene import SceneBuilder, Transform
from .renderer import render, progressive_init, progressive_step

__all__ = [
    "Camera",
    "CompiledScene",
    "RenderSettings",
    "SceneBuilder",
    "Transform",
    "compile_scene",
    "get_rays",
    "render",
    "progressive_init",
    "progressive_step",
]

__version__ = "0.1.0"
