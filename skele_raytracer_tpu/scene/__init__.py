from skele_raytracer_tpu.scene.types import (
    Camera,
    DirectionalLights,
    Fog,
    PointLights,
    Scene,
    Spheres,
    Triangles,
)
from skele_raytracer_tpu.scene.parser import ParsedScene, parse_scene, parse_scene_text

__all__ = [
    "Scene",
    "Spheres",
    "Triangles",
    "PointLights",
    "DirectionalLights",
    "Fog",
    "Camera",
    "ParsedScene",
    "parse_scene",
    "parse_scene_text",
]
