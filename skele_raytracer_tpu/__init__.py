"""skele_raytracer_tpu — a TPU-native differentiable ray tracing framework.

A from-scratch JAX/XLA/Pallas re-design (NOT a port) of the capabilities of
the reference CPU/CUDA tracer `lilinitsy/skele-raytracer`:

* ray-sphere and ray-triangle intersection (reference src/utils.h:87-213)
* Blinn-Phong ambient/diffuse/specular shading with point + directional
  lights and shadow rays (reference src/blinn_phong.h, src/utils.h:42-76)
* spherical fog (reference src/blinn_phong.h:19-44)
* recursive reflection/refraction with Fresnel (reference intent,
  src/raytrace.h:46-103 — dead code there, implemented for real here)
* jittered n×n supersampling (reference src/main.cpp:48-69)
* Monte-Carlo path-traced global illumination (reference src/raytrace.h:107-136)

Design differences from the reference (TPU-first):

* The per-pixel recursive `shade()` becomes an iterative, fixed-depth
  wavefront over large ray batches (`lax.scan`) so XLA can compile and
  differentiate it end-to-end.
* Scenes are struct-of-arrays pytrees whose leaves (sphere centers/radii,
  triangle vertices, materials, lights) are differentiable.
* RNG is counter-based (threefry) keyed on (ray, bounce, purpose), so renders
  are bitwise reproducible under any device sharding — unlike the reference's
  shared libc rand() data race (src/main.cpp:52 inside the omp region).
* Parallelism is `shard_map` over a `jax.sharding.Mesh` (pixel rows sharded,
  scene replicated, gradient `psum`) instead of one OpenMP pragma.

Two semantic modes are provided (see `skele_raytracer_tpu.config`):

* ``parity``  — bug-for-bug reachable semantics of the reference CPU build,
  for golden-image/gradient parity testing (quirk catalog: SURVEY.md §2.9).
* ``clean``   — the capability the reference intended: normalized rays,
  correct Möller-Trumbore, working directional lights, shaded triangles,
  real reflection/refraction/fresnel, stratified jitter.
"""

__version__ = "0.1.0"

from skele_raytracer_tpu.config import RenderConfig, Quirks, PARITY, CLEAN
from skele_raytracer_tpu.scene.types import (
    Camera,
    DirectionalLights,
    Fog,
    PointLights,
    Scene,
    Spheres,
    Triangles,
)
from skele_raytracer_tpu.scene.parser import parse_scene
from skele_raytracer_tpu.models.renderer import render, render_frames

__all__ = [
    "RenderConfig",
    "Quirks",
    "PARITY",
    "CLEAN",
    "Scene",
    "Spheres",
    "Triangles",
    "PointLights",
    "DirectionalLights",
    "Fog",
    "Camera",
    "parse_scene",
    "render",
    "render_frames",
]
