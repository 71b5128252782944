from skele_raytracer_tpu.ops import camera, geometry, sampling, shading

__all__ = ["camera", "geometry", "sampling", "shading"]
