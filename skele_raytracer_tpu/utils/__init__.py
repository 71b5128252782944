from skele_raytracer_tpu.utils import image

__all__ = ["image"]
