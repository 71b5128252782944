from skele_raytracer_tpu.models.renderer import (
    render,
    render_frames,
    render_radiance,
)

__all__ = ["render", "render_frames", "render_radiance"]
