from skele_raytracer_tpu.parallel.api import (
    factor_mesh,
    loss_and_grad_sharded,
    make_mesh,
    render_radiance_sharded,
    render_sharded,
    replicate_scene,
)

__all__ = [
    "factor_mesh",
    "make_mesh",
    "render_sharded",
    "render_radiance_sharded",
    "loss_and_grad_sharded",
    "replicate_scene",
]
