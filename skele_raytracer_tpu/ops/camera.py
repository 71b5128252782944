"""Primary ray generation.

Vectorizes the reference's per-pixel camera math (src/main.cpp:40-83):

    angle  = tan(pi/2 * fov / 180)
    u      = (2*((x + jx) / W) - 1) * angle * aspect
    v      = (1 - 2*((y + jy) / H)) * angle
    dir    = cam.direction + u * cam.right + v * cam.up      (unnormalized!)
    right  = cross(-direction, up)                      (src/camera.h:21,30)

Supersampling (jsample n): n*n samples per pixel averaged. Parity mode
reproduces the reference jitter exactly — ONE uniform r reused for both u
and v with the n×n cell indices unused (src/main.cpp:48-69), i.e. samples
jittered along the pixel diagonal. Clean mode uses stratified 2-D jitter
(independent per-axis, one per grid cell). The center-ray (jsample 0) offset
is 0.5 in both (src/main.cpp:73-74).

Rays are generated FROM flat ray ids (ray_id = (y*W + x) * spp + sample) so
the integrator can stream arbitrary chunks/shards of the frame without ever
materializing all rays — the id doubles as the RNG counter, which is what
makes renders invariant to chunking and device sharding.
"""

from __future__ import annotations

import jax.numpy as jnp

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.ops import sampling
from skele_raytracer_tpu.ops.geometry import normalize


def camera_right(camera):
    """right = cross(-direction, up) (reference src/camera.h:21,30)."""
    return jnp.cross(-camera.direction, camera.up)


def total_rays(cfg: RenderConfig) -> int:
    return cfg.height * cfg.width * cfg.samples_per_pixel


def rays_for_ids(camera, cfg: RenderConfig, base_key, ray_id):
    """Primary rays for the given flat ray ids.

    ray_id: [R] uint32 in [0, H*W*spp). Returns (origins [R,3],
    directions [R,3]). Ids beyond the frame (chunk padding) produce
    harmless rays the caller masks out.
    """
    H, W = cfg.height, cfg.width
    spp = cfg.samples_per_pixel
    quirks = cfg.quirks

    pixel = (ray_id // spp).astype(jnp.float32)
    sample = (ray_id % spp).astype(jnp.float32)
    xs = jnp.mod(pixel, W)
    ys = jnp.floor(pixel / W)

    if cfg.grid_size > 0:
        if quirks.diagonal_jitter:
            # One r per sample, reused for both axes (src/main.cpp:52-54).
            r = sampling.uniform(base_key, ray_id, 0, sampling.PURPOSE_JITTER)
            jx, jy = r, r
        else:
            # Stratified: sample s covers cell (s // n, s % n) of the n×n grid.
            n = cfg.grid_size
            ci, cj = jnp.floor(sample / n), jnp.mod(sample, n)
            r2 = sampling.uniform(base_key, ray_id, 0, sampling.PURPOSE_JITTER, (2,))
            jx = (cj + r2[:, 0]) / n
            jy = (ci + r2[:, 1]) / n
    else:
        jx = jy = 0.5

    inv_w, inv_h = 1.0 / W, 1.0 / H
    aspect = W / float(H)
    angle = jnp.tan(jnp.pi * 0.5 * cfg.fov / 180.0).astype(jnp.float32)
    u = (2.0 * ((xs + jx) * inv_w) - 1.0) * angle * aspect  # [R]
    v = (1.0 - 2.0 * ((ys + jy) * inv_h)) * angle

    right = camera_right(camera)
    d = (
        camera.direction[None, :]
        + u[:, None] * right[None, :]
        + v[:, None] * camera.up[None, :]
    )
    if not quirks.unnormalized_ray_dirs:
        d = normalize(d)
    o = jnp.broadcast_to(camera.position[None, :], d.shape)
    return o, d
