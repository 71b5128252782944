"""Counter-based random sampling and hemisphere utilities.

The reference uses shared-state libc `rand()` inside its OpenMP region
(src/main.cpp:52, src/raytrace.h:119-120) — a data race that makes runs
unreproducible. The CUDA build prefigures the fix with deterministic
per-pixel seeding (`curand_init(5351 * pixel)`, cudasrc/main.cu:53). Here
every random draw is keyed on (seed, ray_id, bounce, purpose) with threefry
(`jax.random.fold_in`), so renders are bitwise identical across any device
sharding, chunking, or replay — including the NumPy test oracle, which
derives the same keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skele_raytracer_tpu.config import Quirks

# Purpose tags for independent streams per (ray, bounce).
PURPOSE_JITTER = 0  # supersampling pixel jitter (src/main.cpp:52)
PURPOSE_PATH = 1  # MC hemisphere r1, r2 (src/raytrace.h:119-120)
PURPOSE_FOG = 2  # fog interaction + phase function (src/blinn_phong.h:30, utils.h:218-221)


def stream_key(base_key, ray_id, bounce, purpose):
    """Derive the per-(ray, bounce, purpose) key. Vectorizes over ray_id."""
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base_key, ray_id)
    k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(k, bounce)
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(k, purpose)


def uniform(base_key, ray_id, bounce, purpose, shape=()):
    """U[0,1) draws, shape [len(ray_id), *shape]."""
    keys = stream_key(base_key, ray_id, bounce, purpose)
    return jax.vmap(lambda k: jax.random.uniform(k, shape))(keys)


def uniform_sample_hemi(r1, r2):
    """Hemisphere sample in tangent space, y-up (reference
    `uniform_sample_hemi`, src/raytrace.h:22-30): NOT cosine-weighted; the
    integrator applies the r1 cosine weight explicitly (src/raytrace.h:130).
    r1, r2: [...]; returns [..., 3]."""
    s_theta = jnp.sqrt(jnp.maximum(1.0 - r1 * r1, 0.0))
    phi = 2.0 * jnp.pi * r2
    return jnp.stack([s_theta * jnp.cos(phi), r1, s_theta * jnp.sin(phi)], axis=-1)


def tangent_frame(normal):
    """Orthogonal-ish frame around `normal` (reference
    `transform_coordinate_space`, src/utils.h:148-165). Returns
    (perp_to_normal, perp_to_both). normal: [..., 3]."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    pn_a = jnp.stack([nz * inv_a, jnp.zeros_like(nx), -nx * inv_a], axis=-1)
    pn_b = jnp.stack([jnp.zeros_like(nx), -nz * inv_b, ny * inv_b], axis=-1)
    perp_to_normal = jnp.where(use_x[..., None], pn_a, pn_b)
    perp_to_both = jnp.cross(normal, perp_to_normal)
    return perp_to_normal, perp_to_both


def to_world(sample, normal, *, quirks: Quirks):
    """Tangent-space sample -> world space.

    Parity mode replicates the reference's skewed transform
    (src/raytrace.h:123-125): the third basis column mixes perp_to_normal.x
    with perp_to_both.{y,z}. Clean mode uses the proper orthonormal frame.
    sample, normal: [..., 3].
    """
    pn, pb = tangent_frame(normal)
    sx, sy, sz = sample[..., 0:1], sample[..., 1:2], sample[..., 2:3]
    if quirks.buggy_tangent_frame:
        third = jnp.stack(
            [pn[..., 0], pb[..., 1], pb[..., 2]], axis=-1
        )  # the bug: y/z rows reuse perp_to_both
        return sx * pb + sy * normal + sz * third
    return sx * pb + sy * normal + sz * pn
