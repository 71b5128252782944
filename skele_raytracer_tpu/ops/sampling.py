"""Counter-based random sampling and hemisphere utilities.

The reference uses shared-state libc `rand()` inside its OpenMP region
(src/main.cpp:52, src/raytrace.h:119-120) — a data race that makes runs
unreproducible. The CUDA build prefigures the fix with deterministic
per-pixel seeding (`curand_init(5351 * pixel)`, cudasrc/main.cu:53). Here
every draw comes from an explicit **counter-based threefry2x32**: the key
encodes (seed, bounce, purpose) and the counter is (ray_id, draw_index),
so renders are bitwise identical across any device sharding, chunking, or
replay — and the NumPy test oracle reproduces the exact same streams.

The generator is implemented directly on [R, n] uint32 arrays (pure VPU
bit ops, no vmap, no per-ray key objects): deriving 10^5+ per-ray keys via
vmapped `jax.random.fold_in` costs ~10 s/chunk on TPU through this stack,
while the explicit counter form costs milliseconds — this IS the
TPU-native design for per-ray RNG.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from skele_raytracer_tpu.config import Quirks

# Purpose tags for independent streams per (ray, bounce).
PURPOSE_JITTER = 0  # supersampling pixel jitter (src/main.cpp:52)
PURPOSE_PATH = 1  # MC hemisphere r1, r2 (src/raytrace.h:119-120)
PURPOSE_FOG = 2  # fog interaction + phase function (src/blinn_phong.h:30, utils.h:218-221)

_PARITY = np.uint32(0x1BD11BDA)
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_GOLDEN = np.uint32(0x9E3779B9)


def threefry2x32(k0, k1, x0, x1, xp=jnp):
    """Threefry-2x32, 20 rounds (the same algorithm jax.random uses).

    k0, k1: uint32 key words (scalars or arrays broadcastable to x).
    x0, x1: uint32 counter words. Returns (y0, y1) uint32.
    `xp` lets the NumPy oracle run the identical code (xp=np).
    """
    u32 = lambda v: v.astype(np.uint32) if hasattr(v, "astype") else np.uint32(v)
    k0, k1, x0, x1 = u32(k0), u32(k1), u32(x0), u32(x1)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)

    def rotl(v, r):
        return (v << np.uint32(r)) | (v >> np.uint32(32 - r))

    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for g in range(5):
        rots = _ROT_A if g % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(g + 1) % 3]
        x1 = x1 + ks[(g + 2) % 3] + np.uint32(g + 1)
    return x0, x1


def _stream_key_words(seed, bounce, purpose):
    """(k0, k1) uint32 key words for the (seed, bounce, purpose) stream."""
    k0 = jnp.asarray(seed, jnp.uint32)
    k1 = (
        jnp.asarray(bounce, jnp.uint32) * _GOLDEN
        + jnp.asarray(purpose, jnp.uint32)
    )
    return k0, k1


def bits_to_unit(bits, xp=jnp):
    """uint32 -> float32 in [0, 1): top 24 bits scaled by 2^-24."""
    return (bits >> np.uint32(8)).astype(np.float32) * np.float32(2**-24)


def uniform(seed, ray_id, bounce, purpose, shape=()):
    """U[0,1) draws, shape [len(ray_id), *shape].

    seed: uint32 scalar (render seed). ray_id: [R] uint32 — the counter
    identity that makes draws independent of chunking/sharding. bounce,
    purpose: scalars selecting the stream.

    Draw i comes from word i%2 of threefry counter (ray_id, i//2): each
    threefry2x32 produces TWO independent uniform words, and consuming
    both halves the generator invocations — ~130 VPU ops each, the
    single largest op block per ray-bounce in the whole-frame kernel
    (whose in-register _draw2 consumes the identical mapping). The
    NumPy oracle (uniform_np) and the kernel change in lockstep, so
    every cross-implementation RNG identity is preserved.
    """
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    m = (n + 1) // 2
    k0, k1 = _stream_key_words(seed, bounce, purpose)
    x0 = jnp.broadcast_to(ray_id.astype(jnp.uint32)[:, None], (ray_id.shape[0], m))
    x1 = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.uint32)[None, :], (ray_id.shape[0], m)
    )
    y0, y1 = threefry2x32(k0, k1, x0, x1)
    u = jnp.stack([bits_to_unit(y0), bits_to_unit(y1)], axis=-1).reshape(
        ray_id.shape[0], 2 * m
    )[:, :n]
    return u.reshape((ray_id.shape[0],) + tuple(shape))


def uniform_np(seed, ray_id, bounce, purpose, shape=()):
    """NumPy mirror of `uniform` for the serial test oracle — bit-identical
    streams (same threefry code via xp=np)."""
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    m = (n + 1) // 2
    with np.errstate(over="ignore"):
        k0 = np.uint32(seed)
        k1 = np.uint32((int(bounce) * int(_GOLDEN) + int(purpose)) & 0xFFFFFFFF)
    ray_id = np.asarray(ray_id, np.uint32).reshape(-1)
    with np.errstate(over="ignore"):
        x0 = np.broadcast_to(ray_id[:, None], (ray_id.shape[0], m)).astype(np.uint32)
        x1 = np.broadcast_to(
            np.arange(m, dtype=np.uint32)[None, :], (ray_id.shape[0], m)
        ).astype(np.uint32)
        y0, y1 = threefry2x32(k0, k1, x0, x1, xp=np)
    u = np.stack([bits_to_unit(y0, xp=np), bits_to_unit(y1, xp=np)],
                 axis=-1).reshape(ray_id.shape[0], 2 * m)[:, :n]
    return u.reshape((ray_id.shape[0],) + tuple(shape))


def uniform_sample_hemi(r1, r2):
    """Hemisphere sample in tangent space, y-up (reference
    `uniform_sample_hemi`, src/raytrace.h:22-30): NOT cosine-weighted; the
    integrator applies the r1 cosine weight explicitly (src/raytrace.h:130).
    r1, r2: [...]; returns [..., 3]."""
    pos = 1.0 - r1 * r1 > 0
    s_theta = jnp.sqrt(jnp.where(pos, 1.0 - r1 * r1, 1.0)) * pos
    phi = 2.0 * jnp.pi * r2
    return jnp.stack([s_theta * jnp.cos(phi), r1, s_theta * jnp.sin(phi)], axis=-1)


def tangent_frame(normal, use_x=None):
    """Orthogonal-ish frame around `normal` (reference
    `transform_coordinate_space`, src/utils.h:148-165). Returns
    (perp_to_normal, perp_to_both). normal: [..., 3].

    `use_x` optionally FREEZES the |nx| > |ny| branch choice (a discrete
    selection, like hit selection): the fixed-topology gradient check
    re-evaluates the replay at perturbed geometry with the base scene's
    branch bits, so finite differences sample the same locally-smooth
    function autodiff differentiates (the branch flip is a jump
    discontinuity FD would otherwise integrate, a constant-in-eps bias
    measured at ~0.7% of the geometry gradient)."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    if use_x is None:
        use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    pn_a = jnp.stack([nz * inv_a, jnp.zeros_like(nx), -nx * inv_a], axis=-1)
    pn_b = jnp.stack([jnp.zeros_like(nx), -nz * inv_b, ny * inv_b], axis=-1)
    perp_to_normal = jnp.where(use_x[..., None], pn_a, pn_b)
    perp_to_both = jnp.cross(normal, perp_to_normal)
    return perp_to_normal, perp_to_both


def to_world(sample, normal, *, quirks: Quirks, use_x=None):
    """Tangent-space sample -> world space.

    Parity mode replicates the reference's skewed transform
    (src/raytrace.h:123-125): the third basis column mixes perp_to_normal.x
    with perp_to_both.{y,z}. Clean mode uses the proper orthonormal frame.
    sample, normal: [..., 3]. `use_x` freezes the frame branch (see
    tangent_frame).
    """
    pn, pb = tangent_frame(normal, use_x=use_x)
    sx, sy, sz = sample[..., 0:1], sample[..., 1:2], sample[..., 2:3]
    if quirks.buggy_tangent_frame:
        third = jnp.stack(
            [pn[..., 0], pb[..., 1], pb[..., 2]], axis=-1
        )  # the bug: y/z rows reuse perp_to_both
        return sx * pb + sy * normal + sz * third
    return sx * pb + sy * normal + sz * pn
