"""Pallas TPU kernels for the intersection hot path.

The TPU-native analog of the reference's CUDA device kernels
(cudasrc/raytrace.h:80-156 sphere/triangle scans inside `shade`): instead
of one thread per pixel looping over primitives, a grid of ray tiles
processes [TILE_R, prims] blocks entirely in VMEM, with the inner
ray x primitive work mapped onto the MXU as matrix multiplies.

Sphere test as matmuls (reference math: src/utils.h:87-121):
    b      = 2 (d.o - d.c)               -> d @ centers^T   [TR, S]
    c_term = |o|^2 - 2 o.c + |c|^2 - r^2 -> o @ centers^T   [TR, S]
so the whole quadratic needs two K=3 contractions plus elementwise VPU ops.

Triangle test as ONE matmul: rewrite Moller-Trumbore's per-(ray, tri)
cross/dot products (reference src/utils.h:181-213) with scalar triple
product identities. With per-ray features  d, w = o x d, o  and per-tri
constants A = e2 x e1, B = e2 x v0, C = v0 x e1, D = e1 x e2, k = e2 . C:
    det     =  d . A
    u * det =  d . B - w . e2     (reference's sign-flipped u; clean mode
                                   negates, giving standard MT)
    v * det = -w . e1 - d . C
    t * det =  o . D - k
All four are rows of a single [TR, 9] @ [9, 4*TT] MXU contraction —
intersection becomes matmul work instead of bandwidth-bound broadcasting,
which is exactly where a TPU wants it. Triangles stream through the grid's
second axis in TILE_T blocks with a running (t, index) minimum, so
arbitrarily large meshes never leave HBM more than once per ray tile.

Kernel-internal selection uses min + one-hot (no argmin/gather — those
lower poorly in Mosaic); ray features are precomputed outside the kernel
(a [R, 9] array is 36 B/ray, trivial next to the [TR, T] inner work).

Kernels are forward-only (used for rendering); differentiation uses the
jnp path in ops/geometry.py, which computes identical math to float
tolerance (dispatch in models/integrator.py via RenderConfig.backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skele_raytracer_tpu.config import CLEAN_T_EPS, TRIANGLE_DET_EPS, Quirks

TILE_R = 512  # rays per tile (sublane-major axis of the [TR, prims] work)
TILE_T = 512  # triangles per tile streamed through VMEM
# TILE_R x TILE_T sizing: the kernel holds ~8 [TR, TT] f32 intermediates
# (prods x4, u, v, t, valid) -> 512x512 x 8 x 4B = 8 MB, safely under the
# ~16 MB VMEM budget; 1024x512 was measured to overflow (18.6 MB).

_BIG = np.float32(3.0e38)  # stand-in for +inf (avoids inf*0 in kernels)
_BIG_I = np.int32(2**30)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(a, n, fill=0.0):
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad, constant_values=fill)


def _first_min(t_all, n):
    """(t_min [TR], idx [TR]) — smallest value per row, FIRST index among
    ties (the reference's strict-< scan order), via min + one-hot."""
    t_min = jnp.min(t_all, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
    idx = jnp.min(
        jnp.where(t_all == t_min[:, None], cols, _BIG_I), axis=1
    ).astype(jnp.int32)
    return t_min, jnp.minimum(idx, n - 1)


# ---------------------------------------------------------------------------
# Spheres
# ---------------------------------------------------------------------------


def _sphere_kernel(o_ref, d_ref, cen_ref, aux_ref, t_ref, idx_ref, *, t_clip):
    o = o_ref[:]  # [TR, 3]
    d = d_ref[:]
    cen = cen_ref[:]  # [S, 3]
    c_const = aux_ref[0, :]  # |c|^2 - r^2  [S]
    msk = aux_ref[1, :]  # [S]

    a = jnp.sum(d * d, axis=1, keepdims=True)  # [TR, 1]
    d_dot_c = jax.lax.dot_general(
        d, cen, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # [TR, S]
    o_dot_c = jax.lax.dot_general(
        o, cen, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    d_dot_o = jnp.sum(d * o, axis=1, keepdims=True)
    o_dot_o = jnp.sum(o * o, axis=1, keepdims=True)

    b = 2.0 * (d_dot_o - d_dot_c)  # [TR, S]
    c = o_dot_o - 2.0 * o_dot_c + c_const[None, :]
    disc = b * b - 4.0 * a * c
    pos = disc > 0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
    t2 = (-b - sq) / (2.0 * a)
    valid = (disc >= 0) & (t2 >= 0) & (t2 > t_clip) & (msk[None, :] > 0)
    t_all = jnp.where(valid, t2, _BIG)
    t_min, idx = _first_min(t_all, cen.shape[0])
    t_ref[:, 0] = t_min
    idx_ref[:, 0] = idx


def sphere_nearest(o, d, center, radius, mask, *, quirks: Quirks):
    """(t [R], index [R] int32, hit [R] bool) — nearest sphere per ray.
    Same semantics as geometry.nearest_sphere (t = +inf when no hit)."""
    t_clip = 1.0 if quirks.near_clip_t_le_1 else CLEAN_T_EPS
    R = o.shape[0]
    rp = -(-R // TILE_R) * TILE_R
    o_p, d_p = _pad_rows(o, rp), _pad_rows(d, rp, fill=1.0)
    aux = jnp.stack([jnp.sum(center * center, axis=1) - radius * radius, mask])

    t, idx = pl.pallas_call(
        functools.partial(_sphere_kernel, t_clip=t_clip),
        grid=(rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(o_p, d_p, center, aux)
    t, idx = t[:R, 0], idx[:R, 0]
    hit = t < _BIG
    return jnp.where(hit, t, jnp.inf), idx, hit


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------


def ray_features(o, d):
    """[R, 9] MT feature rows: [d, o x d, o] (module docstring)."""
    return jnp.concatenate([d, jnp.cross(o, d), o], axis=1)


def pack_triangles(v0, v1, v2):
    """Per-triangle constant matrix K [9, 4, T] for the single-matmul MT
    test, plus the k [T] offsets of the t row.

    Feature-row layout: [d (0:3), w = o x d (3:6), o (6:9)].
    Column layout (axis 1): [det, u_num, v_num, t_num].
    """
    e1 = v1 - v0
    e2 = v2 - v0
    A = jnp.cross(e2, e1)
    B = jnp.cross(e2, v0)
    C = jnp.cross(v0, e1)
    D = jnp.cross(e1, e2)
    k = jnp.sum(e2 * C, axis=1)  # [T]

    T = v0.shape[0]
    K = jnp.zeros((9, 4, T), jnp.float32)
    K = K.at[0:3, 0, :].set(A.T)  # det      = d.A
    K = K.at[0:3, 1, :].set(B.T)  # u_num   += d.B
    K = K.at[3:6, 1, :].set(-e2.T)  #         -= w.e2
    K = K.at[0:3, 2, :].set(-C.T)  # v_num   -= d.C
    K = K.at[3:6, 2, :].set(-e1.T)  #         -= w.e1
    K = K.at[6:9, 3, :].set(D.T)  # t_num    = o.D (- k)
    return K, k


def _triangle_kernel(
    f_ref, K_ref, kof_ref, msk_ref, t_ref, idx_ref, uv_ref, *, sign, t_clip, n_t
):
    j = pl.program_id(1)

    feats = f_ref[:]  # [TR, 9]
    K = K_ref[:].reshape(9, 4 * n_t)
    prods = jax.lax.dot_general(
        feats, K, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    ).reshape(-1, 4, n_t)
    det = prods[:, 0, :]
    u_num = sign * prods[:, 1, :]
    v_num = prods[:, 2, :]
    t_num = prods[:, 3, :] - kof_ref[0, :][None, :]

    ok = jnp.abs(det) >= TRIANGLE_DET_EPS
    inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = (
        ok
        & (u >= 0)
        & (u <= 1)
        & (v >= 0)
        & (u + v <= 1)
        & (msk_ref[0, :][None, :] > 0)
    )
    if t_clip is not None:
        valid = valid & (t > t_clip)
    t_all = jnp.where(valid, t, _BIG)

    t_tile, a_tile = _first_min(t_all, n_t)
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1) == a_tile[:, None]
    ).astype(jnp.float32)
    u_tile = jnp.sum(u * one_hot, axis=1)
    v_tile = jnp.sum(v * one_hot, axis=1)
    idx_tile = a_tile + j * n_t

    @pl.when(j == 0)
    def _():
        t_ref[:, 0] = t_tile
        idx_ref[:, 0] = idx_tile
        uv_ref[:, 0] = u_tile
        uv_ref[:, 1] = v_tile

    @pl.when(j > 0)
    def _():
        # strict <: earlier tiles win ties, matching the reference scan
        # loop (src/raytrace.h:176-186).
        better = t_tile < t_ref[:, 0]
        t_ref[:, 0] = jnp.where(better, t_tile, t_ref[:, 0])
        idx_ref[:, 0] = jnp.where(better, idx_tile, idx_ref[:, 0])
        uv_ref[:, 0] = jnp.where(better, u_tile, uv_ref[:, 0])
        uv_ref[:, 1] = jnp.where(better, v_tile, uv_ref[:, 1])


def triangle_nearest(o, d, v0, v1, v2, mask, *, quirks: Quirks):
    """(t, index, hit, u, v) — nearest triangle per ray, reference
    semantics (geometry.nearest_triangle): parity accepts negative t and
    the mirrored-u variant; clean is standard MT with t > CLEAN_T_EPS."""
    sign = 1.0 if quirks.reference_triangle_test else -1.0
    t_clip = None if quirks.reference_triangle_test else CLEAN_T_EPS
    R, T = o.shape[0], v0.shape[0]
    rp = -(-R // TILE_R) * TILE_R
    tile_t = min(TILE_T, max(8, -(-T // 8) * 8))
    tp = -(-T // tile_t) * tile_t

    K, k = pack_triangles(_pad_rows(v0, tp), _pad_rows(v1, tp), _pad_rows(v2, tp))
    kof = k[None, :]  # [1, T] — 2D for clean VMEM layout
    msk = _pad_rows(mask, tp)[None, :]
    feats = _pad_rows(ray_features(o, d), rp, fill=1.0)

    t, idx, uv = pl.pallas_call(
        functools.partial(
            _triangle_kernel, sign=sign, t_clip=t_clip, n_t=tile_t
        ),
        grid=(rp // TILE_R, tp // tile_t),
        in_specs=[
            pl.BlockSpec((TILE_R, 9), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 4, tile_t), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
            jax.ShapeDtypeStruct((rp, 2), jnp.float32),
        ),
        interpret=_interpret(),
    )(feats, K, kof, msk)

    t, idx, uv = t[:R, 0], idx[:R, 0], uv[:R]
    hit = t < _BIG
    return jnp.where(hit, t, jnp.inf), jnp.minimum(idx, T - 1), hit, uv[:, 0], uv[:, 1]
