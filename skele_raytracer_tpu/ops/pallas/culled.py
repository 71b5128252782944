"""Cluster-culled triangle intersection kernel (the dragon.scn path).

Composes ops/accel.py's Morton-clustered mesh with the single-matmul
Moller-Trumbore formulation of ops/pallas/intersect.py, and adds the part
neither can do alone: per-ray-tile work SKIPPING.

Per ray tile, a host-side (jnp) AABB pass produces a shortlist of the
clusters any ray in the tile can enter plus a count. The kernel is a
1-D grid over ray tiles with the shortlist as a scalar-prefetch operand;
the cluster triangle blocks stay in HBM and are fetched on demand with
double-buffered async DMA driven by a DYNAMIC fori_loop over the tile's
count — clusters no ray in the tile touches cost neither FLOPs nor HBM
bandwidth. Coherent primary tiles touch a handful of dragon's ~80
clusters, cutting the [R, T] brute force (reference src/raytrace.h:170-187)
by an order of magnitude or more.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skele_raytracer_tpu.config import CLEAN_T_EPS, TRIANGLE_DET_EPS, Quirks
from skele_raytracer_tpu.ops import accel
from skele_raytracer_tpu.ops.pallas.intersect import (
    _BIG,
    _BIG_I,
    _interpret,
    _pad_rows,
    pack_triangles,
    ray_features,
)

TILE_R = 512


def _culled_kernel(
    # scalar prefetch
    shortlist_ref,  # [n_tiles, C] int32
    count_ref,  # [n_tiles] int32
    # VMEM inputs
    f_ref,  # [TILE_R, 9]
    # HBM inputs (manual DMA)
    kc_ref,  # [C, 9, 4, cs]
    aux_ref,  # [C, 3, cs]  (row 0 = k offsets, row 1 = mask, row 2 = orig index)
    # outputs
    t_ref,  # [TILE_R, 1]
    idx_ref,  # [TILE_R, 1]  ORIGINAL triangle index of the winner
    # scratch
    kbuf,  # [2, 9, 4, cs]
    abuf,  # [2, 3, cs]
    sems,  # DMA sems [2, 2]
    *,
    sign,
    t_clip,
    cs,
    resident,
):
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[:]

    t_ref[:, 0] = jnp.full((feats.shape[0],), _BIG, jnp.float32)
    idx_ref[:, 0] = jnp.full((feats.shape[0],), _BIG_I, jnp.int32)

    def dma(slot, pos):
        ci = shortlist_ref[i, pos]
        return (
            pltpu.make_async_copy(kc_ref.at[ci], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(aux_ref.at[ci], abuf.at[slot], sems.at[slot, 1]),
        )

    if not resident:

        @pl.when(n_active > 0)
        def _():
            for c in dma(0, 0):
                c.start()

    def body(p, _):
        # `resident` (static): cluster blocks live wholly in VMEM — read
        # directly by dynamic leading-axis index, zero DMA (megakernel.py
        # RESIDENT_BUDGET_BYTES rationale).
        if resident:
            ci = shortlist_ref[i, p]
            K = kc_ref[ci].reshape(9, 4 * cs)
            kof_blk = aux_ref[ci, 0, :]
            msk_blk = aux_ref[ci, 1, :]
            orig_row = aux_ref[ci, 2, :]
        else:
            slot = jax.lax.rem(p, 2)
            nxt = jax.lax.rem(p + 1, 2)

            @pl.when(p + 1 < n_active)
            def _():
                for c in dma(nxt, p + 1):
                    c.start()

            for c in dma(slot, p):
                c.wait()

            K = kbuf[slot].reshape(9, 4 * cs)
            kof_blk = abuf[slot, 0, :]
            msk_blk = abuf[slot, 1, :]
            orig_row = abuf[slot, 2, :]

        prods = jax.lax.dot_general(
            feats, K, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        ).reshape(-1, 4, cs)
        det = prods[:, 0, :]
        u_num = sign * prods[:, 1, :]
        v_num = prods[:, 2, :]
        t_num = prods[:, 3, :] - kof_blk[None, :]

        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        valid = (
            ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            & (msk_blk[None, :] > 0)
        )
        if t_clip is not None:
            valid = valid & (t > t_clip)
        t_all = jnp.where(valid, t, _BIG)

        # Exact-t ties resolve to the MINIMUM ORIGINAL index — the
        # reference's strict-< scan keeps the first triangle in file order
        # (src/raytrace.h:176-186), which Morton reordering would otherwise
        # permute. aux row 2 carries each sorted row's original index.
        t_blk = jnp.min(t_all, axis=1)
        is_min = t_all == t_blk[:, None]
        orig_f = orig_row[None, :]  # [1, cs] original indices (f32)
        orig_blk = jnp.min(
            jnp.where(is_min, orig_f, jnp.float32(_BIG_I)), axis=1
        ).astype(jnp.int32)
        better = (t_blk < t_ref[:, 0]) | (
            (t_blk == t_ref[:, 0]) & (orig_blk < idx_ref[:, 0])
        )
        t_ref[:, 0] = jnp.where(better, t_blk, t_ref[:, 0])
        idx_ref[:, 0] = jnp.where(better, orig_blk, idx_ref[:, 0])
        return 0

    jax.lax.fori_loop(0, n_active, body, 0)


def _spatial_sort_keys(o, d, lo, hi):
    """uint32 sort key per ray: 24-bit Morton code of the origin
    (quantized to the mesh bounds) + 3-bit direction octant. Sorting rays
    by this key groups spatially/directionally similar rays into the same
    kernel tile, shrinking per-tile cluster shortlists — the classic
    wavefront ray-reordering trick, done as one dense argsort."""
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((o - lo) / span * 255.0, 0.0, 255.0).astype(jnp.uint32)

    def spread8(v):  # 8 bits -> every 3rd bit of 24
        v = (v | (v << np.uint32(8))) & np.uint32(0x00F00F)
        v = (v | (v << np.uint32(4))) & np.uint32(0x0C30C3)
        v = (v | (v << np.uint32(2))) & np.uint32(0x249249)
        return v

    morton = (
        (spread8(q[:, 0]) << np.uint32(2))
        | (spread8(q[:, 1]) << np.uint32(1))
        | spread8(q[:, 2])
    )
    octant = (
        (d[:, 0] > 0).astype(jnp.uint32) * 4
        + (d[:, 1] > 0).astype(jnp.uint32) * 2
        + (d[:, 2] > 0).astype(jnp.uint32)
    )
    return (morton << np.uint32(3)) | octant


def triangle_nearest_culled(
    o, d, mesh: accel.ClusteredMesh, *, quirks: Quirks, reorder: bool = True
):
    """(t [R], original_index [R] int32, hit [R] bool) — nearest triangle
    via cluster culling. Semantics match the brute-force kernels to float
    tolerance; parity's negative-t acceptance forces `allow_negative` AABB
    tests (boxes behind the origin still count, SURVEY §2.9.10).

    reorder: spatially sort rays before tiling (_spatial_sort_keys) and
    scatter results back — per-ray results are order-independent, so the
    output is identical; only the per-tile shortlists (and therefore the
    work skipped) change. Costs one argsort + two gathers; pays off
    whenever the ray batch is incoherent (MC bounce rays, shadow rays).
    """
    R = o.shape[0]
    if reorder:
        keys = _spatial_sort_keys(o, d, mesh.aabb_lo.min(0), mesh.aabb_hi.max(0))
        order_r = jnp.argsort(keys).astype(jnp.int32)
        out = triangle_nearest_culled(
            o[order_r], d[order_r], mesh, quirks=quirks, reorder=False
        )
        inv = jnp.zeros((R,), jnp.int32).at[order_r].set(
            jnp.arange(R, dtype=jnp.int32)
        )
        return tuple(x[inv] for x in out)

    sign = 1.0 if quirks.reference_triangle_test else -1.0
    t_clip = None if quirks.reference_triangle_test else CLEAN_T_EPS
    C = mesh.n_clusters
    cs = mesh.v0.shape[0] // C  # cluster size baked into the mesh build
    rp = -(-R // TILE_R) * TILE_R
    n_tiles = rp // TILE_R

    # --- host-side (jnp) cull: per-tile cluster shortlist -----------------
    amask = accel.ray_aabb_mask(
        o, d, mesh.aabb_lo, mesh.aabb_hi,
        allow_negative=quirks.reference_triangle_test,
    )  # [R, C]
    amask = _pad_rows(amask, rp).reshape(n_tiles, TILE_R, C)
    tile_needs = jnp.any(amask, axis=1)  # [n_tiles, C]
    # Needed clusters first (stable order), padding after.
    order = jnp.argsort(~tile_needs, axis=1, stable=True).astype(jnp.int32)
    counts = jnp.sum(tile_needs, axis=1).astype(jnp.int32)

    # --- per-cluster constant blocks -------------------------------------
    K, kof = pack_triangles(mesh.v0, mesh.v1, mesh.v2)  # [9,4,Tc], [Tc]
    kc = K.reshape(9, 4, C, cs).transpose(2, 0, 1, 3)  # [C, 9, 4, cs]
    aux = jnp.stack(
        [
            kof.reshape(C, cs),
            mesh.mask.reshape(C, cs),
            mesh.perm.astype(jnp.float32).reshape(C, cs),
        ],
        axis=1,
    )  # [C, 3, cs]
    feats = _pad_rows(ray_features(o, d), rp, fill=1.0)

    from skele_raytracer_tpu.ops.pallas.megakernel import (
        RESIDENT_BUDGET_BYTES,
        mesh_resident_bytes,
    )

    resident = mesh_resident_bytes(C, cs) <= RESIDENT_BUDGET_BYTES
    mesh_space = pltpu.VMEM if resident else pl.ANY

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_R, 9), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=mesh_space),
            pl.BlockSpec(memory_space=mesh_space),
        ],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 4, cs), jnp.float32),
            pltpu.VMEM((2, 3, cs), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(
            _culled_kernel, sign=sign, t_clip=t_clip, cs=cs, resident=resident
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(order, counts, feats, kc, aux)

    t, idx = t[:R, 0], idx[:R, 0]
    hit = t < _BIG
    # idx already holds the ORIGINAL triangle index (tie-broken to the
    # minimum, matching the reference scan order); clamp the no-hit
    # sentinel for safe downstream gathers.
    n_orig = mesh.perm.shape[0]
    orig = jnp.minimum(idx, n_orig - 1)
    return jnp.where(hit, t, jnp.inf), orig, hit
