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
)

def _ray_features10(o, d):
    """[R, 10] MT feature rows [d, o x d, o, 1]: intersect.ray_features
    plus the constant 1.0 column the kof fold contracts against
    (pack_cluster_blocks). Emitted in ONE concatenate so no separate pad
    op appears in the chunk loop."""
    return jnp.concatenate(
        [d, jnp.cross(o, d), o, jnp.ones((o.shape[0], 1), o.dtype)], axis=1)


TILE_R = 256  # rays per tile: smaller tiles shrink the tile-union cluster
# footprint of incoherent batches (dragon sweep: 256 beats 512 on every
# config once the in-kernel front-to-back pretest prunes the tail)


MAX_TILES = 512  # tiles per pallas_call: bounds the kernel's SMEM tables


GROUP_C = 2  # resident mode: shortlisted clusters per loop iteration.
# Each group member is processed by its own per-plane mt_block (no width
# concatenation — see _plane_dot), so the group size only sets the
# early-exit granularity and the loop/settle amortization. Re-swept after
# the per-plane rewrite: G=2 wins or ties every dragon config (parity
# shadows 0.045 -> 0.038 s vs G=4; gillum16 0.298 -> 0.292; clean
# shadows flat), consistent with finer front-to-back exit granularity
# now that wasted group width no longer trades against iteration count.


SUB_T = 1  # resident mode: ray subtiles processed per grid step.
# After the footprint sort the tile-union shortlists are NARROW (dragon
# bounce-1 chunks: mean 2.6 clusters per 256-ray tile, ~1 group
# iteration), so the per-grid-step fixed cost — the small input/output
# block DMAs and step turnaround, ~10 us — dominates the ~3-6 us of
# group math. Packing SUB_T shortlist tiles into one grid step keeps
# the 256-ray shortlist granularity (what the sort narrows) while
# amortizing the step overhead 4x. Streaming (non-resident) launches
# keep sub_t=1: their per-step cost is the cluster DMA chain itself.


def _batched_launch(launch, order, counts, ent, feats):
    """Run a tile-grid kernel launch in <= MAX_TILES batches (lax.map).

    The scalar-prefetch shortlist/count tables and the sorted
    entry-distance table live in SMEM sized by the GRID, so one launch
    over a huge ray chunk overflows scalar memory (observed as a
    remote-compiler crash past ~512 tiles x 80 clusters). Fixed-size
    batches keep the kernel's SMEM footprint constant while letting
    callers raise rays-per-chunk; every batch reuses the same compiled
    program (static MAX_TILES grid).
    """
    n_tiles = order.shape[0]
    # The per-launch SMEM footprint is ~(shortlist + ent) = tiles*(8*C+8)
    # bytes against the ~1 MB scalar memory; cap the batch so fine
    # clusterings (large C) of big meshes shrink the grid instead of
    # crashing the compiler.
    C = order.shape[1]
    max_tiles = max(64, min(MAX_TILES, (700 * 1024) // (8 * C + 8)))
    if n_tiles <= max_tiles:
        return launch(order, counts, ent, feats)
    k = -(-n_tiles // max_tiles)
    pad_t = k * max_tiles - n_tiles
    xs = (
        jnp.pad(order, ((0, pad_t), (0, 0))).reshape(k, max_tiles, -1),
        jnp.pad(counts, (0, pad_t)).reshape(k, max_tiles),
        jnp.pad(ent, ((0, pad_t), (0, 0)), constant_values=_BIG)
        .reshape(k, max_tiles, -1),
        jnp.pad(feats, ((0, pad_t * TILE_R), (0, 0)), constant_values=1.0)
        .reshape(k, max_tiles * TILE_R, -1),
    )
    outs = jax.lax.map(lambda a: launch(*a), xs)

    def crop(y):  # launches return flat [R_b] vectors (row-major planes)
        return y.reshape(-1)[: n_tiles * TILE_R]

    if isinstance(outs, tuple):
        return tuple(crop(y) for y in outs)
    return crop(outs)


def _plane_dot(feats, K, passes):
    """[R, w] product of ray features against ONE MT plane block [10, w].

    The kernels issue FOUR of these per cluster block (det, u_num, v_num,
    t_num) instead of one 4x-wide matmul: the wide form's
    `prods.reshape(-1, 4, w)` + per-plane slicing is a Mosaic RELAYOUT of
    the whole [R, 4w] product and was measured to dominate the kernel
    (bounce-wave launch 4.78 -> 1.42 ms when removed). Per-plane outputs
    feed the epilogue directly from registers.

    passes=6: full-f32 MXU matmul (Precision.HIGHEST) — the exactness
    anchor. passes=3: bf16x3 with the lo*lo term dropped — halves the
    MXU time (the K=10 contraction pads ~13x, so matmul passes dominate
    the MXU cost). Measured on the dragon bounce wave: identical hit
    records and winning indices, t perturbed <= 4e-5 relative on 2.8% of
    rays — used only for incoherent (bounce/shadow) waves, never on the
    parity-golden-facing coherent path.
    """
    dims = (((1,), (0,)), ((), ()))
    if passes == 3:
        f_hi = feats.astype(jnp.bfloat16)
        f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        K_hi = K.astype(jnp.bfloat16)
        K_lo = (K - K_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dg = lambda a, b: jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32)
        return dg(f_hi, K_hi) + (dg(f_hi, K_lo) + dg(f_lo, K_hi))
    return jax.lax.dot_general(
        feats, K, dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def pack_cluster_blocks(mesh: accel.ClusteredMesh):
    """(k10 [C, 10, 4, cs], org [C, 1, cs]) — the culled kernels' cluster
    blocks, with two epilogue terms FOLDED into the matmul constants:

    * row 9 (against a constant 1.0 feature) carries -kof into the t
      column, so t_num needs no in-kernel subtraction;
    * padding/masked triangles have ALL-ZERO columns, so det = 0 fails
      the |det| >= eps test and the mask compare disappears.

    The fold moves the kof subtraction inside the matmul accumulation,
    which can perturb t by an ulp vs the subtract-after form (and rides
    the bf16x3 split on incoherent waves) — winning indices and hit
    flags are unchanged (kernel-lab bitwise check), and every consumer
    path already tolerates the mt_passes=3 t class.

    Meshes built by accel.build_clusters carry the blocks PREPACKED
    (mesh.k10/org, NumPy at build time): packing here put ~0.3 ms/chunk
    of block re-materialization + layout copies inside the render's
    chunk loop. The jnp fallback below serves ad-hoc meshes.
    """
    if getattr(mesh, "k10", None) is not None:
        return mesh.k10, mesh.org
    C = mesh.n_clusters
    cs = mesh.v0.shape[0] // C
    K, kof = pack_triangles(mesh.v0, mesh.v1, mesh.v2)  # [9,4,Tc], [Tc]
    kc = K.reshape(9, 4, C, cs).transpose(2, 0, 1, 3)  # [C, 9, 4, cs]
    row9 = jnp.zeros((C, 1, 4, cs), jnp.float32)
    row9 = row9.at[:, 0, 3, :].set(-kof.reshape(C, cs))
    k10 = jnp.concatenate([kc, row9], axis=1)  # [C, 10, 4, cs]
    k10 = k10 * (mesh.mask.reshape(C, 1, 1, cs) > 0)
    org = mesh.perm.astype(jnp.float32).reshape(C, 1, cs)
    return k10, org


def _culled_kernel(
    # scalar prefetch
    shortlist_ref,  # [n_tiles, C] int32
    count_ref,  # [n_tiles] int32
    # SMEM input
    ent_ref,  # [n_tiles, C+1] f32 sorted cluster entry distances
    # VMEM inputs
    f_ref,  # [TILE_R, 10] ray features + constant 1.0 (kof-fold feature)
    lo_ref,  # [C, 3] cluster AABB lo
    hi_ref,  # [C, 3] cluster AABB hi
    # HBM inputs (manual DMA)
    kc_ref,  # [C, 10, 4, cs] folded blocks (pack_cluster_blocks)
    org_ref,  # [C, 1, cs] original triangle index per sorted row
    # outputs
    t_ref,  # [TILE_R, 1]
    idx_ref,  # [TILE_R, 1]  ORIGINAL triangle index of the winner
    # scratch
    kbuf,  # [2, 10, 4, cs]
    obuf,  # [2, 1, cs]
    sems,  # DMA sems [2, 2]
    *,
    sign,
    t_clip,
    cs,
    resident,
    allow_negative,
    sub_t=1,
    group_c=GROUP_C,
    mt_passes=6,
):
    C_total = lo_ref.shape[0]
    tr = f_ref.shape[0] // sub_t  # rays per shortlist tile
    for s in range(sub_t):
        _culled_tile(
            pl.program_id(0) * sub_t + s if sub_t > 1 else pl.program_id(0),
            s * tr,
            tr,
            shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
            kc_ref, org_ref, t_ref, idx_ref, kbuf, obuf, sems,
            sign=sign, t_clip=t_clip, cs=cs, resident=resident,
            allow_negative=allow_negative, C_total=C_total,
            group_c=group_c, mt_passes=mt_passes,
        )


def _culled_tile(
    i,  # shortlist-tile index (grid step x sub_t + s)
    r0,  # first ray row of this tile within the grid step's block
    tr,  # rays per tile
    shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
    kc_ref, org_ref, t_ref, idx_ref, kbuf, obuf, sems,
    *,
    sign, t_clip, cs, resident, allow_negative, C_total, group_c=GROUP_C,
    mt_passes=6,
):
    n_active = count_ref[i]
    feats = f_ref[pl.ds(r0, tr), :]  # [tr, 10]
    d = feats[:, 0:3]
    o = feats[:, 6:9]

    def dma(slot, pos):
        ci = shortlist_ref[i, pos]
        return (
            pltpu.make_async_copy(kc_ref.at[ci], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(org_ref.at[ci], obuf.at[slot], sems.at[slot, 1]),
        )

    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)

    def mt_block(Kc, orig_row, t_cur, i_cur):
        """Per-plane MT test of ONE cluster block Kc [10, 4, cs] +
        nearest-t / tie-break update on the (t, idx) carries.

        Four narrow matmuls (one per MT plane, `_plane_dot` docstring)
        whose [tr, cs] outputs feed the epilogue straight from registers.
        kof and the triangle mask are folded into Kc
        (pack_cluster_blocks), so the epilogue is: rational bary tests
        (u >= 0 <=> u_num*det >= 0, u+v <= 1 <=> (u_num+v_num)*det <=
        det^2 — no guarded reciprocal, u <= 1 implied by v >= 0 &
        u+v <= 1; det^2 would only overflow at scene scales ~1e19 where
        f32 MT is already unusable), one reciprocal for t, the clip, and
        the two min-reductions.

        Exact-t ties resolve to the MINIMUM ORIGINAL index — the
        reference's strict-< scan keeps the first triangle in file order
        (src/raytrace.h:176-186), which Morton reordering would
        otherwise permute. The tie-break is gated on t_blk < _BIG so
        all-miss blocks never stamp junk indices onto miss rays
        (tiling-dependent streaming-vs-resident divergence otherwise)."""
        det = _plane_dot(feats, Kc[:, 0, :], mt_passes)
        u_num = sign * _plane_dot(feats, Kc[:, 1, :], mt_passes)
        v_num = _plane_dot(feats, Kc[:, 2, :], mt_passes)
        t_num = _plane_dot(feats, Kc[:, 3, :], mt_passes)

        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        det2 = det * det
        valid = (
            ok
            & (u_num * det >= 0)
            & (v_num * det >= 0)
            & ((u_num + v_num) * det <= det2)
        )
        t = t_num / jnp.where(ok, det, 1.0)
        if t_clip is not None:
            valid = valid & (t > t_clip)
        t_all = jnp.where(valid, t, _BIG)

        t_blk = jnp.min(t_all, axis=1)
        is_min = t_all == t_blk[:, None]
        orig_blk = jnp.min(
            jnp.where(is_min, orig_row[None, :], jnp.float32(_BIG_I)), axis=1
        ).astype(jnp.int32)
        better = (t_blk < t_cur) | (
            (t_blk < _BIG) & (t_blk == t_cur) & (orig_blk < i_cur)
        )
        return (jnp.where(better, t_blk, t_cur),
                jnp.where(better, orig_blk, i_cur))

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)
    # Outputs are ROW-MAJOR [tr//128, 128] planes: a [tr, 1] column
    # output wastes 127 of 128 lanes and its downstream [R,1] -> [R]
    # squeeze was a measured ~0.1 ms/chunk relayout in XLA.
    rr0, trr = r0 // 128, tr // 128

    def store(t_f, i_f):
        t_ref[0, pl.ds(rr0, trr), :] = t_f.reshape(trr, 128)
        idx_ref[0, pl.ds(rr0, trr), :] = i_f.reshape(trr, 128)

    if not resident:
        # Streaming: double-buffered DMA chain, one cluster per step,
        # slab-pretest-gated MT, (t, idx) carried in registers.
        @pl.when(n_active > 0)
        def _():
            for c in dma(0, 0):
                c.start()

        def _slab_pend(ci, t_cur):
            # Slab pretest vs the running nearest t (shortlists arrive
            # front-to-back from the host): the cluster's entry distance
            # is a lower bound on any t inside it — negative entries
            # included, so the prune is valid under parity's negative-t
            # acceptance too.
            lo = lo_ref[pl.ds(ci, 1), :]  # [1, 3]
            hi = hi_ref[pl.ds(ci, 1), :]
            t0s = (lo - o) * inv_d
            t1s = (hi - o) * inv_d
            tmin = jnp.max(jnp.minimum(t0s, t1s), axis=1)
            tmax = jnp.min(jnp.maximum(t0s, t1s), axis=1)
            enter = tmin <= tmax
            if not allow_negative:
                enter = enter & (tmax > (t_clip or 0.0))
            return enter & (tmin <= t_cur)

        def body(p, carry):
            t_cur, i_cur = carry
            ci = shortlist_ref[i, p]
            slot = jax.lax.rem(p, 2)
            nxt = jax.lax.rem(p + 1, 2)

            @pl.when(p + 1 < n_active)
            def _():
                for c in dma(nxt, p + 1):
                    c.start()

            for c in dma(slot, p):
                c.wait()

            pend = _slab_pend(ci, t_cur)
            slot_ = jax.lax.rem(p, 2)
            t_n, i_n = jax.lax.cond(
                jnp.any(pend),
                lambda _: mt_block(kbuf[slot_], obuf[slot_, 0, :],
                                   t_cur, i_cur),
                lambda _: (t_cur, i_cur), 0)
            return t_n, i_n

        t_f, i_f = jax.lax.fori_loop(0, n_active, body, (t0, i0))
        store(t_f, i_f)
        return

    # --- resident: cluster blocks live wholly in VMEM — read directly by
    # dynamic leading-axis index, zero DMA (megakernel.py
    # RESIDENT_BUDGET_BYTES rationale). No slab pretest / any() gate:
    # post-footprint-sort shortlists are so narrow (dragon bounce tiles:
    # ~1 group) that a group is nearly always entered; the exact MT test
    # subsumes the pretest for correctness. Positions past n_active hold
    # the argsort tail (clusters no ray enters) and the index clamp
    # duplicates the last cluster — both only re-derive identical or
    # impossible hits, harmless.
    def group(p, t_cur, i_cur):
        base = p * group_c
        for g in range(group_c):
            ci = shortlist_ref[i, jnp.minimum(base + g, C_total - 1)]
            t_cur, i_cur = mt_block(kc_ref[ci], org_ref[ci][0], t_cur, i_cur)
        return t_cur, i_cur

    # SPLIT control path: p90 of footprint-sorted bounce tiles carry a
    # single-group shortlist — a straight-line group with no
    # fori_loop/cond/settle machinery serves them; longer shortlists take
    # the early-exit loop below.
    store(t0, i0)

    @pl.when((n_active > 0) & (n_active <= group_c))
    def _():
        store(*group(0, t0, i0))

    @pl.when(n_active > group_c)
    def _():
        # Per-ray settle bound for the early exit: a ray can never hit
        # past its EXIT from the root AABB (every cluster is inside it,
        # so a cluster's per-ray entry <= the root exit). min(t, exit)
        # lets tiles full of MISS rays terminate too. Early exit:
        # shortlists are sorted by tile-min entry, so once the NEXT
        # group's entry exceeds every ray's settle bound, no later
        # cluster can contain a closer hit.
        root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
        root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
        rt0 = (root_lo - o) * inv_d
        rt1 = (root_hi - o) * inv_d
        texit = jnp.min(jnp.maximum(rt0, rt1), axis=1)  # [R]
        n_iters = (n_active + group_c - 1) // group_c

        def body(p, carry):
            t_cur, i_cur, done = carry

            def live(_):
                t_n, i_n = group(p, t_cur, i_cur)
                settle = jnp.max(jnp.minimum(t_n, texit))
                # ent_ref is padded with _BIG past the shortlist; clamp
                # the next group's start into the [0, C] table.
                nxt_pos = jnp.minimum(
                    (p + 1) * group_c, ent_ref.shape[1] - 1)
                return t_n, i_n, jnp.where(
                    ent_ref[i, nxt_pos] > settle, 1, done)

            return jax.lax.cond(done == 0, live,
                                lambda _: (t_cur, i_cur, done), 0)

        t_f, i_f, _ = jax.lax.fori_loop(0, n_iters, body, (t0, i0, 0))
        store(t_f, i_f)


N_SUPER = 16  # footprint-key superclusters (high bits of the sort key)


def _footprint_sort_keys(o, d, mesh, *, allow_negative):
    """uint32 sort key per ray: the ray's SUPERCLUSTER entry mask in the
    high bits, the direction+origin key (shifted) below. The culled
    kernels' cost is live_tiles x tile-UNION shortlist width; direction+
    origin keys alone leave bounce tiles whose union is the whole mesh
    even though each ray enters only a fraction of the clusters. Grouping
    rays by which coarse regions they actually traverse makes the tile
    union approach the per-ray footprint — the quantity the kernel's slab
    pretests can then prune (dragon gillum16: 0.632 -> 0.503 s/frame;
    clean shadows 0.225 -> 0.179; results bitwise identical since per-ray
    intersection is tile-independent).

    Superclusters are N_SUPER contiguous runs of the (Morton-ordered)
    cluster list, so their AABBs are tight; masks use the same bounds
    family as the cull (mirror-extended under parity). Granularity is
    flat from 8 to 32 on dragon; 16 keeps half the key for the spatial
    bits. Rays entering nothing get mask 0 and sort first — their tiles
    carry empty shortlists (a dynamic tile-grid bound was measured on top
    of this and bought only ~0.4%: empty tiles already cost two sentinel
    stores)."""
    lo_c, hi_c = mesh.bounds(mirrored=allow_negative)
    C = lo_c.shape[0]
    n_sc = min(N_SUPER, C)
    g = -(-C // n_sc)
    pad = n_sc * g - C
    # Empty clusters carry the (lo=1, hi=0) never-hit sentinel; padding
    # with it keeps group reductions conservative (a box can only grow).
    lo_p = jnp.concatenate([lo_c, jnp.ones((pad, 3), lo_c.dtype)])
    hi_p = jnp.concatenate([hi_c, jnp.zeros((pad, 3), hi_c.dtype)])
    sc_lo = lo_p.reshape(n_sc, g, 3).min(axis=1)
    sc_hi = hi_p.reshape(n_sc, g, 3).max(axis=1)
    amask, _ = accel.ray_aabb_entry(
        o, d, sc_lo, sc_hi, allow_negative=allow_negative
    )  # [R, n_sc]
    weights = (jnp.uint32(1) << jnp.arange(n_sc, dtype=jnp.uint32))[None, :]
    scmask = jnp.sum(jnp.where(amask, weights, jnp.uint32(0)), axis=1)

    spatial = _spatial_sort_keys(o, d, mesh.aabb_lo.min(0), mesh.aabb_hi.max(0))
    return (scmask << np.uint32(32 - n_sc)) | (spatial >> np.uint32(n_sc))


def _spatial_sort_keys(o, d, lo, hi):
    """uint32 sort key per ray: 7-bit direction bucket (octant + two
    2-bit quantized axis ratios) in the HIGH bits, 24-bit Morton code of
    the origin (quantized to the mesh bounds) below. Sorting rays by this
    key groups directionally-then-spatially similar rays into the same
    kernel tile — the classic wavefront ray-reordering trick as one dense
    argsort. DIRECTION-major matters: a ray's cluster footprint is set
    mostly by where it points (bounce rays from one spot fan out over the
    whole mesh), and coherent tiles are what let the kernels' per-cluster
    slab pretests skip work (measured on dragon gillum16: 5.8 s
    morton-major -> 4.2 s dir-major, before in-kernel pruning)."""
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
    ad = jnp.abs(d) + 1e-30
    dmax = jnp.max(ad, axis=1, keepdims=True)
    u = (ad / dmax * 3.999).astype(jnp.uint32)  # [R, 3] each in 0..3
    dbucket = (octant << np.uint32(4)) | (u[:, 1] << np.uint32(2)) | u[:, 2]
    return (dbucket << np.uint32(24)) | morton


def triangle_nearest_culled(
    o, d, mesh: accel.ClusteredMesh, *, quirks: Quirks, reorder: bool = True,
    live=None, group_c=None, mt_passes=6,
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

    live: optional [R] f32 mask, nonzero where the ray's result is
    consumed (zero-throughput path slots are dead). Dead rays sort to the
    tail, so whole tiles of them get empty shortlists and cost nothing;
    their outputs are arbitrary (miss) and masked off by the caller.
    """
    R = o.shape[0]
    feats = _ray_features10(o, d)
    if reorder:
        # 1-D gathers/scatters are slow on TPU (sublane-serial); keep the
        # permutation traffic to ONE [R,9] row gather in (the features,
        # which carry o and d in columns 6:9 / 0:3 — the slab test below
        # reconstructs them) and ONE [R,3] row scatter out (the packed
        # results). Measured on dragon gillum16: the previous per-array
        # form spent ~0.5 s/frame in these permutes alone.
        keys = _footprint_sort_keys(
            o, d, mesh, allow_negative=quirks.reference_triangle_test
        )
        if live is not None:
            # dead rays sort to a tail of empty tiles (an all-ones key
            # also means "enters every supercluster", but such rays carry
            # full shortlists anyway, so the collision is harmless)
            keys = jnp.where(live > 0, keys, jnp.uint32(0xFFFFFFFF))
        keys_s, order_r = jax.lax.sort_key_val(
            keys, jnp.arange(R, dtype=jnp.int32)
        )
        live_s = None
        if live is not None:
            live_s = (keys_s != jnp.uint32(0xFFFFFFFF)).astype(jnp.float32)
        t, idx, hit = _culled_from_feats(
            feats[order_r], mesh, quirks=quirks, live=live_s, group_c=group_c,
            mt_passes=mt_passes,
        )
        # Unsort by sorting on the forward permutation — measured cheaper
        # than a row scatter on TPU (sort-with-payloads ~1.1 ms vs scatter
        # ~1.8 ms at 131k rays), and int payloads ride natively. `hit` is
        # re-derived from the unsorted t (misses are inf) instead of
        # riding as a fourth payload.
        del hit
        _, t_o, idx_o = jax.lax.sort(
            (order_r, t, idx), dimension=0, num_keys=1
        )
        return t_o, idx_o, jnp.isfinite(t_o)
    return _culled_from_feats(feats, mesh, quirks=quirks, live=live,
                              group_c=group_c, mt_passes=mt_passes)


def _culled_from_feats(feats, mesh: accel.ClusteredMesh, *, quirks: Quirks, live=None,
                       group_c=None, mt_passes=6):
    """Kernel dispatch on precomputed ray features [R, 10] (columns: d,
    o x d, o, 1 — _ray_features10 layout, which the MT matmul, the kof
    fold, and the slab pretest consume)."""
    R = feats.shape[0]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    sign = 1.0 if quirks.reference_triangle_test else -1.0
    t_clip = None if quirks.reference_triangle_test else CLEAN_T_EPS
    C = mesh.n_clusters
    cs = mesh.v0.shape[0] // C  # cluster size baked into the mesh build
    from skele_raytracer_tpu.ops.pallas.megakernel import (
        RESIDENT_BUDGET_BYTES,
        mesh_resident_bytes,
    )

    resident = mesh_resident_bytes(C, cs) <= RESIDENT_BUDGET_BYTES
    sub_t = SUB_T if resident else 1
    rp = -(-R // (TILE_R * sub_t)) * TILE_R * sub_t
    n_tiles = rp // TILE_R

    # --- host-side (jnp) cull: per-tile cluster shortlist, ordered
    # front-to-back by tile-min entry so the kernel's running-t pretest
    # can prune the tail ------------------------------------------------
    # parity culls against the mirror-extended boxes: the reference's
    # buggy (mirrored-u) test accepts hits outside the true triangle
    # bounds (accel.ClusteredMesh docstring)
    cull_lo, cull_hi = mesh.bounds(mirrored=quirks.reference_triangle_test)
    amask, entry = accel.ray_aabb_entry(
        o, d, cull_lo, cull_hi,
        allow_negative=quirks.reference_triangle_test,
    )  # [R, C] both
    if live is not None:
        amask = amask & (live > 0)[:, None]
    entry = jnp.where(amask, entry, _BIG)
    entry = _pad_rows(entry, rp, fill=_BIG).reshape(n_tiles, TILE_R, C)
    tile_entry = jnp.min(entry, axis=1)  # [n_tiles, C]
    order = jnp.argsort(tile_entry, axis=1).astype(jnp.int32)
    counts = jnp.sum(tile_entry < _BIG, axis=1).astype(jnp.int32)
    # Sorted entry distances (+ trailing _BIG) feed the kernel's early
    # exit: once the next entry exceeds every ray's best t, stop.
    ent_sorted = jnp.concatenate(
        [jnp.sort(tile_entry, axis=1),
         jnp.full((n_tiles, 1), _BIG, jnp.float32)],
        axis=1,
    )  # [n_tiles, C+1]

    # --- per-cluster constant blocks (kof + mask folded in) --------------
    k10, org = pack_cluster_blocks(mesh)
    feats = _pad_rows(feats, rp, fill=1.0)

    mesh_space = pltpu.VMEM if resident else pl.ANY

    def launch(order_b, counts_b, ent_b, feats_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(order_b.shape[0] // sub_t,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ent [tiles, C+1]
                pl.BlockSpec((TILE_R * sub_t, 10), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # lo
                pl.BlockSpec(memory_space=pltpu.VMEM),  # hi
                pl.BlockSpec(memory_space=mesh_space),
                pl.BlockSpec(memory_space=mesh_space),
            ],
            out_specs=(
                # [tiles, rows, 128]: Pallas requires the minor-two block
                # dims be (8k, 128) or match the array — (rows, 128) does
                pl.BlockSpec((1, TILE_R * sub_t // 128, 128),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_R * sub_t // 128, 128),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 10, 4, cs), jnp.float32),
                pltpu.VMEM((2, 1, cs), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        t_b, i_b = pl.pallas_call(
            functools.partial(
                _culled_kernel, sign=sign, t_clip=t_clip, cs=cs,
                resident=resident,
                allow_negative=quirks.reference_triangle_test,
                sub_t=sub_t,
                group_c=GROUP_C if group_c is None else group_c,
                mt_passes=mt_passes,
            ),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (feats_b.shape[0] // (TILE_R * sub_t),
                     TILE_R * sub_t // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct(
                    (feats_b.shape[0] // (TILE_R * sub_t),
                     TILE_R * sub_t // 128, 128), jnp.int32),
            ),
            interpret=_interpret(),
        )(order_b, counts_b, ent_b, feats_b, cull_lo, cull_hi, k10, org)
        # row-major planes -> flat ray vectors (free bitcast)
        return t_b.reshape(-1), i_b.reshape(-1)

    t, idx = _batched_launch(launch, order, counts, ent_sorted, feats)
    t, idx = t[:R], idx[:R]
    hit = t < _BIG
    # idx already holds the ORIGINAL triangle index (tie-broken to the
    # minimum, matching the reference scan order); clamp the no-hit
    # sentinel for safe downstream gathers.
    n_orig = mesh.perm.shape[0]
    orig = jnp.minimum(idx, n_orig - 1)
    return jnp.where(hit, t, jnp.inf), orig, hit


# ---------------------------------------------------------------------------
# Any-hit occlusion kernel (shadow rays)
# ---------------------------------------------------------------------------


def _occluded_kernel(
    # scalar prefetch
    shortlist_ref,  # [n_tiles, C] int32
    count_ref,  # [n_tiles] int32
    # SMEM input
    ent_ref,  # [n_tiles, C+1] sorted entry distances (early-exit bound)
    # VMEM inputs
    fb_ref,  # [TILE_R, 11] ray features + 1.0 fold feature (col 9)
    #          + per-ray max t (col 10, _BIG = none)
    lo_ref,  # [C, 3]
    hi_ref,  # [C, 3]
    # HBM (or VMEM when resident)
    kc_ref,  # [C, 10, 4, cs] folded blocks (pack_cluster_blocks) — the
    #          any-hit test needs NO aux at all: kof and mask are folded
    #          and no winner index is reported
    # output
    occ_ref,  # [TILE_R, 1] f32 1.0 = occluded
    # scratch
    kbuf,  # [2, 10, 4, cs]
    sems,  # DMA sems [2]
    *,
    sign,
    t_clip,
    cs,
    resident,
    sub_t=1,
    group_c=GROUP_C,
    mt_passes=6,
):
    """ANY-hit variant of _culled_kernel for shadow queries (the
    reference's shadow() is a boolean scan, src/utils.h:42-76): no
    nearest-t bookkeeping, and the loop path stops at the first
    iteration that leaves every ray occluded — shadow rays terminate at
    the FIRST blocker instead of paying for the closest one."""
    C_total = lo_ref.shape[0]
    tr = fb_ref.shape[0] // sub_t
    for s in range(sub_t):
        _occ_tile(
            pl.program_id(0) * sub_t + s if sub_t > 1 else pl.program_id(0),
            s * tr,
            tr,
            shortlist_ref, count_ref, ent_ref, fb_ref, lo_ref, hi_ref,
            kc_ref, occ_ref, kbuf, sems,
            sign=sign, t_clip=t_clip, cs=cs, resident=resident,
            C_total=C_total, group_c=group_c, mt_passes=mt_passes,
        )


def _occ_tile(
    i, r0, tr,
    shortlist_ref, count_ref, ent_ref, fb_ref, lo_ref, hi_ref,
    kc_ref, occ_ref, kbuf, sems,
    *,
    sign, t_clip, cs, resident, C_total, group_c=GROUP_C, mt_passes=6,
):
    n_active = count_ref[i]
    fb = fb_ref[pl.ds(r0, tr), :]
    feats = fb[:, 0:10]  # incl. the 1.0 kof-fold column
    bnd = fb[:, 10]
    d = feats[:, 0:3]
    o = feats[:, 6:9]

    def dma(slot, pos):
        ci = shortlist_ref[i, pos]
        return (
            pltpu.make_async_copy(kc_ref.at[ci], kbuf.at[slot],
                                  sems.at[slot]),
        )

    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)

    def occ_block(Kc, occ_cur):
        """Per-plane any-hit MT test of one cluster block Kc [10, 4, cs]
        (see _culled_tile.mt_block for the per-plane rationale).
        Rational-space throughout — the t-window test too: t > t_clip
        <=> t_num*det > t_clip*det^2 and t < bnd <=> t_num*det <
        bnd*det^2 — the any-hit kernel never needs t itself, so there is
        no division at all."""
        det = _plane_dot(feats, Kc[:, 0, :], mt_passes)
        u_num = sign * _plane_dot(feats, Kc[:, 1, :], mt_passes)
        v_num = _plane_dot(feats, Kc[:, 2, :], mt_passes)
        t_num = _plane_dot(feats, Kc[:, 3, :], mt_passes)

        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        det2 = det * det
        td = t_num * det
        valid = (
            ok
            & (u_num * det >= 0)
            & (v_num * det >= 0)
            & ((u_num + v_num) * det <= det2)
            & (td > t_clip * det2) & (td < bnd[:, None] * det2)
        )
        return jnp.maximum(occ_cur, jnp.any(valid, axis=1)
                           .astype(jnp.float32))

    occ0 = jnp.zeros((tr,), jnp.float32)
    # row-major [tr//128, 128] output (see _culled_tile.store)
    rr0, trr = r0 // 128, tr // 128

    def store(occ_f):
        occ_ref[0, pl.ds(rr0, trr), :] = occ_f.reshape(trr, 128)

    if not resident:
        # Streaming: double-buffered DMA chain, slab-pretest-gated,
        # occlusion carried in registers.
        @pl.when(n_active > 0)
        def _():
            for c in dma(0, 0):
                c.start()

        def _slab_pend(ci, occ_cur):
            lo = lo_ref[pl.ds(ci, 1), :]
            hi = hi_ref[pl.ds(ci, 1), :]
            t0s = (lo - o) * inv_d
            t1s = (hi - o) * inv_d
            tmin = jnp.max(jnp.minimum(t0s, t1s), axis=1)
            tmax = jnp.min(jnp.maximum(t0s, t1s), axis=1)
            enter = (tmin <= tmax) & (tmax > t_clip) & (tmin < bnd)
            return enter & (occ_cur < 0.5)

        def body(p, occ_cur):
            slot = jax.lax.rem(p, 2)
            nxt = jax.lax.rem(p + 1, 2)

            @pl.when(p + 1 < n_active)
            def _():
                for c in dma(nxt, p + 1):
                    c.start()

            for c in dma(slot, p):
                c.wait()

            pend = _slab_pend(shortlist_ref[i, p], occ_cur)
            slot_ = jax.lax.rem(p, 2)
            return jax.lax.cond(
                jnp.any(pend),
                lambda _: occ_block(kbuf[slot_], occ_cur),
                lambda _: occ_cur, 0)

        store(jax.lax.fori_loop(0, n_active, body, occ0))
        return

    # --- resident (see _culled_tile for the split-path rationale) --------
    def group(p, occ_cur):
        base = p * group_c
        for g in range(group_c):
            ci = shortlist_ref[i, jnp.minimum(base + g, C_total - 1)]
            occ_cur = occ_block(kc_ref[ci], occ_cur)
        return occ_cur

    store(occ0)

    @pl.when((n_active > 0) & (n_active <= group_c))
    def _():
        store(group(0, occ0))

    @pl.when(n_active > group_c)
    def _():
        # per-ray settle bound: no blocker can sit past the root-AABB
        # exit (see _culled_tile) or past the light distance
        root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
        root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
        rt0 = (root_lo - o) * inv_d
        rt1 = (root_hi - o) * inv_d
        texit = jnp.minimum(
            jnp.min(jnp.maximum(rt0, rt1), axis=1), bnd
        )  # [R]
        n_iters = (n_active + group_c - 1) // group_c

        def body(p, carry):
            occ_cur, done = carry

            def live(_):
                occ_n = group(p, occ_cur)
                # all occluded, or no later cluster can sit inside any
                # ray's remaining (t_clip, bnd) window
                all_occ = jnp.min(occ_n) > 0.5
                nxt_pos = jnp.minimum(
                    (p + 1) * group_c, ent_ref.shape[1] - 1)
                no_more = ent_ref[i, nxt_pos] > jnp.max(
                    jnp.where(occ_n > 0.5, 0.0, texit))
                return occ_n, jnp.where(all_occ | no_more, 1, done)

            return jax.lax.cond(done == 0, live,
                                lambda _: (occ_cur, done), 0)

        occ_f, _ = jax.lax.fori_loop(0, n_iters, body, (occ0, 0))
        store(occ_f)


def triangle_occluded(
    o, d, mesh: accel.ClusteredMesh, *, quirks: Quirks, t_max=None,
    live=None, reorder: bool = True, group_c=None, mt_passes=6,
):
    """[R] bool — is ANY triangle strictly between t_clip and t_max along
    each ray?  The shadow-query form of the culled kernel (clean-mode
    triangle occlusion — parity never takes this path because the
    reference's shadow() scans spheres only, src/utils.h:49-55).

    t_max: optional [R] upper bound (point-light distance); None =
    unbounded (directional lights). live: see triangle_nearest_culled.
    """
    R = o.shape[0]
    bnd = (
        jnp.full((R,), _BIG, jnp.float32)
        if t_max is None
        else t_max.astype(jnp.float32)
    )
    # [R, 11]: features + constant 1.0 (kof-fold feature), per-ray bound
    fb = jnp.concatenate(
        [d, jnp.cross(o, d), o, jnp.ones((R, 1), jnp.float32),
         bnd[:, None]], axis=1)
    if reorder:
        keys = _footprint_sort_keys(
            o, d, mesh, allow_negative=quirks.reference_triangle_test
        )
        if live is not None:
            keys = jnp.where(live > 0, keys, jnp.uint32(0xFFFFFFFF))
        keys_s, order_r = jax.lax.sort_key_val(
            keys, jnp.arange(R, dtype=jnp.int32)
        )
        live_s = None
        if live is not None:
            live_s = (keys_s != jnp.uint32(0xFFFFFFFF)).astype(jnp.float32)
        occ = _occluded_from_fb(
            fb[order_r], mesh, quirks=quirks, live=live_s, group_c=group_c,
            mt_passes=mt_passes,
        )
        _, occ_o = jax.lax.sort(
            (order_r, occ.astype(jnp.int32)), dimension=0, num_keys=1
        )
        return occ_o > 0
    return _occluded_from_fb(fb, mesh, quirks=quirks, live=live,
                             group_c=group_c, mt_passes=mt_passes)


def _occluded_from_fb(fb, mesh: accel.ClusteredMesh, *, quirks: Quirks, live=None,
                      group_c=None, mt_passes=6):
    R = fb.shape[0]
    d = fb[:, 0:3]
    o = fb[:, 6:9]
    bnd = fb[:, 10]
    sign = 1.0 if quirks.reference_triangle_test else -1.0
    t_clip = 1.0 if quirks.near_clip_t_le_1 else CLEAN_T_EPS
    C = mesh.n_clusters
    cs = mesh.v0.shape[0] // C

    from skele_raytracer_tpu.ops.pallas.megakernel import (
        RESIDENT_BUDGET_BYTES,
        mesh_resident_bytes,
    )

    resident = mesh_resident_bytes(C, cs) <= RESIDENT_BUDGET_BYTES
    sub_t = SUB_T if resident else 1
    rp = -(-R // (TILE_R * sub_t)) * TILE_R * sub_t
    n_tiles = rp // TILE_R

    cull_lo, cull_hi = mesh.bounds(mirrored=quirks.reference_triangle_test)
    amask, entry = accel.ray_aabb_entry(
        o, d, cull_lo, cull_hi,
        allow_negative=quirks.reference_triangle_test,
    )
    amask = amask & (entry < bnd[:, None])
    if live is not None:
        amask = amask & (live > 0)[:, None]
    entry = jnp.where(amask, entry, _BIG)
    entry = _pad_rows(entry, rp, fill=_BIG).reshape(n_tiles, TILE_R, C)
    tile_entry = jnp.min(entry, axis=1)
    order = jnp.argsort(tile_entry, axis=1).astype(jnp.int32)
    counts = jnp.sum(tile_entry < _BIG, axis=1).astype(jnp.int32)
    ent_sorted = jnp.concatenate(
        [jnp.sort(tile_entry, axis=1),
         jnp.full((n_tiles, 1), _BIG, jnp.float32)],
        axis=1,
    )

    k10, _ = pack_cluster_blocks(mesh)  # any-hit needs no orig indices
    fb_p = _pad_rows(fb, rp, fill=1.0)

    mesh_space = pltpu.VMEM if resident else pl.ANY

    def launch(order_b, counts_b, ent_b, fb_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(order_b.shape[0] // sub_t,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ent [tiles, C+1]
                pl.BlockSpec((TILE_R * sub_t, 11), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # lo
                pl.BlockSpec(memory_space=pltpu.VMEM),  # hi
                pl.BlockSpec(memory_space=mesh_space),
            ],
            out_specs=pl.BlockSpec(
                (1, TILE_R * sub_t // 128, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 10, 4, cs), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        occ_b = pl.pallas_call(
            functools.partial(
                _occluded_kernel, sign=sign, t_clip=t_clip, cs=cs,
                resident=resident, sub_t=sub_t,
                group_c=GROUP_C if group_c is None else group_c,
                mt_passes=mt_passes,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (fb_b.shape[0] // (TILE_R * sub_t),
                 TILE_R * sub_t // 128, 128), jnp.float32),
            interpret=_interpret(),
        )(order_b, counts_b, ent_b, fb_b, cull_lo, cull_hi, k10)
        return occ_b.reshape(-1)

    occ = _batched_launch(launch, order, counts, ent_sorted, fb_p)
    return occ[:R] > 0.5
