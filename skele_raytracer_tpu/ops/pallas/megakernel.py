"""Fused intersect + shadow + Blinn-Phong Pallas megakernel (clean mode).

The TPU-native analog of the reference's whole device `shade` kernel
(cudasrc/raytrace.h:80-156: nearest-hit scan + direct illumination with
shadow rays, one CUDA thread per pixel): ONE pallas_call per ray tile
computes, entirely in VMEM,

  1. nearest triangle via the Morton-cluster shortlist (double-buffered
     DMA streaming, as ops/pallas/culled.py) — while also extracting the
     winner's unit normal and material from planes streamed alongside;
  2. nearest sphere (matmul quadratic, ops/pallas/intersect.py form);
  3. per-light shadow occlusion from the hit points — the part no
     host-side shortlist can serve (shadow origins are only known after
     the hit): an IN-KERNEL slab test against every cluster AABB gates a
     conditional DMA, so clusters no shadow ray enters cost nothing;
  4. the clean Blinn-Phong direct illumination (ambient + per-light
     diffuse/specular with 1/d^2 falloff, camera-position view vector,
     directional lights — ops/shading.py semantics with quirks off).

Between-stage HBM round trips (hit records, shadow masks, gathered
materials) disappear; per bounce the frame touches HBM once for rays in
and once for (radiance, hit structure) out.

Differentiation: `fused_shade` is a jax.custom_vjp. The forward runs the
kernel and saves the DISCRETE hit structure (kind, index, per-light
unshadowed bits); the backward replays the shading in differentiable jnp
FROM that saved structure (shade_replay: per-ray t re-derivation, O(R)
material gathers, Blinn-Phong) — the backward pass reuses the forward's
intersection structure instead of re-intersecting, exactly the
north-star contract. Limits: clean quirks only, no fog (gated by the
caller, models/integrator.py).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skele_raytracer_tpu.config import CLEAN_T_EPS, TRIANGLE_DET_EPS
from skele_raytracer_tpu.ops import accel
from skele_raytracer_tpu.ops.pallas.intersect import (
    _BIG,
    _BIG_I,
    _interpret,
    _pad_rows,
    pack_triangles,
    ray_features,
)

TILE_R = 256  # rays per tile (see culled.py TILE_R rationale)

_HI = jax.lax.Precision.HIGHEST

# VMEM-resident mesh budget: when the padded cluster blocks (kc + aux +
# shade planes) fit under this, they are passed as whole-array VMEM
# operands and the kernel reads them directly — no DMA streaming at all.
# The serialized conditional shadow DMAs are the latency bottleneck for
# incoherent (bounce) rays; dragon's ~79 clusters pad to ~4.9 MB, well
# inside the ~16 MB/core VMEM (leaving room for ray tiles + matmul
# intermediates). Larger meshes fall back to double-buffered streaming.
RESIDENT_BUDGET_BYTES = 8 * 1024 * 1024


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def mesh_resident_bytes(n_clusters: int, cs: int) -> int:
    """Padded VMEM bytes of (kc [C,9,4,cs], aux [C,3,cs], shd [C,14,cs])
    under the (8, 128) f32 register tiling on the two minor dims."""
    csp = _pad_to(cs, 128)
    kc = n_clusters * 9 * _pad_to(4, 8) * csp * 4
    aux = n_clusters * _pad_to(3, 8) * csp * 4
    shd = n_clusters * _pad_to(_N_SHADE, 8) * csp * 4
    return kc + aux + shd


def _dot_tn(a, b):
    """[R, k] x [N, k] -> [R, N] contraction on the MXU."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _mt_prods(d, w, o, K):
    """Möller-Trumbore products [R, 4, cs] from ray features (d, w = o x d,
    o) against a packed K [9, 4*cs] block — as three [R,3] @ [3,4cs]
    matmuls (no in-kernel feature concatenation needed)."""
    cs4 = K.shape[1]
    p = jax.lax.dot_general(
        d, K[0:3, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )
    p += jax.lax.dot_general(
        w, K[3:6, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )
    p += jax.lax.dot_general(
        o, K[6:9, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )
    return p.reshape(-1, 4, cs4 // 4)


def _cross_cols(a, b):
    """cross(a, b) for [R, 3] via lane slices (concat on the lane axis)."""
    ax, ay, az = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    bx, by, bz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _mt_tuv(prods, kof, msk, *, clean_u_sign=-1.0):
    """(t_all, valid) [R, cs] from MT products (clean semantics: standard
    MT with t > CLEAN_T_EPS; the sign flips the reference's mirrored u)."""
    det = prods[:, 0, :]
    u_num = clean_u_sign * prods[:, 1, :]
    v_num = prods[:, 2, :]
    t_num = prods[:, 3, :] - kof[None, :]
    ok = jnp.abs(det) >= TRIANGLE_DET_EPS
    inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = (
        ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (msk[None, :] > 0) & (t > CLEAN_T_EPS)
    )
    return jnp.where(valid, t, _BIG), valid


def _sphere_t_all(o, d, cen, c_const, s_mask, *, t_clip):
    """[R, S] sphere-quadratic t (nearest root), matmul form."""
    a = jnp.sum(d * d, axis=1, keepdims=True)
    d_dot_c = _dot_tn(d, cen)
    o_dot_c = _dot_tn(o, cen)
    d_dot_o = jnp.sum(d * o, axis=1, keepdims=True)
    o_dot_o = jnp.sum(o * o, axis=1, keepdims=True)
    b = 2.0 * (d_dot_o - d_dot_c)
    c = o_dot_o - 2.0 * o_dot_c + c_const[None, :]
    disc = b * b - 4.0 * a * c
    pos = disc > 0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
    t2 = (-b - sq) / (2.0 * a)
    valid = (disc >= 0) & (t2 >= 0) & (t2 > t_clip) & (s_mask[None, :] > 0)
    return jnp.where(valid, t2, _BIG)


def _normalize_rows(v):
    n2 = jnp.sum(v * v, axis=1, keepdims=True)
    pos = n2 > 0
    inv = jax.lax.rsqrt(jnp.where(pos, n2, 1.0)) * pos
    return v * inv


# Shade-plane layout per triangle (streamed [14, cs] per cluster):
# rows 0:3 unit geometric normal, 3:6 ambient, 6:9 diffuse, 9:12 specular,
# 12 power, 13 ior.
_N_SHADE = 14


def _megakernel(
    # scalar prefetch
    shortlist_ref,  # [n_tiles, C] int32 — primary-intersect cluster order
    count_ref,  # [n_tiles] int32
    live_ref,  # [n_tiles] int32 — rays with nonzero path throughput
    # VMEM inputs
    f_ref,  # [TILE_R, 9] primary ray features [d, o x d, o]
    cen_ref,  # [S, 3] sphere centers
    saux_ref,  # [2, S] (|c|^2 - r^2, mask)
    smat_ref,  # [11, S] sphere material planes (amb3 dif3 spec3 pow ior)
    plp_ref,  # [Lp, 3] point-light positions
    plc_ref,  # [Lp, 4] point-light colour + mask
    dld_ref,  # [Ld, 3] directional-light UNIT directions
    dlc_ref,  # [Ld, 4] directional colour + mask
    const_ref,  # [2, 3] (camera position, scene ambient)
    lo_ref,  # [C, 3] cluster AABB lo
    hi_ref,  # [C, 3] cluster AABB hi
    # HBM (manual DMA)
    kc_ref,  # [C, 9, 4, cs]
    aux_ref,  # [C, 3, cs] (k offsets, mask, original index)
    shd_ref,  # [C, 14, cs] shade planes
    # outputs
    out_ref,  # [TILE_R, 4]  direct rgb + t
    meta_ref,  # [TILE_R, 2] int32 (kind, original index)
    unsh_ref,  # [TILE_R, L_out] 1.0 = not shadowed (per light)
    # scratch
    kbuf,  # [2, 9, 4, cs]
    abuf,  # [2, 3, cs]
    sbuf,  # [2, 14, cs]
    shade_sc,  # [TILE_R, 14] winner normal+material
    tb_sc,  # [TILE_R, 1] f32 running nearest t
    ob_sc,  # [TILE_R, 1] i32 running winner original index
    occ_sc,  # [TILE_R, 1] f32 running shadow occlusion
    sems,  # DMA sems [2, 3]
    *,
    cs,
    n_clusters,
    use_shadows,
    resident,
):
    # All loop-carried per-ray state lives in VMEM scratch refs, mutated
    # in place (the _culled_kernel pattern): Mosaic cannot legalize
    # vector loop carries through scf.for/scf.if on this backend.
    # `resident` (static): cluster blocks are whole-array VMEM operands,
    # read directly by dynamic leading-axis index — zero DMA.
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[:]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    R = feats.shape[0]

    # Dead tiles (every ray's path throughput already zero — the
    # integrator's live mask) cost only these default writes: no
    # cluster loop, no sphere scan, no shadow slab sweep.
    out_ref[:, 0:3] = jnp.zeros((R, 3), jnp.float32)
    out_ref[:, 3] = jnp.full((R,), _BIG, jnp.float32)
    meta_ref[:] = jnp.zeros(meta_ref.shape, jnp.int32)
    unsh_ref[:] = jnp.ones(unsh_ref.shape, jnp.float32)

    @pl.when(live_ref[i] > 0)
    def _run():

        # ---------------- primary triangle intersect (shortlisted) ----------
        tb_sc[:, 0] = jnp.full((R,), _BIG, jnp.float32)
        ob_sc[:, 0] = jnp.full((R,), _BIG_I, jnp.int32)
        shade_sc[:] = jnp.zeros((R, _N_SHADE), jnp.float32)

        def dma(slot, pos):
            ci = shortlist_ref[i, pos]
            return (
                pltpu.make_async_copy(kc_ref.at[ci], kbuf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(aux_ref.at[ci], abuf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(shd_ref.at[ci], sbuf.at[slot], sems.at[slot, 2]),
            )

        if not resident:

            @pl.when(n_active > 0)
            def _():
                for c in dma(0, 0):
                    c.start()

        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
        w_prim = _cross_cols(o, d)

        def body(p, _):
            ci = shortlist_ref[i, p]
            if not resident:
                slot = jax.lax.rem(p, 2)
                nxt = jax.lax.rem(p + 1, 2)

                @pl.when(p + 1 < n_active)
                def _():
                    for c in dma(nxt, p + 1):
                        c.start()

                for c in dma(slot, p):
                    c.wait()

            # In-kernel slab pretest vs the running nearest t. The host sorts
            # each tile's shortlist FRONT-TO-BACK (by tile-min entry), so once
            # every ray's best t undercuts a cluster's entry distance, the
            # remaining iterations reduce to this [R, 3] test — ordered-BVH
            # early termination, amortized over the tile.
            lo = lo_ref[pl.ds(ci, 1), :]  # [1, 3]
            hi = hi_ref[pl.ds(ci, 1), :]
            t0 = (lo - o) * inv_d
            t1 = (hi - o) * inv_d
            tmin = jnp.max(jnp.minimum(t0, t1), axis=1)
            tmax = jnp.min(jnp.maximum(t0, t1), axis=1)
            enter = (tmin <= tmax) & (tmax > CLEAN_T_EPS)
            pend = enter & (tmin <= tb_sc[:, 0])

            @pl.when(jnp.any(pend))
            def _():
                if resident:
                    K = kc_ref[ci].reshape(9, 4 * cs)
                    kof_blk = aux_ref[ci, 0, :]
                    msk_blk = aux_ref[ci, 1, :]
                    planes = shd_ref[ci]  # [14, cs]
                    orig_row = aux_ref[ci, 2, :]
                else:
                    slot_ = jax.lax.rem(p, 2)
                    K = kbuf[slot_].reshape(9, 4 * cs)
                    kof_blk = abuf[slot_, 0, :]
                    msk_blk = abuf[slot_, 1, :]
                    orig_row = abuf[slot_, 2, :]
                    planes = sbuf[slot_]

                prods = _mt_prods(d, w_prim, o, K)
                t_all, _ = _mt_tuv(prods, kof_blk, msk_blk)

                t_blk = jnp.min(t_all, axis=1)
                is_min = t_all == t_blk[:, None]
                orig_f = orig_row[None, :]
                orig_blk_f = jnp.min(
                    jnp.where(is_min, orig_f, jnp.float32(_BIG_I)), axis=1
                )
                orig_blk = orig_blk_f.astype(jnp.int32)
                onehot = (is_min & (orig_f == orig_blk_f[:, None])).astype(jnp.float32)
                # winner's normal+material from the cluster planes: [R,cs]@[cs,14]
                shade_blk = jax.lax.dot_general(
                    onehot, planes, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )  # [R, 14]

                # Real-hit-gated tie-break (see culled._mt_update): an
                # all-miss block must not stamp its min orig index (and
                # shade planes) onto miss rays via the _BIG == _BIG tie.
                better = (t_blk < tb_sc[:, 0]) | (
                    (t_blk < _BIG)
                    & (t_blk == tb_sc[:, 0]) & (orig_blk < ob_sc[:, 0])
                )
                shade_sc[:] = jnp.where(better[:, None], shade_blk, shade_sc[:])
                tb_sc[:, 0] = jnp.where(better, t_blk, tb_sc[:, 0])
                ob_sc[:, 0] = jnp.where(better, orig_blk, ob_sc[:, 0])

            return 0

        jax.lax.fori_loop(0, n_active, body, 0)
        t_best = tb_sc[:, 0]
        orig_best = ob_sc[:, 0]
        tri_hit = t_best < _BIG

        # ---------------- spheres -------------------------------------------
        cen = cen_ref[:]
        c_const = saux_ref[0, :]
        s_mask = saux_ref[1, :]
        S = cen.shape[0]
        ts_all = _sphere_t_all(o, d, cen, c_const, s_mask, t_clip=CLEAN_T_EPS)
        t_sph = jnp.min(ts_all, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, ts_all.shape, 1)
        idx_sph = jnp.minimum(
            jnp.min(jnp.where(ts_all == t_sph[:, None], cols, _BIG_I), axis=1),
            S - 1,
        )
        sph_hit = t_sph < _BIG

        tri_wins = tri_hit & (t_best < t_sph)
        kind = jnp.where(tri_wins, 2, jnp.where(sph_hit, 1, 0)).astype(jnp.int32)
        index = jnp.where(tri_wins, orig_best, idx_sph)
        t = jnp.where(tri_wins, t_best, t_sph)
        t_safe = jnp.where(t < _BIG, t, 0.0)
        x = o + d * t_safe[:, None]

        onehot_s = (
            jax.lax.broadcasted_iota(jnp.int32, (R, S), 1) == idx_sph[:, None]
        ).astype(jnp.float32)
        c_sel = jax.lax.dot_general(
            onehot_s, cen, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        n_sph = _normalize_rows(x - c_sel)
        # sphere material [R, 11] from planes
        m_sph = jax.lax.dot_general(
            onehot_s, smat_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

        n_tri = shade_sc[:, 0:3]
        flip = jnp.sum(n_tri * d, axis=1, keepdims=True) > 0
        n_tri = jnp.where(flip, -n_tri, n_tri)
        normal = jnp.where(tri_wins[:, None], n_tri, n_sph)
        mat = jnp.where(tri_wins[:, None], shade_sc[:, 3:14], m_sph)  # [R, 11]
        m_amb, m_dif, m_spec = mat[:, 0:3], mat[:, 3:6], mat[:, 6:9]
        m_pow = mat[:, 9:10]

        shades = (tri_wins | sph_hit)[:, None].astype(jnp.float32)

        cam_pos = const_ref[0, :][None, :]
        ambient = const_ref[1, :][None, :]
        view = _normalize_rows(cam_pos - x)
        direct = ambient * m_amb

        # shadow origin (clean): x + eps * (1 + |x|) * normal
        x_norm2 = jnp.sum(x * x, axis=1, keepdims=True)
        pos = x_norm2 > 0
        x_len = jnp.sqrt(jnp.where(pos, x_norm2, 1.0)) * pos
        sh_origin = x + CLEAN_T_EPS * (1.0 + x_len) * normal
        alive = (tri_wins | sph_hit)

        def shadow_occluded(ldir, bound, lmask_scalar):
            """[R] float 1.0 = occluded, toward unit direction ldir [R, 3];
            bound [R, 1] max t (point lights) or None (directional).
            Occlusion state lives in occ_sc (f32 0/1) and is updated in
            place under pl.when — no vector loop carries (Mosaic cannot
            legalize them), and clusters no live shadow ray enters cost
            neither DMA nor FLOPs."""
            tso = _sphere_t_all(
                sh_origin, ldir, cen, c_const, s_mask, t_clip=CLEAN_T_EPS
            )
            if bound is not None:
                occ0 = jnp.any(tso < bound, axis=1)
            else:
                occ0 = jnp.any(tso < _BIG, axis=1)
            occ_sc[:, 0] = occ0.astype(jnp.float32)

            w_sh = _cross_cols(sh_origin, ldir)
            inv_d = jnp.where(jnp.abs(ldir) > 1e-30, ldir, 1e-30)
            inv_d = 1.0 / inv_d

            def sbody(c, _):
                lo = lo_ref[pl.ds(c, 1), :]  # [1, 3]
                hi = hi_ref[pl.ds(c, 1), :]
                t0 = (lo - sh_origin) * inv_d
                t1 = (hi - sh_origin) * inv_d
                tmin = jnp.max(jnp.minimum(t0, t1), axis=1)
                tmax = jnp.min(jnp.maximum(t0, t1), axis=1)
                enter = (tmin <= tmax) & (tmax > CLEAN_T_EPS)
                if bound is not None:
                    enter = enter & (tmin < bound[:, 0])
                pend = enter & (occ_sc[:, 0] < 0.5) & alive
                need = jnp.any(pend) & (lmask_scalar > 0)

                @pl.when(need)
                def _():
                    if resident:
                        K = kc_ref[c].reshape(9, 4 * cs)
                        kof_blk = aux_ref[c, 0, :]
                        msk_blk = aux_ref[c, 1, :]
                    else:
                        k_dma = pltpu.make_async_copy(
                            kc_ref.at[c], kbuf.at[0], sems.at[0, 0]
                        )
                        a_dma = pltpu.make_async_copy(
                            aux_ref.at[c], abuf.at[0], sems.at[0, 1]
                        )
                        k_dma.start()
                        a_dma.start()
                        k_dma.wait()
                        a_dma.wait()
                        K = kbuf[0].reshape(9, 4 * cs)
                        kof_blk = abuf[0, 0, :]
                        msk_blk = abuf[0, 1, :]
                    prods = _mt_prods(ldir, w_sh, sh_origin, K)
                    t_all, valid = _mt_tuv(prods, kof_blk, msk_blk)
                    if bound is not None:
                        valid = valid & (t_all < bound)
                    occ_sc[:, 0] = jnp.maximum(
                        occ_sc[:, 0], jnp.any(valid, axis=1).astype(jnp.float32)
                    )

                return 0

            jax.lax.fori_loop(0, n_clusters, sbody, 0)
            return occ_sc[:, 0]

        # ---------------- point lights --------------------------------------
        Lp = plp_ref.shape[0]
        for l in range(Lp):
            lpos = plp_ref[l, :][None, :]  # [1, 3]
            lcol = plc_ref[l, 0:3][None, :]
            lmask = plc_ref[l, 3]
            l_vec = lpos - x
            d2 = jnp.sum(l_vec * l_vec, axis=1, keepdims=True)
            d_l = jnp.sqrt(jnp.maximum(d2, 1e-30))
            ldir = l_vec / jnp.maximum(d_l, 1e-30)
            if use_shadows:
                unsh = 1.0 - shadow_occluded(ldir, d_l, lmask)
            else:
                unsh = jnp.ones((R,), jnp.float32)
            unsh_ref[:, l] = unsh
            gate = lmask * unsh[:, None] * shades

            intensity = 1.0 / jnp.maximum(d2, 1e-30)
            ndotl = jnp.maximum(0.0, jnp.sum(normal * ldir, axis=1, keepdims=True))
            h = _normalize_rows(view + ldir)
            ndoth = jnp.maximum(0.0, jnp.sum(normal * h, axis=1, keepdims=True))
            spec = jnp.power(jnp.maximum(ndoth, 1e-30), m_pow) * (ndoth > 0)
            direct += gate * lcol * intensity * (m_dif * ndotl + m_spec * spec)

        # ---------------- directional lights --------------------------------
        Ld = dld_ref.shape[0]
        for l in range(Ld):
            ldir_row = dld_ref[l, :][None, :]  # unit, toward light
            lcol = dlc_ref[l, 0:3][None, :]
            lmask = dlc_ref[l, 3]
            ldir = jnp.broadcast_to(ldir_row, x.shape)
            if use_shadows:
                unsh = 1.0 - shadow_occluded(ldir, None, lmask)
            else:
                unsh = jnp.ones((R,), jnp.float32)
            unsh_ref[:, Lp + l] = unsh
            gate = lmask * unsh[:, None] * shades

            ndotl = jnp.maximum(0.0, jnp.sum(normal * ldir, axis=1, keepdims=True))
            h = _normalize_rows(view + ldir)
            ndoth = jnp.maximum(0.0, jnp.sum(normal * h, axis=1, keepdims=True))
            spec = jnp.power(jnp.maximum(ndoth, 1e-30), m_pow) * (ndoth > 0)
            direct += gate * lcol * (m_dif * ndotl + m_spec * spec)

        out_ref[:, 0:3] = direct
        out_ref[:, 3] = t
        meta_ref[:, 0] = kind
        meta_ref[:, 1] = index


def _pack_shade_planes(mesh: accel.ClusteredMesh, tri_table):
    """[C, 14, cs] per-cluster shade planes in SORTED order: unit normal +
    ambient/diffuse/specular/power/ior gathered through mesh.perm."""
    C = mesh.n_clusters
    cs = mesh.v0.shape[0] // C
    e1 = mesh.v1 - mesh.v0
    e2 = mesh.v2 - mesh.v0
    n = jnp.cross(e1, e2)
    n2 = jnp.sum(n * n, axis=1, keepdims=True)
    posn = n2 > 0
    n = n * jax.lax.rsqrt(jnp.where(posn, n2, 1.0)) * posn
    perm = mesh.perm.astype(jnp.int32)
    amb = tri_table.ambient[perm]
    dif = tri_table.diffuse[perm]
    spec = tri_table.specular[perm]
    power = tri_table.power[perm]
    ior = tri_table.ior[perm]
    planes = jnp.concatenate(
        [n, amb, dif, spec, power[:, None], ior[:, None]], axis=1
    )  # [Tc, 14]
    return planes.reshape(C, cs, _N_SHADE).transpose(0, 2, 1)  # [C, 14, cs]


def fused_shade_forward(o, d, scene, *, use_shadows, live=None, reorder=True):
    """Run the megakernel: (direct [R,3], t [R], kind [R] i32,
    index [R] i32, unshadowed [R, Lp+Ld] float). Forward-only.

    live: optional [R] f32 mask (1.0 = ray still carries throughput).
    Dead rays are sorted to the END of the batch and excluded from every
    per-tile shortlist; all-dead tiles exit after writing defaults. For
    MC bounce batches this is the dominant saving: on dragon 640x480 only
    ~8%% of primary rays hit the mesh, so ~92%% of bounce-ray slots carry
    zero throughput — without the mask they'd still pay full intersection
    plus shadow sweeps for radiance that is multiplied by zero.
    """
    mesh = scene.clusters
    R = o.shape[0]
    feats = ray_features(o, d)
    if reorder:
        # One [R,9] row gather in (features carry o/d in columns 6:9 /
        # 0:3), one [R,6+L] row scatter out — 1-D permutes are
        # sublane-serial on TPU and were ~0.5 s/frame in the per-array
        # form (culled.py has the same structure and rationale).
        from skele_raytracer_tpu.ops.pallas.culled import _spatial_sort_keys

        keys = _spatial_sort_keys(o, d, mesh.aabb_lo.min(0), mesh.aabb_hi.max(0))
        if live is not None:
            # dead rays last, grouped into all-dead (near-free) tiles
            keys = jnp.where(live > 0, keys >> jnp.uint32(1),
                             jnp.uint32(0xFFFFFFFF))
        keys_s, order_r = jax.lax.sort_key_val(
            keys, jnp.arange(R, dtype=jnp.int32)
        )
        live_s = None
        if live is not None:
            live_s = (keys_s != jnp.uint32(0xFFFFFFFF)).astype(jnp.float32)
        direct, t, kind, index, unsh = _fused_from_feats(
            feats[order_r], scene, use_shadows=use_shadows, live=live_s
        )
        # Unsort by sorting on the forward permutation — measured cheaper
        # than a row scatter on TPU, and int payloads ride natively.
        L = unsh.shape[1]
        cols = (
            [direct[:, j] for j in range(3)]
            + [t, kind, index]
            + [unsh[:, j] for j in range(L)]
        )
        outs = jax.lax.sort((order_r, *cols), dimension=0, num_keys=1)
        return (
            jnp.stack(outs[1:4], axis=1),
            outs[4],
            outs[5],
            outs[6],
            jnp.stack(outs[7:], axis=1),
        )
    return _fused_from_feats(feats, scene, use_shadows=use_shadows, live=live)


def _fused_from_feats(feats, scene, *, use_shadows, live=None):
    """Megakernel dispatch on precomputed ray features [R, 9] (columns:
    d, o x d, o)."""
    mesh = scene.clusters
    R = feats.shape[0]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    C = mesh.n_clusters
    cs = mesh.v0.shape[0] // C
    rp = -(-R // TILE_R) * TILE_R
    n_tiles = rp // TILE_R

    # host-side shortlist for the PRIMARY rays (shadow rays cull
    # in-kernel), ordered FRONT-TO-BACK by each tile's minimum entry
    # distance so the kernel's running-t pretest can prune the tail.
    amask, entry = accel.ray_aabb_entry(
        o, d, mesh.aabb_lo, mesh.aabb_hi, allow_negative=False,
        t_clip=CLEAN_T_EPS,
    )
    if live is not None:
        amask = amask & (live > 0)[:, None]
    entry = jnp.where(amask, entry, _BIG)
    entry = _pad_rows(entry, rp, fill=_BIG).reshape(n_tiles, TILE_R, C)
    tile_entry = jnp.min(entry, axis=1)  # [n_tiles, C]
    order = jnp.argsort(tile_entry, axis=1).astype(jnp.int32)
    counts = jnp.sum(tile_entry < _BIG, axis=1).astype(jnp.int32)
    if live is None:
        lives = jnp.full((n_tiles,), TILE_R, jnp.int32)
    else:
        live_t = _pad_rows(live[:, None], rp).reshape(n_tiles, TILE_R)
        lives = jnp.sum((live_t > 0).astype(jnp.int32), axis=1)

    K, kof = pack_triangles(mesh.v0, mesh.v1, mesh.v2)
    kc = K.reshape(9, 4, C, cs).transpose(2, 0, 1, 3)
    aux = jnp.stack(
        [
            kof.reshape(C, cs),
            mesh.mask.reshape(C, cs),
            mesh.perm.astype(jnp.float32).reshape(C, cs),
        ],
        axis=1,
    )
    shd = _pack_shade_planes(mesh, scene.triangles)
    feats = _pad_rows(feats, rp, fill=1.0)

    sph = scene.spheres
    cen = sph.center
    saux = jnp.stack(
        [jnp.sum(cen * cen, axis=1) - sph.radius * sph.radius, sph.mask]
    )
    smat = jnp.concatenate(
        [sph.ambient, sph.diffuse, sph.specular,
         sph.power[:, None], sph.ior[:, None]], axis=1,
    ).T  # [11, S]

    plights, dlights = scene.point_lights, scene.directional_lights
    plp = plights.position
    plc = jnp.concatenate([plights.colour, plights.mask[:, None]], axis=1)
    dl_dir = dlights.direction
    dln = jnp.sqrt(jnp.maximum(jnp.sum(dl_dir * dl_dir, axis=1, keepdims=True), 1e-30))
    dld = dl_dir / dln  # unit, toward light (ops/shading.py semantics)
    dlc = jnp.concatenate([dlights.colour, dlights.mask[:, None]], axis=1)
    const = jnp.stack([scene.camera.position, scene.ambient])

    Lp, Ld = plp.shape[0], dld.shape[0]
    L_out = Lp + Ld

    resident = mesh_resident_bytes(C, cs) <= RESIDENT_BUDGET_BYTES
    mesh_space = pltpu.VMEM if resident else pl.ANY

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_R, 9), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cen
            pl.BlockSpec(memory_space=pltpu.VMEM),  # saux
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # plp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # plc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dld
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dlc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # const
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi
            pl.BlockSpec(memory_space=mesh_space),  # kc
            pl.BlockSpec(memory_space=mesh_space),  # aux
            pl.BlockSpec(memory_space=mesh_space),  # shd
        ],
        out_specs=(
            pl.BlockSpec((TILE_R, 4), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 2), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, L_out), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 4, cs), jnp.float32),
            pltpu.VMEM((2, 3, cs), jnp.float32),
            pltpu.VMEM((2, _N_SHADE, cs), jnp.float32),
            pltpu.VMEM((TILE_R, _N_SHADE), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.int32),
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out, meta, unsh = pl.pallas_call(
        functools.partial(
            _megakernel, cs=cs, n_clusters=C, use_shadows=use_shadows,
            resident=resident,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rp, 4), jnp.float32),
            jax.ShapeDtypeStruct((rp, 2), jnp.int32),
            jax.ShapeDtypeStruct((rp, L_out), jnp.float32),
        ),
        interpret=_interpret(),
    )(order, counts, lives, feats, cen, saux, smat, plp, plc, dld, dlc, const,
      mesh.aabb_lo, mesh.aabb_hi, kc, aux, shd)

    direct = out[:R, 0:3]
    t = out[:R, 3]
    kind = meta[:R, 0]
    index = meta[:R, 1]
    t = jnp.where(t < _BIG, t, jnp.inf)
    index = jnp.where(
        kind == 2, jnp.minimum(index, scene.triangles.v0.shape[0] - 1), index
    )
    return direct, t, kind, index, unsh[:R]


# ---------------------------------------------------------------------------
# custom_vjp: forward = megakernel, backward = differentiable jnp replay
# from the saved hit structure (kind, index, unshadowed)
# ---------------------------------------------------------------------------


def shade_replay(o, d, scene, kind, index, unshadowed, *, use_shadows):
    """Differentiable jnp re-computation of the megakernel's outputs FROM
    the discrete hit structure: per-ray t (replay_triangle_t / single
    sphere quadratic), hit point/normal, material gather, clean
    Blinn-Phong with the kernel's shadow gates. O(rays) — no [R, T] or
    [R, C] scan, no re-intersection. Returns (direct [R,3], t [R])."""
    from skele_raytracer_tpu.ops.geometry import (
        _pos_sqrt,
        dot,
        normalize,
        gather_rows,
        one_hot_rows,
        replay_triangle_t,
    )

    tri_sel = kind == 2
    sph_sel = kind == 1

    # sphere t replay (same quadratic restricted to the selected sphere)
    S = scene.spheres.mask.shape[0]
    oh = one_hot_rows(jnp.where(sph_sel, index, 0), S)
    c_sel = gather_rows(oh, scene.spheres.center)
    r_sel = gather_rows(oh, scene.spheres.radius[:, None])
    ec = o - c_sel
    a = dot(d, d)
    b = 2.0 * dot(d, ec)
    c = dot(ec, ec) - r_sel[:, 0] ** 2
    t_sph = (-b - _pos_sqrt(b * b - 4.0 * a * c)) / (2.0 * a)

    t_tri = replay_triangle_t(o, d, scene.triangles, jnp.where(tri_sel, index, 0))
    t = jnp.where(tri_sel, t_tri, jnp.where(sph_sel, t_sph, 0.0))
    x = o + d * t[:, None]

    n_sph = normalize(x - c_sel)
    idx_t = jnp.minimum(jnp.where(tri_sel, index, 0), scene.triangles.v0.shape[0] - 1)
    e1 = scene.triangles.v1[idx_t] - scene.triangles.v0[idx_t]
    e2 = scene.triangles.v2[idx_t] - scene.triangles.v0[idx_t]
    n_tri = normalize(jnp.cross(e1, e2))
    n_tri = n_tri * jnp.where(dot(n_tri, d)[:, None] > 0, -1.0, 1.0)
    normal = jnp.where(tri_sel[:, None], n_tri, n_sph)

    def sel_mat(field):
        sv = gather_rows(oh, getattr(scene.spheres, field).reshape(S, -1))
        tv = getattr(scene.triangles, field).reshape(
            scene.triangles.mask.shape[0], -1
        )[idx_t]
        return jnp.where(tri_sel[:, None], tv, sv)

    m_amb = sel_mat("ambient")
    m_dif = sel_mat("diffuse")
    m_spec = sel_mat("specular")
    m_pow = sel_mat("power")

    shades = (tri_sel | sph_sel)[:, None].astype(jnp.float32)
    view = normalize(scene.camera.position[None, :] - x)
    direct = scene.ambient[None, :] * m_amb

    plights = scene.point_lights
    Lp = plights.mask.shape[0]
    for l in range(Lp):
        lpos = plights.position[l][None, :]
        lcol = plights.colour[l][None, :]
        l_vec = lpos - x
        d2 = jnp.sum(l_vec * l_vec, axis=1, keepdims=True)
        ldir = l_vec / _pos_sqrt(jnp.maximum(d2, 1e-30))[:, :]
        gate = plights.mask[l] * unshadowed[:, l][:, None] * shades
        intensity = 1.0 / jnp.maximum(d2, 1e-30)
        ndotl = jnp.maximum(0.0, jnp.sum(normal * ldir, axis=1, keepdims=True))
        h_raw = view + ldir
        h = h_raw / jnp.maximum(
            _pos_sqrt(jnp.sum(h_raw * h_raw, axis=1, keepdims=True)), 1e-30
        )
        ndoth = jnp.maximum(0.0, jnp.sum(normal * h, axis=1, keepdims=True))
        spec = jnp.power(jnp.maximum(ndoth, 1e-30), m_pow) * (ndoth > 0)
        direct += gate * lcol * intensity * (m_dif * ndotl + m_spec * spec)

    dlights = scene.directional_lights
    Ld = dlights.mask.shape[0]
    for l in range(Ld):
        ldir = normalize(dlights.direction[l])[None, :]
        ldir = jnp.broadcast_to(ldir, x.shape)
        lcol = dlights.colour[l][None, :]
        gate = dlights.mask[l] * unshadowed[:, Lp + l][:, None] * shades
        ndotl = jnp.maximum(0.0, jnp.sum(normal * ldir, axis=1, keepdims=True))
        h_raw = view + ldir
        h = h_raw / jnp.maximum(
            _pos_sqrt(jnp.sum(h_raw * h_raw, axis=1, keepdims=True)), 1e-30
        )
        ndoth = jnp.maximum(0.0, jnp.sum(normal * h, axis=1, keepdims=True))
        spec = jnp.power(jnp.maximum(ndoth, 1e-30), m_pow) * (ndoth > 0)
        direct += gate * lcol * (m_dif * ndotl + m_spec * spec)

    return direct, t


def hit_geometry(o, d, scene, kind, index, t):
    """Differentiable (point, normal) replay from the discrete hit
    structure — shared by the integrator's megakernel path (the kernel's
    in-VMEM normals/materials never leave the chip; downstream consumers
    re-derive them at O(rays) from the saved (kind, index))."""
    from skele_raytracer_tpu.ops.geometry import (
        dot,
        gather_rows,
        normalize,
        one_hot_rows,
    )

    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    point = o + d * t_safe[:, None]
    S = scene.spheres.mask.shape[0]
    oh = one_hot_rows(jnp.where(kind == 1, index, 0), S)
    n_sph = normalize(point - gather_rows(oh, scene.spheres.center))
    idx_t = jnp.minimum(
        jnp.where(kind == 2, index, 0), scene.triangles.v0.shape[0] - 1
    )
    e1 = scene.triangles.v1[idx_t] - scene.triangles.v0[idx_t]
    e2 = scene.triangles.v2[idx_t] - scene.triangles.v0[idx_t]
    n_tri = normalize(jnp.cross(e1, e2))
    n_tri = n_tri * jnp.where(dot(n_tri, d)[:, None] > 0, -1.0, 1.0)
    normal = jnp.where((kind == 2)[:, None], n_tri, n_sph)
    return point, normal


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_shade(o, d, scene, use_shadows, live=None):
    """(direct [R,3], t [R], kind, index, unshadowed) with the megakernel
    forward and a replay-from-hit-structure backward (module docstring).

    live: optional [R] f32 throughput mask (see fused_shade_forward) —
    discrete routing data, carries no gradient."""
    sg = jax.lax.stop_gradient
    return fused_shade_forward(
        sg(o), sg(d), sg(scene), use_shadows=use_shadows,
        live=None if live is None else sg(live),
    )


def _fused_fwd(o, d, scene, use_shadows, live=None):
    out = fused_shade(o, d, scene, use_shadows, live)
    direct, t, kind, index, unsh = out
    return out, (o, d, scene, live, kind, index, unsh)


def _fused_bwd(use_shadows, res, g):
    o, d, scene, live, kind, index, unsh = res
    g_direct, g_t, _, _, _ = g

    def replay(o_, d_, scene_):
        return shade_replay(
            o_, d_, scene_, kind, index, unsh, use_shadows=use_shadows
        )

    _, vjp = jax.vjp(replay, o, d, scene)
    g_live = None if live is None else jnp.zeros_like(live)
    return vjp((g_direct, g_t)) + (g_live,)


fused_shade.defvjp(_fused_fwd, _fused_bwd)
