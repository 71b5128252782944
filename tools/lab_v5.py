"""Lab variant v5 for the culled nearest kernel, measuring three changes
together and separately (correctness-checked bitwise vs production):

1. FOLD kof + mask into the matmul: a constant 1.0 feature row carries
   -kof into the t column, and masked triangles get all-zero K columns
   (det = 0 -> |det| >= eps fails), so the epilogue loses the t_num
   subtraction and the mask compare/and, and aux shrinks to the orig row.
2. SPLIT control path: tiles with n_active <= group_c (p90 of the
   footprint-sorted bounce batch) take a straight-line single-group path
   with no fori_loop / cond / settle machinery; longer shortlists keep
   the early-exit loop.
3. group_c / mt_passes as before.

Run: PYTHONPATH=. python tools/lab_v5.py
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import tools.kernel_lab as kl
from skele_raytracer_tpu.config import CLEAN_T_EPS, TRIANGLE_DET_EPS

_BIG = kl._BIG
_BIG_I = kl._BIG_I
TILE_R = kl.TILE_R


def _v5_kernel(shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
               kc_ref, org_ref, t_ref, idx_ref,
               *, cs, group_c, passes, split_path):
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[...]  # [tr, 10] (col 9 = 1.0)
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    tr = TILE_R

    def mt(K, orig_row, width, t_cur, i_cur):
        if passes == 3:
            f_hi = feats.astype(jnp.bfloat16)
            f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            K_hi = K.astype(jnp.bfloat16)
            K_lo = (K - K_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            dg = lambda a, b: jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)
            prods = (dg(f_hi, K_hi) + (dg(f_hi, K_lo) + dg(f_lo, K_hi))
                     ).reshape(-1, 4, width)
        else:
            prods = jax.lax.dot_general(
                feats, K, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(-1, 4, width)
        det = prods[:, 0, :]
        u_num = -prods[:, 1, :]
        v_num = prods[:, 2, :]
        t_num = prods[:, 3, :]  # kof folded into the matmul
        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        det2 = det * det
        valid = (ok & (u_num * det >= 0) & (v_num * det >= 0)
                 & ((u_num + v_num) * det <= det2))  # mask folded into K
        t = t_num / jnp.where(ok, det, 1.0)
        valid = valid & (t > CLEAN_T_EPS)
        t_all = jnp.where(valid, t, _BIG)
        t_blk = jnp.min(t_all, axis=1)
        is_min = t_all == t_blk[:, None]
        orig_blk = jnp.min(
            jnp.where(is_min, orig_row[None, :], jnp.float32(_BIG_I)), axis=1
        ).astype(jnp.int32)
        better = (t_blk < t_cur) | (
            (t_blk < _BIG) & (t_blk == t_cur) & (orig_blk < i_cur))
        return (jnp.where(better, t_blk, t_cur),
                jnp.where(better, orig_blk, i_cur))

    def group(p, t_cur, i_cur):
        base = p * group_c
        cis = [shortlist_ref[i, jnp.minimum(base + g, kc_ref.shape[0] - 1)]
               for g in range(group_c)]
        K = jnp.concatenate([kc_ref[ci] for ci in cis], axis=2
                            ).reshape(10, 4 * group_c * cs)
        orig = jnp.concatenate([org_ref[ci] for ci in cis], axis=1)[0]
        return mt(K, orig, group_c * cs, t_cur, i_cur)

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)

    def run_loop():
        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
        root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
        root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
        texit = jnp.min(jnp.maximum((root_lo - o) * inv_d,
                                    (root_hi - o) * inv_d), axis=1)
        n_iters = (n_active + group_c - 1) // group_c

        def body(p, carry):
            t_cur, i_cur, done = carry

            def live(_):
                t_n, i_n = group(p, t_cur, i_cur)
                settle = jnp.max(jnp.minimum(t_n, texit))
                nxt = jnp.minimum((p + 1) * group_c, ent_ref.shape[1] - 1)
                return t_n, i_n, jnp.where(ent_ref[i, nxt] > settle, 1, done)

            return jax.lax.cond(done == 0, live,
                                lambda _: (t_cur, i_cur, done), 0)

        t_f, i_f, _ = jax.lax.fori_loop(0, n_iters, body, (t0, i0, 0))
        return t_f, i_f

    if split_path:
        t_ref[...] = t0[:, None]
        idx_ref[...] = i0[:, None]

        @pl.when((n_active > 0) & (n_active <= group_c))
        def _():
            t_f, i_f = group(0, t0, i0)
            t_ref[...] = t_f[:, None]
            idx_ref[...] = i_f[:, None]

        @pl.when(n_active > group_c)
        def _():
            t_f, i_f = run_loop()
            t_ref[...] = t_f[:, None]
            idx_ref[...] = i_f[:, None]
    else:
        t_f, i_f = run_loop()
        t_ref[...] = t_f[:, None]
        idx_ref[...] = i_f[:, None]


def launch_v5(B, *, group_c=2, passes=6, split_path=True):
    cs = B["cs"]
    n_tiles = B["order"].shape[0]
    R = B["feats"].shape[0]
    C = B["C"]
    # K10: [C, 10, 4, cs] with the kof fold in row 9 of the t column and
    # the mask fold (masked triangles -> all-zero columns).
    kc = np.asarray(B["kc"])  # [C, 9, 4, cs]
    aux = np.asarray(B["aux"])  # [C, 3, cs]: kof, mask, orig
    msk = aux[:, 1:2, None, :]  # [C,1,1,cs]
    k10 = np.zeros((C, 10, 4, cs), np.float32)
    k10[:, 0:9] = kc
    k10[:, 9, 3, :] = -aux[:, 0, :]
    k10 *= (msk > 0)
    k10 = jnp.asarray(k10)
    org = jnp.asarray(aux[:, 2:3, :])  # [C, 1, cs]
    feats10 = jnp.concatenate(
        [B["feats"], jnp.ones((R, 1), jnp.float32)], axis=1)

    def launch(order_b, counts_b, ent_b, feats_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((TILE_R, 10), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)))
        return pl.pallas_call(
            functools.partial(_v5_kernel, cs=cs, group_c=group_c,
                              passes=passes, split_path=split_path),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                       jax.ShapeDtypeStruct((R, 1), jnp.int32)),
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], k10, org)

    def run(i=None):
        f = feats10 if i is None else feats10 * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t[:, 0], idx[:, 0]

    return run


def _v6_kernel(shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
               kc_ref, org_ref, t_ref, idx_ref,
               *, cs, group_c, passes, per_group):
    """v5 folds + PER-PLANE matmuls: det/u/v/t come from 4 separate dots
    on contiguous K column slices — no [*, 4, w] reshape, no plane
    slicing of a wide prods array. per_group additionally skips the
    cluster-block concat: per (group, plane) dots on [10, cs] sublane
    slices of kc_ref[ci], with per-group narrow epilogues."""
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[...]  # [tr, 10]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    tr = TILE_R

    if passes == 3:
        f_hi = feats.astype(jnp.bfloat16)
        f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot_pl(K):
        if passes == 3:
            K_hi = K.astype(jnp.bfloat16)
            K_lo = (K - K_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            dg = lambda a, b: jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)
            return dg(f_hi, K_hi) + (dg(f_hi, K_lo) + dg(f_lo, K_hi))
        return jax.lax.dot_general(
            feats, K, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def epilogue(det, u_num, v_num, t_num, orig_row, t_cur, i_cur):
        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        det2 = det * det
        valid = (ok & (u_num * det >= 0) & (v_num * det >= 0)
                 & ((u_num + v_num) * det <= det2))
        t = t_num / jnp.where(ok, det, 1.0)
        valid = valid & (t > CLEAN_T_EPS)
        t_all = jnp.where(valid, t, _BIG)
        t_blk = jnp.min(t_all, axis=1)
        is_min = t_all == t_blk[:, None]
        orig_blk = jnp.min(
            jnp.where(is_min, orig_row[None, :], jnp.float32(_BIG_I)), axis=1
        ).astype(jnp.int32)
        better = (t_blk < t_cur) | (
            (t_blk < _BIG) & (t_blk == t_cur) & (orig_blk < i_cur))
        return (jnp.where(better, t_blk, t_cur),
                jnp.where(better, orig_blk, i_cur))

    def group(p, t_cur, i_cur):
        base = p * group_c
        cis = [shortlist_ref[i, jnp.minimum(base + g, kc_ref.shape[0] - 1)]
               for g in range(group_c)]
        if per_group:
            for ci in cis:
                Kc = kc_ref[ci]  # [10, 4, cs]
                det = dot_pl(Kc[:, 0, :])
                u_num = -dot_pl(Kc[:, 1, :])
                v_num = dot_pl(Kc[:, 2, :])
                t_num = dot_pl(Kc[:, 3, :])
                t_cur, i_cur = epilogue(det, u_num, v_num, t_num,
                                        org_ref[ci][0], t_cur, i_cur)
            return t_cur, i_cur
        W = group_c * cs
        K = jnp.concatenate([kc_ref[ci] for ci in cis], axis=2
                            ).reshape(10, 4 * W)
        orig = jnp.concatenate([org_ref[ci] for ci in cis], axis=1)[0]
        det = dot_pl(K[:, 0:W])
        u_num = -dot_pl(K[:, W:2 * W])
        v_num = dot_pl(K[:, 2 * W:3 * W])
        t_num = dot_pl(K[:, 3 * W:4 * W])
        return epilogue(det, u_num, v_num, t_num, orig, t_cur, i_cur)

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)

    def run_loop():
        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
        root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
        root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
        texit = jnp.min(jnp.maximum((root_lo - o) * inv_d,
                                    (root_hi - o) * inv_d), axis=1)
        n_iters = (n_active + group_c - 1) // group_c

        def body(p, carry):
            t_cur, i_cur, done = carry

            def live(_):
                t_n, i_n = group(p, t_cur, i_cur)
                settle = jnp.max(jnp.minimum(t_n, texit))
                nxt = jnp.minimum((p + 1) * group_c, ent_ref.shape[1] - 1)
                return t_n, i_n, jnp.where(ent_ref[i, nxt] > settle, 1, done)

            return jax.lax.cond(done == 0, live,
                                lambda _: (t_cur, i_cur, done), 0)

        t_f, i_f, _ = jax.lax.fori_loop(0, n_iters, body, (t0, i0, 0))
        return t_f, i_f

    t_ref[...] = t0[:, None]
    idx_ref[...] = i0[:, None]

    @pl.when((n_active > 0) & (n_active <= group_c))
    def _():
        t_f, i_f = group(0, t0, i0)
        t_ref[...] = t_f[:, None]
        idx_ref[...] = i_f[:, None]

    @pl.when(n_active > group_c)
    def _():
        t_f, i_f = run_loop()
        t_ref[...] = t_f[:, None]
        idx_ref[...] = i_f[:, None]


def launch_v6(B, *, group_c=2, passes=6, per_group=False):
    cs = B["cs"]
    n_tiles = B["order"].shape[0]
    R = B["feats"].shape[0]
    C = B["C"]
    kc = np.asarray(B["kc"])
    aux = np.asarray(B["aux"])
    msk = aux[:, 1:2, None, :]
    k10 = np.zeros((C, 10, 4, cs), np.float32)
    k10[:, 0:9] = kc
    k10[:, 9, 3, :] = -aux[:, 0, :]
    k10 *= (msk > 0)
    k10 = jnp.asarray(k10)
    org = jnp.asarray(aux[:, 2:3, :])
    feats10 = jnp.concatenate(
        [B["feats"], jnp.ones((R, 1), jnp.float32)], axis=1)

    def launch(order_b, counts_b, ent_b, feats_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((TILE_R, 10), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)))
        return pl.pallas_call(
            functools.partial(_v6_kernel, cs=cs, group_c=group_c,
                              passes=passes, per_group=per_group),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                       jax.ShapeDtypeStruct((R, 1), jnp.int32)),
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], k10, org)

    def run(i=None):
        f = feats10 if i is None else feats10 * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t[:, 0], idx[:, 0]

    return run


def main():
    B = kl.build_batch()
    runs = [("prod_g2 (baseline)", kl.launch_prod(B, 2)),
            ("v5_g2_p3", launch_v5(B, group_c=2, passes=3)),
            ("v6_g2_p3 (per-plane)", launch_v6(B, group_c=2, passes=3)),
            ("v6_g2_p3_pergroup", launch_v6(B, group_c=2, passes=3,
                                            per_group=True)),
            ("v6_g2_p6 (per-plane)", launch_v6(B, group_c=2, passes=6)),
            ("v6_g4_p3 (per-plane)", launch_v6(B, group_c=4, passes=3))]
    ref = None
    for name, run in runs:
        try:
            t, idx = jax.block_until_ready(jax.jit(lambda r=run: r())())
        except Exception as e:
            print(f"{name:22s} FAILED {type(e).__name__} {str(e)[:100]}")
            continue
        t, idx = np.asarray(t), np.asarray(idx)
        if ref is None:
            ref, ok = (t, idx), "ref"
        else:
            nt = int((t != ref[0]).sum())
            ni = int((idx != ref[1]).sum())
            ok = "OK" if nt == 0 and ni == 0 else f"MISMATCH t:{nt} idx:{ni}"
        print(f"{name:22s} {kl._time_run(run):8.3f} ms device  [{ok}]")


if __name__ == "__main__":
    main()
