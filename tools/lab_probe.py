"""Time-only probes for the culled bounce-wave kernel: split the per-tile
cost into control (loop/exit machinery), matmul, and epilogue by measuring
deliberately-WRONG reduced kernels (no correctness claim — the numbers
bound what each stage costs). Run: PYTHONPATH=. python tools/lab_probe.py
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


def _probe_kernel(shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
                  kc_ref, aux_ref, t_ref, idx_ref,
                  *, cs, group_c, passes, stage):
    """stage: 'full1' = one unconditional group iteration (no loop);
    'mm' = matmul only + min; 'epi' = epilogue on a reused prods;
    'loop' = the full production-style loop."""
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[...]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    tr = TILE_R

    def mt_full(K, kof_blk, msk_blk, orig_row, width, t_cur, i_cur):
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
        if stage == "mm":
            # matmul cost only: cheap reduction so nothing is DCE'd
            t_blk = jnp.min(prods[:, 0, :] + prods[:, 3, :], axis=1)
            return jnp.minimum(t_cur, t_blk), i_cur
        det = prods[:, 0, :]
        u_num = -prods[:, 1, :]
        v_num = prods[:, 2, :]
        t_num = prods[:, 3, :] - kof_blk[None, :]
        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        det2 = det * det
        valid = (ok & (u_num * det >= 0) & (v_num * det >= 0)
                 & ((u_num + v_num) * det <= det2) & (msk_blk[None, :] > 0))
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
                            ).reshape(9, 4 * group_c * cs)
        aux_g = jnp.concatenate([aux_ref[ci] for ci in cis], axis=1)
        return mt_full(K, aux_g[0, :], aux_g[1, :], aux_g[2, :],
                       group_c * cs, t_cur, i_cur)

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)

    if stage in ("full1", "mm"):
        t_f, i_f = group(0, t0, i0)
    elif stage == "loop":
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
    t_ref[...] = t_f[:, None]
    idx_ref[...] = i_f[:, None]


def launch_probe(B, *, group_c=2, passes=6, stage="full1"):
    cs = B["cs"]
    n_tiles = B["order"].shape[0]
    R = B["feats"].shape[0]

    def launch(order_b, counts_b, ent_b, feats_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((TILE_R, 9), lambda i, *_: (i, 0),
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
            functools.partial(_probe_kernel, cs=cs, group_c=group_c,
                              passes=passes, stage=stage),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                       jax.ShapeDtypeStruct((R, 1), jnp.int32)),
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], B["kc"], B["aux"])

    def run(i=None):
        f = B["feats"] if i is None else B["feats"] * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t[:, 0], idx[:, 0]

    return run


def main():
    B = kl.build_batch()
    rows = [
        ("loop_g2_p6 (prod-like)", dict(group_c=2, passes=6, stage="loop")),
        ("loop_g2_p3", dict(group_c=2, passes=3, stage="loop")),
        ("full1_g2_p6 (no loop)", dict(group_c=2, passes=6, stage="full1")),
        ("full1_g2_p3", dict(group_c=2, passes=3, stage="full1")),
        ("mm_g2_p6 (matmul only)", dict(group_c=2, passes=6, stage="mm")),
        ("mm_g2_p3", dict(group_c=2, passes=3, stage="mm")),
        ("full1_g1_p3 (1 cluster)", dict(group_c=1, passes=3, stage="full1")),
        ("mm_g1_p3", dict(group_c=1, passes=3, stage="mm")),
    ]
    for name, kw in rows:
        run = launch_probe(B, **kw)
        try:
            ms = kl._time_run(run)
            print(f"{name:26s} {ms:8.3f} ms")
        except Exception as e:
            print(f"{name:26s} FAILED {type(e).__name__} {str(e)[:90]}")


if __name__ == "__main__":
    main()
