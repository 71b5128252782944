"""Kernel lab: launch-level A/B harness for the culled nearest-hit kernel.

Builds one realistic dragon bounce-wave batch (131k rays, footprint-sorted,
tables prebuilt) and times kernel VARIANTS with the slope method (K=8 vs
K=40 in-program repetitions; the ~24 ms axon dispatch floor cancels).

Usage: python tools/kernel_lab.py [variant ...]
Variants are registered in VARIANTS below; default runs all.
Correctness: every variant's (t, idx) must match the production kernel
bitwise on the batch, or the row is flagged MISMATCH.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import jax._src.compilation_cache as cc

cc.set_cache_dir(".jax_cache")

from skele_raytracer_tpu.scene.parser import parse_scene
from skele_raytracer_tpu.config import RenderConfig, CLEAN, CLEAN_T_EPS, TRIANGLE_DET_EPS
from skele_raytracer_tpu.ops.camera import rays_for_ids
from skele_raytracer_tpu.models.integrator import _mc_continue, _shade_hit
from skele_raytracer_tpu.ops.pallas import culled
from skele_raytracer_tpu.ops.pallas.intersect import ray_features, _BIG, _BIG_I, pack_triangles
from skele_raytracer_tpu.ops import accel

TILE_R = 256


def build_batch(cluster_size=128, tile_r=TILE_R):
    cfg = RenderConfig(width=640, height=480, max_depth=2, use_shadows=True,
                       monte_carlo=True, num_paths=16, backend="pallas",
                       rays_per_chunk=1 << 17, quirks=CLEAN)
    scene = parse_scene("scenes/dragon.scn").to_scene(cfg.quirks)
    mesh = scene.clusters
    if cluster_size is not None:
        tri = scene.triangles
        mesh = accel.build_clusters(
            np.asarray(tri.v0), np.asarray(tri.v1), np.asarray(tri.v2),
            np.asarray(tri.mask), cluster_size=cluster_size)
    P, C = 16, 8192
    key = jnp.uint32(0)
    sample_ids = jnp.arange(C, dtype=jnp.uint32) + 100 * C

    @jax.jit
    def make_bounce(scene, key):
        o, d = rays_for_ids(scene.camera, cfg, key, sample_ids)
        hits, mat, direct, shades, miss = _shade_hit(
            scene, cfg, key, o, d, sample_ids, 0)
        path_ids = (sample_ids[:, None] * P
                    + jnp.arange(P, dtype=jnp.uint32)[None, :]).reshape(-1)
        rep = lambda a: jnp.repeat(a, P, axis=0)
        o1, d1, f1 = _mc_continue(
            scene, cfg, key, jax.tree_util.tree_map(rep, hits),
            jax.tree_util.tree_map(rep, mat), path_ids, 0)
        live = jnp.any((f1 * rep(shades)[:, None]) != 0, axis=1)
        return o1, d1, live.astype(jnp.float32)

    o1, d1, live = jax.block_until_ready(make_bounce(scene, key))
    R = o1.shape[0]

    @jax.jit
    def build(o, d, l):
        feats = ray_features(o, d)
        keys = culled._footprint_sort_keys(o, d, mesh, allow_negative=False)
        keys = jnp.where(l > 0, keys, jnp.uint32(0xFFFFFFFF))
        ks, order = jax.lax.sort_key_val(keys, jnp.arange(R, dtype=jnp.int32))
        feats_s = feats[order]
        o_s, d_s = feats_s[:, 6:9], feats_s[:, 0:3]
        cull_lo, cull_hi = mesh.bounds(mirrored=False)
        amask, entry = accel.ray_aabb_entry(
            o_s, d_s, cull_lo, cull_hi, allow_negative=False)
        amask = amask & (ks != jnp.uint32(0xFFFFFFFF))[:, None]
        entry = jnp.where(amask, entry, _BIG).reshape(
            R // tile_r, tile_r, mesh.n_clusters)
        tile_entry = jnp.min(entry, axis=1)
        order_c = jnp.argsort(tile_entry, axis=1).astype(jnp.int32)
        counts = jnp.sum(tile_entry < _BIG, axis=1).astype(jnp.int32)
        ent = jnp.concatenate(
            [jnp.sort(tile_entry, axis=1),
             jnp.full((R // tile_r, 1), _BIG, jnp.float32)], axis=1)
        return feats_s, order_c, counts, ent, order

    feats_s, order_c, counts, ent, order = jax.block_until_ready(
        build(o1, d1, live))
    cull_lo, cull_hi = mesh.bounds(mirrored=False)
    Csz = mesh.n_clusters
    cs = mesh.v0.shape[0] // Csz
    Kp, kof = pack_triangles(mesh.v0, mesh.v1, mesh.v2)
    kc = Kp.reshape(9, 4, Csz, cs).transpose(2, 0, 1, 3)
    aux = jnp.stack([kof.reshape(Csz, cs), mesh.mask.reshape(Csz, cs),
                     mesh.perm.astype(jnp.float32).reshape(Csz, cs)], axis=1)
    return dict(feats=feats_s, order=order_c, counts=counts, ent=ent,
                lo=cull_lo, hi=cull_hi, kc=kc, aux=aux, cs=cs, C=Csz,
                ray_order=np.asarray(order), tile_r=tile_r)


def launch_prod(B, group_c, max_tiles=512, mt_passes=6):
    """The production kernel (culled._culled_kernel) as baseline —
    current per-plane form: folded [C, 10, 4, cs] blocks + org rows
    (culled.pack_cluster_blocks layout, rebuilt here from the lab batch's
    kc/aux tables) and a 10-column feature block."""
    cs = B["cs"]
    tile_r = B.get("tile_r", TILE_R)
    C = B["C"]
    kc = np.asarray(B["kc"])  # [C, 9, 4, cs]
    aux = np.asarray(B["aux"])  # [C, 3, cs]: kof, mask, orig
    k10 = np.zeros((C, 10, 4, cs), np.float32)
    k10[:, 0:9] = kc
    k10[:, 9, 3, :] = -aux[:, 0, :]
    k10 *= (aux[:, 1:2, None, :] > 0)
    k10 = jnp.asarray(k10)
    org = jnp.asarray(aux[:, 2:3, :])

    def one(order_b, counts_b, ent_b, feats_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(order_b.shape[0],),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((tile_r, 10), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((tile_r, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((tile_r, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((2, 10, 4, cs), jnp.float32),
                            pltpu.VMEM((2, 1, cs), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, 2))])
        return pl.pallas_call(
            functools.partial(
                culled._culled_kernel, sign=-1.0, t_clip=CLEAN_T_EPS,
                cs=cs, resident=True, allow_negative=False,
                sub_t=1, group_c=group_c, mt_passes=mt_passes),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((feats_b.shape[0], 1), jnp.float32),
                       jax.ShapeDtypeStruct((feats_b.shape[0], 1), jnp.int32)),
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], k10, org)

    def launch(order_b, counts_b, ent_b, feats_b):
        n_tiles = order_b.shape[0]
        if n_tiles <= max_tiles:
            return one(order_b, counts_b, ent_b, feats_b)
        k = n_tiles // max_tiles
        xs = (order_b.reshape(k, max_tiles, -1),
              counts_b.reshape(k, max_tiles),
              ent_b.reshape(k, max_tiles, -1),
              feats_b.reshape(k, max_tiles * tile_r, -1))
        t, idx = jax.lax.map(lambda a: one(*a), xs)
        return (t.reshape(n_tiles * tile_r, 1), idx.reshape(n_tiles * tile_r, 1))

    feats10 = jnp.concatenate(
        [B["feats"], jnp.ones((B["feats"].shape[0], 1), jnp.float32)],
        axis=1)

    def run(i=None):
        f = feats10 if i is None else feats10 * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t[:, 0], idx[:, 0]

    return run


VARIANTS = {"prod_g4": lambda B: launch_prod(B, 4),
            "prod_g2": lambda B: launch_prod(B, 2),
            "prod_g2_p3": lambda B: launch_prod(B, 2, mt_passes=3),
            "prod_g4_p3": lambda B: launch_prod(B, 4, mt_passes=3),
            "prod_g1_p3": lambda B: launch_prod(B, 1, mt_passes=3)}


def variant(name):
    def deco(fn):
        VARIANTS[name] = fn
        return fn
    return deco


# --- experimental kernel: registers + gated settle + row-major outputs ----

def _lab_kernel(shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
                kc_ref, aux_ref, t_ref, idx_ref,
                *, cs, group_c, gate_settle, row_major, thin_epilogue,
                carry_regs, no_early_exit=False, passes=6):
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[...]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    tr = TILE_R

    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
    root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
    rt0 = (root_lo - o) * inv_d
    rt1 = (root_hi - o) * inv_d
    texit = jnp.min(jnp.maximum(rt0, rt1), axis=1)

    n_iters = (n_active + group_c - 1) // group_c

    def mt(K, kof_blk, msk_blk, orig_row, width, t_cur, i_cur):
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
        t_num = prods[:, 3, :] - kof_blk[None, :]
        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        if thin_epilogue:
            # sign-agreement forms: u >= 0 <=> sign(u_num) == sign(det)
            # (zero-safe: u_num == +/-0 passes both). XOR of sign bits.
            bd = jax.lax.bitcast_convert_type(det, jnp.int32)
            bu = jax.lax.bitcast_convert_type(u_num, jnp.int32)
            bv = jax.lax.bitcast_convert_type(v_num, jnp.int32)
            w = det - (u_num + v_num)  # u+v <= 1 <=> sign(w) == sign(det)
            bw = jax.lax.bitcast_convert_type(w, jnp.int32)
            zero_u = u_num == 0.0
            zero_v = v_num == 0.0
            zero_w = w == 0.0
            valid = (ok
                     & (((bu ^ bd) >= 0) | zero_u)
                     & (((bv ^ bd) >= 0) | zero_v)
                     & (((bw ^ bd) >= 0) | zero_w)
                     & (msk_blk[None, :] > 0))
        else:
            det2 = det * det
            valid = (ok
                     & (u_num * det >= 0)
                     & (v_num * det >= 0)
                     & ((u_num + v_num) * det <= det2)
                     & (msk_blk[None, :] > 0))
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
        return jnp.where(better, t_blk, t_cur), jnp.where(better, orig_blk, i_cur)

    def step(p, t_cur, i_cur):
        base = p * group_c
        cis = [shortlist_ref[i, jnp.minimum(base + g, kc_ref.shape[0] - 1)]
               for g in range(group_c)]
        K = jnp.concatenate([kc_ref[ci] for ci in cis], axis=2
                            ).reshape(9, 4 * group_c * cs)
        aux_g = jnp.concatenate([aux_ref[ci] for ci in cis], axis=1)
        return mt(K, aux_g[0, :], aux_g[1, :], aux_g[2, :], group_c * cs,
                  t_cur, i_cur)

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)

    if no_early_exit:
        def body(p, carry):
            t_cur, i_cur = carry
            return step(p, t_cur, i_cur)
        t_f, i_f = jax.lax.fori_loop(0, n_iters, body, (t0, i0))
    elif carry_regs:
        def body(p, carry):
            t_cur, i_cur, done = carry

            def live_fn(_):
                t_n, i_n = step(p, t_cur, i_cur)
                if gate_settle:
                    settle = jnp.max(jnp.minimum(t_n, texit))
                    nxt = jnp.minimum((p + 1) * group_c, ent_ref.shape[1] - 1)
                    d_n = jnp.where((p + 1 < n_iters)
                                    & (ent_ref[i, nxt] > settle), 1, 0)
                    # done=1 only matters if there IS a next iteration
                    d_n = jnp.where(p + 1 < n_iters, d_n, done)
                else:
                    settle = jnp.max(jnp.minimum(t_n, texit))
                    nxt = jnp.minimum((p + 1) * group_c, ent_ref.shape[1] - 1)
                    d_n = jnp.where(ent_ref[i, nxt] > settle, 1, done)
                return t_n, i_n, d_n

            return jax.lax.cond(done == 0, live_fn,
                                lambda _: (t_cur, i_cur, done), 0)

        t_f, i_f, _ = jax.lax.fori_loop(0, n_iters, body, (t0, i0, 0))
    else:
        t_f, i_f = t0, i0  # not implemented without carries in the lab
    if no_early_exit:
        pass

    if row_major:
        t_ref[...] = t_f.reshape(t_ref.shape)
        idx_ref[...] = i_f.reshape(idx_ref.shape)
    else:
        t_ref[...] = t_f[:, None]
        idx_ref[...] = i_f[:, None]


def launch_lab(B, *, group_c=2, gate_settle=True, row_major=True,
               thin_epilogue=False, no_early_exit=False, passes=6):
    cs = B["cs"]
    n_tiles = B["order"].shape[0]
    R = B["feats"].shape[0]
    if row_major:
        out_specs = (pl.BlockSpec((TILE_R // 128, 128), lambda i, *_: (i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((TILE_R // 128, 128), lambda i, *_: (i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (jax.ShapeDtypeStruct((R // 128, 128), jnp.float32),
                     jax.ShapeDtypeStruct((R // 128, 128), jnp.int32))
    else:
        out_specs = (pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (jax.ShapeDtypeStruct((R, 1), jnp.float32),
                     jax.ShapeDtypeStruct((R, 1), jnp.int32))

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
            out_specs=out_specs)
        return pl.pallas_call(
            functools.partial(_lab_kernel, cs=cs, group_c=group_c,
                              gate_settle=gate_settle, row_major=row_major,
                              thin_epilogue=thin_epilogue, carry_regs=True,
                              no_early_exit=no_early_exit, passes=passes),
            grid_spec=grid_spec, out_shape=out_shape,
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], B["kc"], B["aux"])

    def run(i=None):
        f = B["feats"] if i is None else B["feats"] * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t.reshape(-1), idx.reshape(-1)

    return run


VARIANTS["lab_base"] = lambda B: launch_lab(
    B, gate_settle=False, row_major=False, thin_epilogue=False)
VARIANTS["lab_gate"] = lambda B: launch_lab(
    B, gate_settle=True, row_major=False, thin_epilogue=False)
VARIANTS["lab_thin"] = lambda B: launch_lab(
    B, gate_settle=True, row_major=False, thin_epilogue=True)
VARIANTS["lab_noexit"] = lambda B: launch_lab(
    B, gate_settle=False, row_major=False, no_early_exit=True)
VARIANTS["lab_3pass"] = lambda B: launch_lab(
    B, gate_settle=False, row_major=False, passes=3)
VARIANTS["lab_3pass_noexit"] = lambda B: launch_lab(
    B, gate_settle=False, row_major=False, passes=3, no_early_exit=True)


def main():
    if sys.argv[1:2] == ["cs-sweep"]:
        return cs_sweep()
    B = build_batch()
    names = sys.argv[1:] or list(VARIANTS)
    ref = None
    for name in names:
        run = VARIANTS[name](B)
        try:
            t, idx = jax.block_until_ready(jax.jit(lambda: run())())
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:140]}")
            continue
        t, idx = np.asarray(t), np.asarray(idx)
        if ref is None:
            ref = (t, idx)
            ok = "ref"
        else:
            ok = ("OK" if (t == ref[0]).all() and (idx == ref[1]).all()
                  else "MISMATCH")

        def rep(K):
            def body(c, i):
                out = run(i)
                return c + sum(jnp.sum(jnp.asarray(x, jnp.float32))
                               for x in out), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return acc

        res = {}
        for K in (8, 40):
            f = jax.jit(functools.partial(rep, K))
            jax.block_until_ready(f())
            ts = []
            for _ in range(3):
                tt = time.perf_counter()
                np.asarray(f())
                ts.append(time.perf_counter() - tt)
            res[K] = min(ts)
        print(f"{name:14s} {(res[40]-res[8])/32*1e3:8.3f} ms device   [{ok}]")


def _time_run(run):
    def rep(K):
        def body(c, i):
            out = run(i)
            return c + sum(jnp.sum(jnp.asarray(x, jnp.float32))
                           for x in out), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc
    res = {}
    for K in (8, 40):
        f = jax.jit(functools.partial(rep, K))
        jax.block_until_ready(f())
        ts = []
        for _ in range(3):
            tt = time.perf_counter()
            np.asarray(f())
            ts.append(time.perf_counter() - tt)
        res[K] = min(ts)
    return (res[40] - res[8]) / 32 * 1e3


def cs_sweep():
    ref = None
    for csz, tr_, gs, mt in ((256, 256, (2,), 512), (128, 256, (2,), 512),
                             (64, 256, (2, 4), 256), (128, 128, (2,), 512),
                             (64, 128, (2,), 256)):
        B = build_batch(csz, tr_)
        print(f"cs={csz} tile_r={tr_}: clusters={B['C']} mean tile count "
              f"{float(np.asarray(B['counts']).mean()):.2f}")
        for g in gs:
            run = launch_prod(B, g, max_tiles=mt)
            t, idx = jax.block_until_ready(jax.jit(lambda: run())())
            t, idx = np.asarray(t), np.asarray(idx)
            # unsort into original ray order before comparing across cs
            inv = np.empty_like(B["ray_order"])
            inv[B["ray_order"]] = np.arange(len(inv))
            t, idx = t[inv], idx[inv]
            if ref is None:
                ref, ok = (t, idx), "ref"
            else:
                nt = int((t != ref[0]).sum()); ni = int((idx != ref[1]).sum())
                ok = "OK" if nt == 0 and ni == 0 else f"MISMATCH t:{nt} idx:{ni}"
            print(f"  cs={csz} tr={tr_} G={g}  {_time_run(run):8.3f} ms device  [{ok}]")




# --- flat-kc variant: [C, 9, 4*cs] plane-major blocks, no in-kernel relayout

def _flat_kernel(shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
                 kcf_ref, auxf_ref, t_ref, idx_ref,
                 *, cs, group_c, passes):
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[...]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    tr = TILE_R

    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
    root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
    rt0 = (root_lo - o) * inv_d
    rt1 = (root_hi - o) * inv_d
    texit = jnp.min(jnp.maximum(rt0, rt1), axis=1)

    n_iters = (n_active + group_c - 1) // group_c

    feats16 = jnp.concatenate(
        [feats, jnp.zeros((tr, 7), feats.dtype)], axis=1)  # [tr, 16]

    def mt(K_list, aux_list, t_cur, i_cur):
        # K_list: per-group [16, 4*cs] plane-major (det|u|v|t blocks of
        # cs; rows 9..15 are zero padding for tile-aligned dynamic reads)
        K = jnp.concatenate(K_list, axis=1)  # lane concat: [16, G*4*cs]
        if passes == 3:
            f_hi = feats16.astype(jnp.bfloat16)
            f_lo = (feats16 - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            K_hi = K.astype(jnp.bfloat16)
            K_lo = (K - K_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            dg = lambda a, b: jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)
            prods = dg(f_hi, K_hi) + (dg(f_hi, K_lo) + dg(f_lo, K_hi))
        else:
            prods = jax.lax.dot_general(
                feats16, K, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        # per-group contiguous lane slices, then lane concat per plane
        G = len(K_list)
        det = jnp.concatenate([prods[:, g*4*cs + 0*cs: g*4*cs + 1*cs] for g in range(G)], axis=1)
        u_num = -jnp.concatenate([prods[:, g*4*cs + 1*cs: g*4*cs + 2*cs] for g in range(G)], axis=1)
        v_num = jnp.concatenate([prods[:, g*4*cs + 2*cs: g*4*cs + 3*cs] for g in range(G)], axis=1)
        t_raw = jnp.concatenate([prods[:, g*4*cs + 3*cs: g*4*cs + 4*cs] for g in range(G)], axis=1)
        kof = jnp.concatenate([a[0, :] for a in aux_list], axis=0)
        msk = jnp.concatenate([a[1, :] for a in aux_list], axis=0)
        orig = jnp.concatenate([a[2, :] for a in aux_list], axis=0)
        t_num = t_raw - kof[None, :]
        ok = jnp.abs(det) >= TRIANGLE_DET_EPS
        det2 = det * det
        valid = (ok & (u_num * det >= 0) & (v_num * det >= 0)
                 & ((u_num + v_num) * det <= det2) & (msk[None, :] > 0))
        t = t_num / jnp.where(ok, det, 1.0)
        valid = valid & (t > CLEAN_T_EPS)
        t_all = jnp.where(valid, t, _BIG)
        t_blk = jnp.min(t_all, axis=1)
        is_min = t_all == t_blk[:, None]
        orig_blk = jnp.min(
            jnp.where(is_min, orig[None, :], jnp.float32(_BIG_I)), axis=1
        ).astype(jnp.int32)
        better = (t_blk < t_cur) | (
            (t_blk < _BIG) & (t_blk == t_cur) & (orig_blk < i_cur))
        return jnp.where(better, t_blk, t_cur), jnp.where(better, orig_blk, i_cur)

    def body(p, carry):
        t_cur, i_cur, done = carry

        def live_fn(_):
            base = p * group_c
            cis = [shortlist_ref[i, jnp.minimum(base + g, kcf_ref.shape[0] - 1)]
                   for g in range(group_c)]
            t_n, i_n = mt([kcf_ref[ci] for ci in cis],
                          [auxf_ref[ci] for ci in cis], t_cur, i_cur)
            settle = jnp.max(jnp.minimum(t_n, texit))
            nxt = jnp.minimum((p + 1) * group_c, ent_ref.shape[1] - 1)
            d_n = jnp.where(ent_ref[i, nxt] > settle, 1, done)
            return t_n, i_n, d_n

        return jax.lax.cond(done == 0, live_fn,
                            lambda _: (t_cur, i_cur, done), 0)

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)
    t_f, i_f, _ = jax.lax.fori_loop(0, n_iters, body, (t0, i0, 0))
    t_ref[...] = t_f[:, None]
    idx_ref[...] = i_f[:, None]


def launch_flat(B, *, group_c=2, passes=6):
    cs = B["cs"]
    n_tiles = B["order"].shape[0]
    R = B["feats"].shape[0]
    C = B["C"]
    # plane-major flat blocks: [C, 9, 4*cs] with columns [det(cs)|u|v|t]
    kcf = B["kc"].reshape(C, 9, 4, cs)
    kcf = jnp.concatenate([kcf[:, :, p_, :] for p_ in range(4)], axis=2)  # [C,9,4*cs]
    kcf = jnp.concatenate(
        [kcf, jnp.zeros((C, 7, 4 * cs), kcf.dtype)], axis=1)  # [C,16,4*cs]
    auxf = B["aux"]

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
            functools.partial(_flat_kernel, cs=cs, group_c=group_c,
                              passes=passes),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                       jax.ShapeDtypeStruct((R, 1), jnp.int32)),
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], kcf, auxf)

    def run(i=None):
        f = B["feats"] if i is None else B["feats"] * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t[:, 0], idx[:, 0]

    return run


VARIANTS["flat_g2"] = lambda B: launch_flat(B, group_c=2, passes=6)
VARIANTS["flat_g2_3p"] = lambda B: launch_flat(B, group_c=2, passes=3)
VARIANTS["flat_g4_3p"] = lambda B: launch_flat(B, group_c=4, passes=3)




# --- presplit variant: kc hi/lo bf16 passed as inputs, old layout -------

def _presplit_kernel(shortlist_ref, count_ref, ent_ref, f_ref, lo_ref, hi_ref,
                     kh_ref, kl_ref, aux_ref, t_ref, idx_ref,
                     *, cs, group_c):
    i = pl.program_id(0)
    n_active = count_ref[i]
    feats = f_ref[...]
    d = feats[:, 0:3]
    o = feats[:, 6:9]
    tr = TILE_R
    f_hi = feats.astype(jnp.bfloat16)
    f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    root_lo = jnp.min(lo_ref[:], axis=0)[None, :]
    root_hi = jnp.max(hi_ref[:], axis=0)[None, :]
    texit = jnp.min(jnp.maximum((root_lo - o) * inv_d,
                                (root_hi - o) * inv_d), axis=1)
    n_iters = (n_active + group_c - 1) // group_c
    dims = (((1,), (0,)), ((), ()))

    def body(p, carry):
        t_cur, i_cur, done = carry

        def live(_):
            base = p * group_c
            cis = [shortlist_ref[i, jnp.minimum(base + g, kh_ref.shape[0] - 1)]
                   for g in range(group_c)]
            width = group_c * cs
            Kh = jnp.concatenate([kh_ref[ci] for ci in cis], axis=2
                                 ).reshape(9, 4 * width)
            Kl = jnp.concatenate([kl_ref[ci] for ci in cis], axis=2
                                 ).reshape(9, 4 * width)
            aux_g = jnp.concatenate([aux_ref[ci] for ci in cis], axis=1)
            dg = lambda a, b: jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)
            prods = (dg(f_hi, Kh) + (dg(f_hi, Kl) + dg(f_lo, Kh))
                     ).reshape(-1, 4, width)
            det = prods[:, 0, :]
            u_num = -prods[:, 1, :]
            v_num = prods[:, 2, :]
            t_num = prods[:, 3, :] - aux_g[0, :][None, :]
            ok = jnp.abs(det) >= TRIANGLE_DET_EPS
            det2 = det * det
            valid = (ok & (u_num * det >= 0) & (v_num * det >= 0)
                     & ((u_num + v_num) * det <= det2)
                     & (aux_g[1, :][None, :] > 0))
            t = t_num / jnp.where(ok, det, 1.0)
            valid = valid & (t > CLEAN_T_EPS)
            t_all = jnp.where(valid, t, _BIG)
            t_blk = jnp.min(t_all, axis=1)
            is_min = t_all == t_blk[:, None]
            orig_blk = jnp.min(
                jnp.where(is_min, aux_g[2, :][None, :], jnp.float32(_BIG_I)),
                axis=1).astype(jnp.int32)
            better = (t_blk < t_cur) | (
                (t_blk < _BIG) & (t_blk == t_cur) & (orig_blk < i_cur))
            t_n = jnp.where(better, t_blk, t_cur)
            i_n = jnp.where(better, orig_blk, i_cur)
            settle = jnp.max(jnp.minimum(t_n, texit))
            nxt = jnp.minimum((p + 1) * group_c, ent_ref.shape[1] - 1)
            return t_n, i_n, jnp.where(ent_ref[i, nxt] > settle, 1, done)

        return jax.lax.cond(done == 0, live,
                            lambda _: (t_cur, i_cur, done), 0)

    t0 = jnp.full((tr,), _BIG, jnp.float32)
    i0 = jnp.full((tr,), _BIG_I, jnp.int32)
    t_f, i_f, _ = jax.lax.fori_loop(0, n_iters, body, (t0, i0, 0))
    t_ref[...] = t_f[:, None]
    idx_ref[...] = i_f[:, None]


def launch_presplit(B, *, group_c=2):
    cs = B["cs"]
    n_tiles = B["order"].shape[0]
    R = B["feats"].shape[0]
    kc = B["kc"]
    kh = kc.astype(jnp.bfloat16)
    kl = (kc - kh.astype(jnp.float32)).astype(jnp.bfloat16)

    def launch(order_b, counts_b, ent_b, feats_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((TILE_R, 9), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)))
        return pl.pallas_call(
            functools.partial(_presplit_kernel, cs=cs, group_c=group_c),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                       jax.ShapeDtypeStruct((R, 1), jnp.int32)),
        )(order_b, counts_b, ent_b, feats_b,
          B["lo"], B["hi"], kh, kl, B["aux"])

    def run(i=None):
        f = B["feats"] if i is None else B["feats"] * (1 + 1e-9 * i)
        t, idx = launch(B["order"], B["counts"], B["ent"], f)
        return t[:, 0], idx[:, 0]

    return run


VARIANTS["presplit_g2"] = lambda B: launch_presplit(B, group_c=2)


if __name__ == "__main__":
    main()
