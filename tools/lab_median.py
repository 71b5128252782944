"""Probe: recursive object-median clustering (cs-quantized cuts) vs the
Morton-run clustering, on the dragon bounce-wave batch. Host-side only —
per-ray results are clustering-independent (exact nearest over all
triangles + original-index tie-break), so this is a drop-in cull-quality
experiment. Run: PYTHONPATH=. python tools/lab_median.py
"""

import sys

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import tools.kernel_lab as kl
from skele_raytracer_tpu.ops import accel


def median_order(cent, real, cs):
    """Order of ALL rows: real triangles recursively median-split (widest
    centroid axis) with cuts at multiples of cs, padding rows last."""
    out = []

    def rec(ids):
        n = len(ids)
        if n <= cs:
            out.append(ids)
            return
        c = cent[ids]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        srt = ids[np.argsort(c[:, ax], kind="stable")]
        k = int(round(n / 2 / cs)) * cs
        k = min(max(k, cs), ((n - 1) // cs) * cs)
        rec(srt[:k])
        rec(srt[k:])

    idx = np.where(real)[0].astype(np.int32)
    rec(idx)
    pad = np.where(~real)[0].astype(np.int32)
    return np.concatenate(out + [pad])


def build_median(v0, v1, v2, mask, cluster_size=accel.CLUSTER_SIZE):
    """accel.build_clusters with the Morton order replaced by the
    recursive-median order (same padding/AABB machinery)."""
    import jax.numpy as jnp

    v0n, v1n, v2n = (np.asarray(v) for v in (v0, v1, v2))
    m = np.asarray(mask)
    real = m > 0
    cent = (v0n + v1n + v2n) / 3.0
    order = median_order(cent, real, cluster_size)

    T = v0n.shape[0]
    tc = -(-T // cluster_size) * cluster_size
    pad = tc - T
    order_p = np.concatenate([order, np.zeros(pad, np.int32)])
    take = lambda a: np.concatenate(
        [a[order], np.zeros((pad,) + a.shape[1:], a.dtype)])
    sv0, sv1, sv2 = take(v0n), take(v1n), take(v2n)
    sm = np.concatenate([m[order], np.zeros(pad, m.dtype)])

    C = tc // cluster_size
    cm = sm.reshape(C, cluster_size)
    empty = (cm > 0).sum(axis=1) == 0
    big = np.float32(3e38)

    def bounds_of(point_sets):
        k = len(point_sets)
        pts = np.stack(point_sets, axis=1).reshape(C, cluster_size * k, 3)
        wide = np.repeat(cm, k, axis=1)[..., None]
        lo_c = np.where(wide > 0, pts, big).min(axis=1)
        hi_c = np.where(wide > 0, pts, -big).max(axis=1)
        lo_c[empty] = 1.0
        hi_c[empty] = 0.0
        return lo_c.astype(np.float32), hi_c.astype(np.float32)

    lo_c, hi_c = bounds_of([sv0, sv1, sv2])
    lo_m, hi_m = bounds_of([sv0, sv1, sv2, 2.0 * sv0 - sv1, 2.0 * sv0 - sv2])
    return accel.ClusteredMesh(
        v0=jnp.asarray(sv0), v1=jnp.asarray(sv1), v2=jnp.asarray(sv2),
        mask=jnp.asarray(sm), perm=jnp.asarray(order_p, jnp.float32),
        aabb_lo=jnp.asarray(lo_c), aabb_hi=jnp.asarray(hi_c),
        aabb_lo_m=jnp.asarray(lo_m), aabb_hi_m=jnp.asarray(hi_m),
    )


def main():
    ref = None
    orig_build = accel.build_clusters
    for name, builder in (("morton", orig_build), ("median", build_median)):
        accel.build_clusters = builder
        try:
            B = kl.build_batch(cluster_size=128)
        finally:
            accel.build_clusters = orig_build
        c = np.asarray(B["counts"])
        live = c[c > 0]
        print(f"{name}: C={B['C']} count mean {live.mean():.2f} "
              f"p50/p90/p99 {np.percentile(live, [50, 90, 99])} max {c.max()} "
              f"g2 iters {int(np.ceil(c / 2).sum())}")
        run = kl.launch_prod(B, 2)
        t, idx = jax.block_until_ready(jax.jit(lambda: run())())
        t, idx = np.asarray(t), np.asarray(idx)
        inv = np.empty_like(B["ray_order"])
        inv[B["ray_order"]] = np.arange(len(inv))
        t, idx = t[inv], idx[inv]
        if ref is None:
            ref, ok = (t, idx), "ref"
        else:
            nt = int((t != ref[0]).sum())
            ni = int((idx != ref[1]).sum())
            ok = "OK" if nt == 0 and ni == 0 else f"MISMATCH t:{nt} idx:{ni}"
        print(f"  prod_g2: {kl._time_run(run):8.3f} ms device  [{ok}]")


if __name__ == "__main__":
    main()
