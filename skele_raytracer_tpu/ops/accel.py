"""Triangle-mesh acceleration: Morton-ordered clusters + AABB culling.

The reference scans every triangle for every ray (src/raytrace.h:170-187;
dragon.scn = 10,002 triangles, brute force). A pointer-chasing BVH is the
CPU answer; its divergent traversal is hostile to a TPU. The TPU-native
scheme keeps everything dense and batched:

1. Build (host, once per mesh): sort triangles along a Morton curve of
   their centroids, cut the order into fixed-size clusters of
   CLUSTER_SIZE triangles, and store one AABB per cluster. Morton order
   makes consecutive triangles spatially coherent, so cluster AABBs are
   tight.
2. Cull (device, per ray batch): slab-test every ray against every
   cluster AABB — an [R, C] computation with C ~ T/CLUSTER_SIZE (dragon:
   ~80 clusters), ~250x cheaper than [R, T].
3. Intersect: only clusters whose AABB the ray enters are scanned. In the
   jnp path this is a where-mask over the per-cluster scan; the Pallas
   path feeds the per-ray-tile cluster shortlist to the streaming
   triangle kernel.

All arrays stay fixed-shape; "traversal" is one dense mask. This is the
grid/BVH-style culling SURVEY.md §7 lists as new work vs the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

CLUSTER_SIZE = 256  # triangles per cluster for COHERENT batches.
# Dragon sweep with the in-kernel front-to-back slab pretest: 256 beats
# 128 for primary/shadow tiles (deep front-to-back shortlists; coarse
# clusters keep the iteration count low and the early exit effective).

FINE_CLUSTER_SIZE = 128  # triangles per cluster for INCOHERENT waves.
# The culled kernels' MXU cost is the TESTED triangle count =
# sum over tiles of ceil(shortlist/G)*G*cs, and the K=9 contraction pads
# 14x on the MXU, so wasted columns dominate. For footprint-sorted
# bounce/shadow waves (narrow shortlists, mean ~2.6 clusters/tile),
# halving the cluster barely widens shortlists (2.62 -> 2.88) while
# halving the group round-up waste: launch-isolated dragon bounce chunk
# 5.93 -> 4.70 ms (group_c=2), bitwise-identical results. Applied
# frame-wide it REGRESSES the coherent paths (clean shadows
# 0.18 -> 0.37 s), so scenes carry BOTH clusterings and the integrator
# routes each wave to the matching one (scene/types.py, geometry.py).


def _morton3(x: np.ndarray) -> np.ndarray:
    """30-bit Morton codes for points normalized to [0, 1)^3. x: [N, 3]."""
    q = np.clip((x * 1024.0), 0, 1023).astype(np.uint32)

    def spread(v):
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v

    return (
        (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    )


class ClusteredMesh(NamedTuple):
    """Triangles reordered into spatial clusters, plus cluster AABBs.

    v0/v1/v2/mask: [Tc, 3]/[Tc] — Morton-sorted, padded to a multiple of
    CLUSTER_SIZE (padding rows have mask 0).
    perm: [Tc] float32 — original triangle index per sorted row (for
    material lookup; padding rows point at 0). Stored as float so the
    Scene pytree stays all-inexact (jax.grad rejects integer leaves);
    indices are exact in f32 up to 2^24 triangles.
    aabb_lo/aabb_hi: [C, 3] cluster bounds (true triangles).
    aabb_lo_m/aabb_hi_m: [C, 3] MIRROR-EXTENDED bounds for parity mode:
    the reference's buggy triangle test (mirrored u, SURVEY quirk —
    src/raytrace.h:176-186 realization) accepts "hits" on the triangle
    reflected through v0, i.e. points OUTSIDE the true geometry's box,
    so any cull against the tight AABBs silently drops reference hits.
    These bounds additionally cover 2*v0 - v1 and 2*v0 - v2 (a superset
    of the mirrored acceptance region for either edge-parameter
    convention), keeping parity culling exact. Clean mode uses the tight
    boxes.
    """

    v0: jnp.ndarray
    v1: jnp.ndarray
    v2: jnp.ndarray
    mask: jnp.ndarray
    perm: jnp.ndarray
    aabb_lo: jnp.ndarray
    aabb_hi: jnp.ndarray
    aabb_lo_m: jnp.ndarray
    aabb_hi_m: jnp.ndarray
    # Prepacked culled-kernel cluster blocks (ops/pallas/culled
    # pack_cluster_blocks layout: k10 [C, 10, 4, cs] with kof + mask
    # folded, org [C, 1, cs] original indices). Built ONCE here: packing
    # inside the render's chunk loop cost ~0.3 ms/chunk in layout copies
    # of the 1.6 MB blocks (XLA re-materialized them per lax.map step).
    k10: jnp.ndarray = None
    org: jnp.ndarray = None

    def bounds(self, *, mirrored: bool):
        """(lo, hi) — mirror-extended when culling for the parity
        (reference_triangle_test) semantics, tight otherwise."""
        if mirrored:
            return self.aabb_lo_m, self.aabb_hi_m
        return self.aabb_lo, self.aabb_hi

    @property
    def n_clusters(self) -> int:
        return self.aabb_lo.shape[0]


def build_clusters(v0, v1, v2, mask, cluster_size: int = CLUSTER_SIZE) -> ClusteredMesh:
    """Host-side build: Morton sort + cluster AABBs. Inputs are the padded
    scene arrays ([T, 3] x3 + mask); padding rows sort to dedicated
    all-padding clusters (their AABBs are empty -> never hit)."""
    v0n, v1n, v2n = (np.asarray(v) for v in (v0, v1, v2))
    m = np.asarray(mask)
    real = m > 0
    cent = (v0n + v1n + v2n) / 3.0
    lo = cent[real].min(axis=0) if real.any() else np.zeros(3)
    hi = cent[real].max(axis=0) if real.any() else np.ones(3)
    span = np.maximum(hi - lo, 1e-9)
    codes = _morton3((cent - lo) / span)
    codes = np.where(real, codes, np.uint32(0xFFFFFFFF))  # padding sorts last
    order = np.argsort(codes, kind="stable").astype(np.int32)

    T = v0n.shape[0]
    tc = -(-T // cluster_size) * cluster_size
    pad = tc - T
    order_p = np.concatenate([order, np.zeros(pad, np.int32)])
    take = lambda a: np.concatenate([a[order], np.zeros((pad,) + a.shape[1:], a.dtype)])
    sv0, sv1, sv2 = take(v0n), take(v1n), take(v2n)
    sm = np.concatenate([m[order], np.zeros(pad, m.dtype)])

    C = tc // cluster_size
    cm = sm.reshape(C, cluster_size)
    empty = (cm > 0).sum(axis=1) == 0
    big = np.float32(3e38)

    def bounds_of(point_sets):
        k = len(point_sets)
        pts = np.stack(point_sets, axis=1).reshape(C, cluster_size * k, 3)
        wide = np.repeat(cm, k, axis=1)[..., None]  # [C, k*cs, 1]
        lo_c = np.where(wide > 0, pts, big).min(axis=1)
        hi_c = np.where(wide > 0, pts, -big).max(axis=1)
        lo_c[empty] = 1.0  # empty boxes: lo > hi -> slab test always misses
        hi_c[empty] = 0.0
        return lo_c.astype(np.float32), hi_c.astype(np.float32)

    lo_c, hi_c = bounds_of([sv0, sv1, sv2])
    # parity (mirrored-u) acceptance region: see ClusteredMesh docstring
    lo_m, hi_m = bounds_of(
        [sv0, sv1, sv2, 2.0 * sv0 - sv1, 2.0 * sv0 - sv2]
    )

    # Prepacked kernel blocks (see the field docstring). NumPy mirror of
    # intersect.pack_triangles + culled.pack_cluster_blocks.
    e1 = (sv1 - sv0).astype(np.float32)
    e2 = (sv2 - sv0).astype(np.float32)
    sv0f = sv0.astype(np.float32)
    Am = np.cross(e2, e1)
    Bm = np.cross(e2, sv0f)
    Cm = np.cross(sv0f, e1)
    Dm = np.cross(e1, e2)
    kof = np.sum(e2 * Cm, axis=1)
    Kp = np.zeros((10, 4, tc), np.float32)
    Kp[0:3, 0] = Am.T  # det      = d.A
    Kp[0:3, 1] = Bm.T  # u_num   += d.B
    Kp[3:6, 1] = -e2.T  #         -= w.e2
    Kp[0:3, 2] = -Cm.T  # v_num   -= d.C
    Kp[3:6, 2] = -e1.T  #         -= w.e1
    Kp[6:9, 3] = Dm.T  # t_num    = o.D
    Kp[9, 3] = -kof  # kof fold (against the constant 1.0 feature)
    k10 = Kp.reshape(10, 4, C, cluster_size).transpose(2, 0, 1, 3)
    k10 = k10 * (sm.reshape(C, 1, 1, cluster_size) > 0)  # mask fold
    org = order_p.astype(np.float32).reshape(C, 1, cluster_size)

    return ClusteredMesh(
        v0=jnp.asarray(sv0), v1=jnp.asarray(sv1), v2=jnp.asarray(sv2),
        mask=jnp.asarray(sm), perm=jnp.asarray(order_p, jnp.float32),
        aabb_lo=jnp.asarray(lo_c), aabb_hi=jnp.asarray(hi_c),
        aabb_lo_m=jnp.asarray(lo_m), aabb_hi_m=jnp.asarray(hi_m),
        k10=jnp.asarray(k10.astype(np.float32)), org=jnp.asarray(org),
    )


def ray_aabb_entry(o, d, lo, hi, *, t_clip: float = 0.0, allow_negative: bool = False):
    """([R, C] bool, [R, C] f32) — slab test + ENTRY distance per AABB.

    The entry value (slab tmin, in ray-parameter units) is a lower bound
    on the t of any intersection inside that box: the cluster-culled
    kernels sort each tile's shortlist by the tile-minimum entry
    (front-to-back) so the running nearest-t can prune whole clusters —
    classic BVH ordered traversal, amortized over the ray tile. Valid in
    parity mode too (negative tmin is still a lower bound on the accepted
    negative-t hits). Entry for non-entered boxes is undefined (gate with
    the mask).
    """
    # The 3-axis is UNROLLED into pairwise min/max instead of a
    # jnp.max/min(axis=2) over an [R, C, 3] broadcast: a reduce op cannot
    # fuse into the consumer's tile-min reduce, so the reduce form
    # materialized per-(ray, cluster) tmin/tmax arrays (42 MB each on a
    # dragon bounce wave, ~20% of the gillum16 frame in HBM traffic +
    # relayout copies). Pairwise max/min of three values is bitwise
    # identical to the axis reduce, and the fully elementwise chain lets
    # XLA collapse ray features -> slab test -> tile reduce into ONE
    # fusion that never materializes an [R, C] intermediate.
    tmin = tmax = None
    for a in range(3):
        d_a = d[:, a]
        inv_a = 1.0 / jnp.where(jnp.abs(d_a) > 1e-30, d_a, 1e-30)  # [R]
        t0 = (lo[None, :, a] - o[:, None, a]) * inv_a[:, None]  # [R, C]
        t1 = (hi[None, :, a] - o[:, None, a]) * inv_a[:, None]
        near, far = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        tmin = near if tmin is None else jnp.maximum(tmin, near)
        tmax = far if tmax is None else jnp.minimum(tmax, far)
    hit = tmin <= tmax
    if not allow_negative:
        hit = hit & (tmax > t_clip)
    return hit, tmin


def ray_aabb_mask(o, d, lo, hi, *, t_clip: float = 0.0, allow_negative: bool = False):
    """[R, C] bool — slab test: does ray (o, d) pass through each AABB?

    Unnormalized directions are fine (t in ray-parameter units, matching
    the rest of the tracer). `allow_negative` accepts boxes fully behind
    the origin (needed for parity mode, where negative-t triangle hits are
    accepted — SURVEY §2.9.10).
    """
    return ray_aabb_entry(
        o, d, lo, hi, t_clip=t_clip, allow_negative=allow_negative
    )[0]
