"""Whole-frame path-trace Pallas megakernel for small (non-mesh) scenes.

The headline benchmark (spheres2 1080p gillum16, the reference's timed
config — reference src/main.cpp:19-104 + src/raytrace.h:139-227) runs on
scenes whose primitive tables are tiny (~16 spheres, at most a few
decorative triangles), so the hot loop is pure per-ray arithmetic:
camera ray, unrolled nearest-primitive scans, Blinn-Phong shading, and
`num_paths` Monte-Carlo continuation rays per sample. Traced through XLA
(models/integrator.py) that frame decomposes into ~30 small ops per
`lax.map` chunk x 254 chunks; a device trace shows each op is
latency-bound (10-30 us for ~2 us of data) — the frame pays op dispatch,
not FLOPs.

This kernel is the TPU-native fix: ONE `pallas_call` renders the whole
frame. Each grid step takes a (SUB, 128) tile of flat sample ids and runs
ray-gen + counter-based threefry RNG + the unrolled sphere/triangle scans
+ shading (with in-register shadow scans) + the full Monte-Carlo bounce
loop entirely in VMEM/registers — zero HBM intermediates, zero
kernel-launch boundaries. The scene rides along as SMEM scalar tables (a
small scene is a few hundred scalars). Mesh-scale scenes keep the culled
streaming kernels (ops/pallas/culled.py); `use_pathtrace` draws the line.

Semantics are the wavefront integrator's exactly (models/integrator.py
`integrate_linear`, itself the re-design of reference src/raytrace.h:
139-227): same threefry2x32 streams bit-for-bit (ops/sampling.py), same
quadratic/root selection (src/utils.h:87-121), same triangle test incl.
parity's mirrored-u negative-t variant (src/utils.h:181-213) and
black-triangle shading (src/raytrace.h:221-224), same parity quirks
(unnormalized dirs, t<=1 clip, diagonal jitter, buggy tangent frame,
scalar epsilon offsets) or clean-mode replacements, same light loops
(src/blinn_phong.h). The only numeric deviations are mul-by-reciprocal
vs divide rounding (1 ulp) in t and transcendental lowering differences —
tests/test_pathtrace.py pins the jnp path to float tolerance.

Differentiation: `pathtrace_ids` is a custom_vjp. Under differentiation
the kernel additionally emits one packed int32 hit record per (sample,
bounce) — primitive index, hit bit, triangle bit, per-light unshadowed
bits — and the backward is a SECOND Pallas kernel: per tile it replays
shading from those records (nearest-hit scans collapse to the selected
primitive's O(1) t, occlusion scans to record-bit gates) under jax.grad
wrt the scene's scalar tables, accumulating the table cotangents across
the sequential grid; jax.vjp of the table packing maps them back onto
scene leaves. The backward reuses the forward's intersection structure
and never leaves VMEM — fwd+bwd measures 1.31x the forward alone at the
1080p gillum16 headline (0.046 vs 0.035 s/frame). The differentiable jnp
replay (`_replay_radiance`) remains as the independent oracle the tests
pin the kernel gradients to.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skele_raytracer_tpu.config import (
    CLEAN_T_EPS,
    INDIRECT_ORIGIN_EPS,
    SHADOW_ORIGIN_EPS,
    RenderConfig,
)
from skele_raytracer_tpu.ops.pallas.intersect import _BIG, _interpret
from skele_raytracer_tpu.ops.sampling import (
    _GOLDEN,
    PURPOSE_FOG,
    PURPOSE_JITTER,
    PURPOSE_PATH,
    bits_to_unit,
    threefry2x32,
)

# Samples per grid step: (TILE_SUB, 128) planes. 4096 f32 samples/tile
# keeps ~40 live per-ray planes under 1 MB of VMEM while amortizing grid
# overhead over 500+ tiles at 1080p.
TILE_SUB = 32
TILE = TILE_SUB * 128

_TWO_PI = np.float32(2.0 * np.pi)
_PI = np.float32(np.pi)

# Paths are unrolled (straight-line code, maximal ILP) up to this count;
# beyond it a fori_loop bounds compile time.
_UNROLL_PATHS = 32

# Unrolled-scan budgets: every sphere costs ~25 VPU ops per ray per scan
# and every triangle ~45; past _UNROLL_SPHERES the unrolled scan's live
# set blows Mosaic's 16 MB scoped-VMEM stack (measured: 30 MB at S=128),
# so larger sphere tables run the scan/gather/occlusion as fori_loops
# over dynamic SMEM scalar reads — same math, constant code size, tiny
# live set. Loop mode is forward-only: _can_replay rejects S >
# _UNROLL_SPHERES, so gradients re-derive through the jnp wavefront
# (identical estimator). MAX_TRIS keeps mesh-scale scenes on the culled
# kernels.
_UNROLL_SPHERES = 64
MAX_SPHERES = 256
MAX_TRIS = 32


MAX_FOG = 2  # fog volumes the kernel shades in-register (per volume:
# 8 threefry draws + the two rerouted per-light fog terms, per ray
# bounce — spheres2's single volume is the benchmarked case)


def use_pathtrace(scene, cfg: RenderConfig) -> bool:
    """True when this kernel serves the config: pallas backend, a small
    scene (spheres + at most MAX_TRIS decorative triangles — mesh scenes
    stream through the culled kernels instead), linear (MC/parity)
    integrator; value-bearing fog is shaded in-kernel up to MAX_FOG
    volumes (src/blinn_phong.h:56-66 rerouting)."""
    return (
        cfg.backend == "pallas"
        and (scene.has_spheres or scene.has_triangles)
        and not (scene.has_triangles
                 and scene.triangles.mask.shape[0] > MAX_TRIS)
        and (not (scene.has_fog and not scene.fog_zeroed)
             or scene.fog.mask.shape[0] <= MAX_FOG)
        and (cfg.monte_carlo or cfg.quirks.disable_reflections)
        and scene.spheres.mask.shape[0] <= MAX_SPHERES
        and cfg.max_depth >= 1
    )


def _draw2(seed, bounce, purpose: int, ids, pair_idx: int):
    """TWO U[0,1) planes from ONE threefry2x32 call: draws (2*pair_idx,
    2*pair_idx + 1) of the (seed, bounce, purpose) stream — bit-identical
    to ops/sampling.uniform's word mapping (draw i = word i%2 of counter
    i//2). The generator is ~130 VPU ops; consuming both output words
    halves its cost, which dominates the fog reroute (8 draws per
    (light, fog) per bounce)."""
    k1 = (jnp.asarray(bounce, jnp.uint32) * _GOLDEN
          + np.uint32(purpose)) if not isinstance(bounce, int) else np.uint32(
              (int(bounce) * int(_GOLDEN) + int(purpose)) & 0xFFFFFFFF)
    y0, y1 = threefry2x32(seed, k1, ids, jnp.uint32(pair_idx))

    # bits_to_unit with the u32 -> f32 cast routed through int32 (Mosaic
    # has no direct u32 cast; the top-24-bit value fits int32 exactly).
    def conv(y):
        return (y >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
            np.float32(2**-24)
        )

    return conv(y0), conv(y1)


def _draw(seed, bounce: int, purpose: int, ids, draw_idx: int):
    """One U[0,1) plane (word draw_idx % 2 of pair draw_idx // 2); prefer
    _draw2 when both words of a pair are consumed."""
    return _draw2(seed, bounce, purpose, ids, draw_idx // 2)[draw_idx % 2]


def _normalize3(vx, vy, vz):
    """geometry.normalize on component planes (zero maps to zero)."""
    n2 = vx * vx + vy * vy + vz * vz
    pos = n2 > 0
    nn = jnp.sqrt(jnp.where(pos, n2, 1.0)) * pos
    inv = jnp.where(nn > 0, 1.0 / jnp.where(nn > 0, nn, 1.0), 0.0)
    return vx * inv, vy * inv, vz * inv, nn


def _scan_spheres(o, d, sph, t_clip: float, rows=None):
    """Nearest-sphere scan on component planes.

    o: 3-tuple of planes OR scalars (primary rays share one origin).
    d: 3-tuple of planes. sph: list of (cx, cy, cz, r2, msk) scalars.
    Implements geometry.ray_sphere_all + first-wins argmin
    (src/utils.h:87-121, src/raytrace.h:152-166) with comparisons done on
    the numerator -b - sqrt(disc) (the shared denominator 2a > 0 preserves
    order); t materializes once as num * (0.5/a).
    Returns (hit bool, t, idx int32, a) — plus the gathered `rows` when
    given.

    rows: optional per-sphere material scalars (list over spheres of
    per-column lists). When given, the winner's row is gathered INSIDE
    the argmin update — one select per column per sphere — instead of a
    separate one-hot `_gather` pass (compare + convert + per-column
    multiply-add per sphere) over the same table. Bit-identical: misses
    keep row 0 exactly like _gather's bidx-init-0 convention, and a
    select chain resolves to the same row the one-hot sum would. Saves
    ~40% of the per-(ray,sphere) VPU ops at the lights-off headline
    (16 spheres x 6-9 columns).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    a = dx * dx + dy * dy + dz * dz
    a4 = 4.0 * a
    clipnum = (2.0 * t_clip) * a
    best = jnp.full(dx.shape, _BIG, jnp.float32)
    bidx = jnp.zeros(dx.shape, jnp.int32)
    mats = None
    if rows is not None:
        zero = jnp.zeros(dx.shape, jnp.float32)
        mats = [zero + v for v in rows[0]]
    for s, (cx, cy, cz, r2, msk) in enumerate(sph):
        ex, ey, ez = ox - cx, oy - cy, oz - cz
        b = 2.0 * (dx * ex + dy * ey + dz * ez)
        c = ex * ex + ey * ey + ez * ez - r2
        disc = b * b - a4 * c
        pos = disc > 0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
        num = -b - sq
        valid = (disc >= 0) & (num > clipnum) & (msk > 0)
        upd = valid & (num < best)
        best = jnp.where(upd, num, best)
        bidx = jnp.where(upd, s, bidx)
        if rows is not None and s > 0:
            mats = [jnp.where(upd, v, m) for v, m in zip(rows[s], mats)]
    hit = best < _BIG
    inv2a = 0.5 / a
    t = best * inv2a
    if rows is not None:
        return hit, t, bidx, a, mats
    return hit, t, bidx, a


def _gather(bidx, rows, valid=None):
    """Select per-primitive scalars by the scan's winning index: for each
    column, sum_s (bidx == s) * value[s]. rows: list over primitives of
    per-column scalars. Misses gathered row 0 (bidx init 0), matching
    the jnp argmin-of-all-inf convention; `valid` optionally gates whole
    rays (the jnp one_hot_rows valid mask)."""
    if not rows:
        return []
    n_cols = len(rows[0])
    outs = [None] * n_cols
    for s, vals in enumerate(rows):
        m = bidx == s
        if valid is not None:
            m = m & valid
        m = m.astype(jnp.float32)
        for c in range(n_cols):
            term = m * vals[c]
            outs[c] = term if outs[c] is None else outs[c] + term
    return outs


def _scan_spheres_loop(o, d, sph_ref, S: int, t_clip: float):
    """_scan_spheres as a fori_loop over dynamic SMEM scalar reads (the
    S > _UNROLL_SPHERES regime; see the budget comment above). Same
    numerator-space math and first-wins tie behavior; no fused material
    rows (use _gather_loop on the winner)."""
    ox, oy, oz = o
    dx, dy, dz = d
    a = dx * dx + dy * dy + dz * dz
    a4 = 4.0 * a
    clipnum = (2.0 * t_clip) * a

    def body(sid, carry):
        best, bidx = carry
        cx, cy, cz = sph_ref[sid, 0], sph_ref[sid, 1], sph_ref[sid, 2]
        r2, msk = sph_ref[sid, 3], sph_ref[sid, 4]
        ex, ey, ez = ox - cx, oy - cy, oz - cz
        b = 2.0 * (dx * ex + dy * ey + dz * ez)
        c = ex * ex + ey * ey + ez * ez - r2
        disc = b * b - a4 * c
        pos = disc > 0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
        num = -b - sq
        valid = (disc >= 0) & (num > clipnum) & (msk > 0)
        upd = valid & (num < best)
        return (jnp.where(upd, num, best),
                jnp.where(upd, sid, bidx))

    best, bidx = jax.lax.fori_loop(
        0, S,
        body,
        (jnp.full(dx.shape, _BIG, jnp.float32),
         jnp.zeros(dx.shape, jnp.int32)),
    )
    hit = best < _BIG
    t = best * (0.5 / a)
    return hit, t, bidx, a


def _gather_loop(bidx, ref, cols, S: int, valid=None):
    """_gather as a fori_loop: per column, sum_s (bidx == s) * ref[s, c]
    with dynamic SMEM reads. cols are static column indices."""
    z = jnp.zeros(bidx.shape, jnp.float32)

    def body(sid, outs):
        m = bidx == sid
        if valid is not None:
            m = m & valid
        mf = m.astype(jnp.float32)
        return tuple(o + mf * ref[sid, c] for o, c in zip(outs, cols))

    return list(jax.lax.fori_loop(0, S, body, tuple(z for _ in cols)))


def _occluded_loop(origin, direction, sph_ref, S: int, t_clip: float, bound):
    """_occluded's sphere part as a fori_loop (loop-mode shadows)."""
    ox, oy, oz = origin
    dx, dy, dz = direction
    a = dx * dx + dy * dy + dz * dz
    a = jnp.where(a > 0, a, 1.0)
    a4 = 4.0 * a
    clipnum = (2.0 * t_clip) * a
    inv2a = 0.5 / a

    def body(sid, occ):
        cx, cy, cz = sph_ref[sid, 0], sph_ref[sid, 1], sph_ref[sid, 2]
        r2, msk = sph_ref[sid, 3], sph_ref[sid, 4]
        ex, ey, ez = ox - cx, oy - cy, oz - cz
        b = 2.0 * (dx * ex + dy * ey + dz * ez)
        c = ex * ex + ey * ey + ez * ez - r2
        disc = b * b - a4 * c
        pos = disc > 0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
        num = -b - sq
        valid = (disc >= 0) & (num > clipnum) & (msk > 0)
        if bound is not None:
            valid = valid & (num * inv2a < bound)
        # f32 carry: Mosaic cannot legalize scf.for with vector<i1> carries
        return jnp.maximum(occ, valid.astype(jnp.float32))

    occ_f = jax.lax.fori_loop(0, S, body,
                              jnp.zeros(dx.shape, jnp.float32))
    return occ_f > 0.5


def _tri_test(o, d, tri, ref_test: bool):
    """Möller-Trumbore on component planes against ONE triangle's scalars
    (geometry.ray_triangle_all semantics: parity keeps the sign-flipped u
    and accepts negative t, src/utils.h:181-213; clean is standard MT
    with t > CLEAN_T_EPS). Returns (valid, t)."""
    from skele_raytracer_tpu.config import TRIANGLE_DET_EPS

    ox, oy, oz = o
    dx, dy, dz = d
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, msk) = tri
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= TRIANGLE_DET_EPS
    inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u_dot = tvx * px + tvy * py + tvz * pz
    u = (-u_dot if ref_test else u_dot) * inv
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    valid = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (msk > 0)
    if not ref_test:
        valid = valid & (t > CLEAN_T_EPS)
    return valid, t


def _scan_tris(o, d, tris, ref_test: bool):
    """Nearest-triangle scan on component planes (first-wins argmin over
    t with invalid -> +BIG; parity's negative-t hits sort first exactly
    as the reference's strict-< scan, src/raytrace.h:176-186)."""
    best = jnp.full(d[0].shape, _BIG, jnp.float32)
    bidx = jnp.zeros(d[0].shape, jnp.int32)
    for s, tri in enumerate(tris):
        valid, t = _tri_test(o, d, tri, ref_test)
        upd = valid & (t < best)
        best = jnp.where(upd, t, best)
        bidx = jnp.where(upd, s, bidx)
    return best < _BIG, best, bidx


def _occluded(origin, direction, sph, t_clip: float, bound,
              tris=(), ref_test: bool = False):
    """Any-sphere (+ any-triangle in clean mode) occlusion scan
    (reference shadow(), src/utils.h:42-76): parity is unbounded
    (occluders beyond the light still occlude) and sphere-only; clean
    bounds by the light distance and lets triangles occlude.
    origin/direction: component planes."""
    ox, oy, oz = origin
    dx, dy, dz = direction
    a = dx * dx + dy * dy + dz * dz
    a = jnp.where(a > 0, a, 1.0)  # zero-length dirs (dead rays) never hit
    a4 = 4.0 * a
    clipnum = (2.0 * t_clip) * a
    inv2a = 0.5 / a
    occ = jnp.zeros(dx.shape, bool)
    for cx, cy, cz, r2, msk in sph:
        ex, ey, ez = ox - cx, oy - cy, oz - cz
        b = 2.0 * (dx * ex + dy * ey + dz * ez)
        c = ex * ex + ey * ey + ez * ez - r2
        disc = b * b - a4 * c
        pos = disc > 0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
        num = -b - sq
        valid = (disc >= 0) & (num > clipnum) & (msk > 0)
        if bound is not None:
            valid = valid & (num * inv2a < bound)
        occ = occ | valid
    for tri in tris:
        valid, t = _tri_test(origin, direction, tri[:10], ref_test)
        if bound is not None:
            valid = valid & (t < bound)
        occ = occ | valid
    return occ


def _tangent_frame(nx, ny, nz):
    """sampling.tangent_frame on planes (src/utils.h:148-165)."""
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    zero = jnp.zeros_like(nx)
    pnx = jnp.where(use_x, nz * inv_a, zero)
    pny = jnp.where(use_x, zero, -nz * inv_b)
    pnz = jnp.where(use_x, -nx * inv_a, ny * inv_b)
    # perp_to_both = cross(normal, perp_to_normal)
    pbx = ny * pnz - nz * pny
    pby = nz * pnx - nx * pnz
    pbz = nx * pny - ny * pnx
    return (pnx, pny, pnz), (pbx, pby, pbz)


def _build_frame_math(
    *,
    S: int,
    T: int,
    L: int,
    LD: int,
    sph_on: bool,
    tri_on: bool,
    point_on: bool,
    dir_on: bool,
    use_shadows: bool,
    mc: bool,
    P: int,
    D: int,
    grid: int,
    width: int,
    height: int,
    angle: float,
    quirks,
    F: int = 0,
    emit_records: bool = False,
    replay: bool = False,
):
    """Close the static render configuration over the per-tile frame math
    and return `frame_math(tabs, planes, seed, recs_in) -> (r, g, b,
    recs_out)`.

    The SAME math serves two kernels:

    - FORWARD (replay=False): nearest hits come from the unrolled
      primitive scans and shadows from in-register occlusion scans. With
      emit_records, additionally return one packed int32 hit record per
      (sample, bounce) — bits 0:8 primitive index, bit 8 hit flag, bit 9
      triangle-won flag, bits 10+ per-light unshadowed flags (point
      lights first, then directional, both at padded table positions).
      Requires the unrolled path loop (record slots are static indices).

    - BACKWARD REPLAY (replay=True): `recs_in` supplies the saved
      records; every nearest-hit scan collapses to the SELECTED
      primitive's O(1) t (gathered quadratic / Möller-Trumbore) and every
      occlusion scan to a record-bit gate. The backward kernel calls
      jax.grad over this function wrt the scalar tables — the analytic
      in-kernel gradient that reuses the forward's intersection structure
      (tests pin it to the jnp replay path's gradients).

    `tabs` entries are indexed [row, col] — SMEM refs in the forward
    kernel, traced jnp arrays under the backward kernel's jax.grad.
    """
    aspect = width / float(height)
    inv_w, inv_h = 1.0 / width, 1.0 / height
    t_clip = 1.0 if quirks.near_clip_t_le_1 else CLEAN_T_EPS
    clean_offsets = not quirks.scalar_epsilon_offset
    shadow_bound = not quirks.near_clip_t_le_1  # clean bounds point lights

    def read3(ref, row, col0):
        return ref[row, col0], ref[row, col0 + 1], ref[row, col0 + 2]

    ref_test = quirks.reference_triangle_test
    tri_black = quirks.triangles_shade_black
    shadow_tris = tri_on and not quirks.sphere_only_shadows
    assert not (emit_records and replay)
    # Loop mode for big sphere tables (see the _UNROLL_SPHERES comment):
    # forward-only — _can_replay rejects it, so records/replay never
    # reach here with a loop-mode S.
    loop_spheres = sph_on and S > _UNROLL_SPHERES
    assert not (loop_spheres and (emit_records or replay))
    n_rec = 1 + (P * (D - 1) if (mc and D > 1) else 0)

    def frame_math(tabs, planes, seed, recs_in=None):
        sph_ref, tri_ref, misc_ref, pl_ref, dl_ref = tabs
        ids, xs, ys, cj, ci = planes
        recs_out = [None] * n_rec

        cam = read3(misc_ref, 0, 0)
        right = read3(misc_ref, 0, 3)
        up = read3(misc_ref, 0, 6)
        cdir = read3(misc_ref, 0, 9)
        amb_s = read3(misc_ref, 0, 12)
        bg = read3(misc_ref, 0, 15)

        # Scene tables -> python lists of traced scalars (hoisted: read
        # once per grid step, reused by every scan/shade below).
        sph = [
            (sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2], sph_ref[s, 3],
             sph_ref[s, 4])
            for s in range(S)
        ] if sph_on and not loop_spheres else []
        # material columns: ambient(5:8) diffuse(8:11) specular(11:14)
        # power(14). Specular/power are gathered only when a light loop
        # will consume them, and the hit center (-> normal) only when the
        # bounce needs geometry — the final bounce of a lights-off MC
        # frame (the headline config) gathers just 6 columns.
        lights_on = point_on or dir_on
        shade_cols = list(range(5, 11)) + (
            list(range(11, 15)) if lights_on else []
        )
        n_sc = len(shade_cols)
        full_rows = [
            [sph_ref[s, c] for c in shade_cols] + [sph_ref[s, 0],
                                                   sph_ref[s, 1],
                                                   sph_ref[s, 2]]
            for s in range(S)
        ] if not loop_spheres else None
        shade_rows = ([row[:n_sc] for row in full_rows]
                      if full_rows is not None else None)

        # Triangle tables (tri_tab layout: v0 0:3, e1 3:6, e2 6:9, mask 9,
        # unit normal 10:13, ambient 13:16, diffuse 16:19, specular 19:22,
        # power 22).
        tris_geo = [
            tuple(tri_ref[t, c] for c in range(10)) for t in range(T)
        ] if tri_on else []
        tri_norm_rows = [
            [tri_ref[t, 10], tri_ref[t, 11], tri_ref[t, 12]]
            for t in range(T)
        ]
        tri_shade_cols = list(range(13, 19)) + (
            list(range(19, 23)) if lights_on else []
        )
        tri_mat_rows = [
            [tri_ref[t, c] for c in tri_shade_cols] for t in range(T)
        ]

        def unpack(m):
            amb, dif = m[0:3], m[3:6]
            if lights_on:
                return amb, dif, m[6:9], m[9]
            return amb, dif, None, None
        plights = [
            (pl_ref[l, 0], pl_ref[l, 1], pl_ref[l, 2], pl_ref[l, 3],
             pl_ref[l, 4], pl_ref[l, 5], pl_ref[l, 6])
            for l in range(L)
        ] if point_on else []
        dlights = [
            (dl_ref[l, 0], dl_ref[l, 1], dl_ref[l, 2], dl_ref[l, 3],
             dl_ref[l, 4], dl_ref[l, 5], dl_ref[l, 6])
            for l in range(LD)
        ] if dir_on else []
        # fog volumes (misc rows 1..F): radius, absorption, scattering,
        # albedo rgb, mask — _pack_tables layout
        fogs = [
            (misc_ref[1 + f, 0], misc_ref[1 + f, 1], misc_ref[1 + f, 2],
             misc_ref[1 + f, 3], misc_ref[1 + f, 4], misc_ref[1 + f, 5],
             misc_ref[1 + f, 6])
            for f in range(F)
        ]

        def shade(x, n, amb, dif, spec, powr, pc=None, idp=None, bounce=0,
                  rec=None):
            """direct_illumination (ops/shading.py) on planes: ambient +
            per-light Blinn-Phong with optional shadow scans (forward) or
            record-bit shadow gates (replay). Also returns the packed
            per-light unshadowed bits (or None)."""
            dr = amb_s[0] * amb[0]
            dg = amb_s[1] * amb[1]
            db = amb_s[2] * amb[2]
            bits = None
            if not (plights or dlights):
                return dr, dg, db, bits
            # view vector from the CAMERA position (src/blinn_phong.h:93)
            vx, vy, vz, _ = _normalize3(cam[0] - x[0], cam[1] - x[1],
                                        cam[2] - x[2])
            if use_shadows and not replay:
                if clean_offsets:
                    # offset_origin(x, n): scale grows with |x| (shared by
                    # every light's shadow ray; hoisted)
                    xn = jnp.sqrt(jnp.maximum(
                        x[0] * x[0] + x[1] * x[1] + x[2] * x[2], 0.0))
                    sc = CLEAN_T_EPS * (1.0 + xn)
                    sh_o = (x[0] + sc * n[0], x[1] + sc * n[1],
                            x[2] + sc * n[2])
                else:
                    sh_o = (x[0] + SHADOW_ORIGIN_EPS,
                            x[1] + SHADOW_ORIGIN_EPS,
                            x[2] + SHADOW_ORIGIN_EPS)
            for li, (lx, ly, lz, cr, cg, cb, lm) in enumerate(plights):
                lvx, lvy, lvz = lx - x[0], ly - x[1], lz - x[2]
                d2 = lvx * lvx + lvy * lvy + lvz * lvz
                pos = d2 > 0
                d_l = jnp.sqrt(jnp.where(pos, d2, 1.0)) * pos
                inv_dl = 1.0 / jnp.maximum(d_l, 1e-30)
                ldx, ldy, ldz = lvx * inv_dl, lvy * inv_dl, lvz * inv_dl
                if use_shadows and replay:
                    # unshadowed bit saved by the forward kernel
                    gate = lm * ((rec >> (10 + li)) & 1).astype(jnp.float32)
                elif use_shadows:
                    sdx, sdy, sdz, _ = _normalize3(lvx, lvy, lvz)
                    if loop_spheres:
                        occ = _occluded_loop(
                            sh_o, (sdx, sdy, sdz), sph_ref, S, t_clip,
                            d_l if shadow_bound else None)
                        if shadow_tris:
                            occ = occ | _occluded(
                                sh_o, (sdx, sdy, sdz), [], t_clip,
                                d_l if shadow_bound else None,
                                tris=tris_geo, ref_test=ref_test)
                    else:
                        occ = _occluded(sh_o, (sdx, sdy, sdz), sph, t_clip,
                                        d_l if shadow_bound else None,
                                        tris=tris_geo if shadow_tris else (),
                                        ref_test=ref_test)
                    unsh = (~occ).astype(jnp.int32)
                    gate = lm * unsh.astype(jnp.float32)
                    if emit_records:
                        b_l = unsh << (10 + li)
                        bits = b_l if bits is None else bits | b_l
                else:
                    gate = lm * jnp.ones_like(d_l)
                intensity = 1.0 / jnp.maximum(d_l * d_l, 1e-30)
                ndotl = jnp.maximum(0.0, n[0] * ldx + n[1] * ldy + n[2] * ldz)
                if F > 0:
                    # Fog reroute (shading._fog_term on planes): BOTH the
                    # diffuse and the specular per-light terms become fog
                    # terms with independent draws — the sampling.uniform
                    # (L, F, 4, 2) stream, C-order flat draw indices.
                    # Gate (mask * unshadowed) still applies; 1/d^2 and
                    # ndotl live INSIDE the interaction branch.
                    diff_base = intensity * ndotl
                    fr = jnp.zeros_like(d_l)
                    fg_ = jnp.zeros_like(d_l)
                    fb = jnp.zeros_like(d_l)
                    for fi, (rad, absn, scat, alr, alg, alb_, mf) in (
                            enumerate(fogs)):
                        dcx = pc[0] - lx
                        dcy = pc[1] - ly
                        dcz = pc[2] - lz
                        dist = jnp.sqrt(jnp.maximum(
                            dcx * dcx + dcy * dcy + dcz * dcz, 0.0))
                        dist = jnp.minimum(dist, 2.0 * rad)
                        p_no = jnp.exp(-dist * (absn + scat))
                        # the (L, F, 4, 2) stream: draw ((lf*4+k)*2 +
                        # term) = word `term` of pair (lf*4 + k) — the
                        # two diffuse/specular reroute terms of each
                        # offset k share ONE threefry call (_draw2).
                        base_p = (li * F + fi) * 4
                        pairs = [
                            _draw2(seed, bounce, PURPOSE_FOG, idp,
                                   base_p + k)
                            for k in range(4)
                        ]
                        for term in (0, 1):
                            u0 = pairs[0][term]
                            interacts = u0 > p_no
                            u1 = pairs[1][term]
                            u2 = pairs[2][term]
                            u3 = pairs[3][term]
                            nlx = ldx + scat * (u1 * 2.0 - 1.0)
                            nly = ldy + scat * (u2 * 2.0 - 1.0)
                            nlz = ldz + scat * (u3 * 2.0 - 1.0)
                            ndotl2 = jnp.maximum(
                                0.0, n[0] * nlx + n[1] * nly + n[2] * nlz)
                            fr += jnp.where(interacts, dif[0] * diff_base,
                                            alr * ndotl2) * mf
                            fg_ += jnp.where(interacts, dif[1] * diff_base,
                                             alg * ndotl2) * mf
                            fb += jnp.where(interacts, dif[2] * diff_base,
                                            alb_ * ndotl2) * mf
                    dr += cr * fr * gate
                    dg += cg * fg_ * gate
                    db += cb * fb * gate
                    continue
                hx, hy, hz = vx + ldx, vy + ldy, vz + ldz
                h2 = hx * hx + hy * hy + hz * hz
                hpos = h2 > 0
                hn = jnp.maximum(jnp.sqrt(jnp.where(hpos, h2, 1.0)) * hpos,
                                 1e-30)
                ihn = 1.0 / hn
                ndoth = jnp.maximum(
                    0.0, n[0] * hx * ihn + n[1] * hy * ihn + n[2] * hz * ihn)
                spow = jnp.power(jnp.maximum(ndoth, 1e-30), powr) * (ndoth > 0)
                gi = gate * intensity
                dr += (dif[0] * cr * ndotl + spec[0] * cr * spow) * gi
                dg += (dif[1] * cg * ndotl + spec[1] * cg * spow) * gi
                db += (dif[2] * cb * ndotl + spec[2] * cb * spow) * gi
            for li, (ldx0, ldy0, ldz0, cr, cg, cb, lm) in enumerate(dlights):
                ldx = jnp.broadcast_to(ldx0, x[0].shape)
                ldy = jnp.broadcast_to(ldy0, x[0].shape)
                ldz = jnp.broadcast_to(ldz0, x[0].shape)
                if use_shadows and replay:
                    gate = lm * ((rec >> (10 + L + li)) & 1).astype(
                        jnp.float32)
                elif use_shadows:
                    if loop_spheres:
                        occ = _occluded_loop(
                            sh_o, (ldx, ldy, ldz), sph_ref, S, t_clip, None)
                        if shadow_tris:
                            occ = occ | _occluded(
                                sh_o, (ldx, ldy, ldz), [], t_clip, None,
                                tris=tris_geo, ref_test=ref_test)
                    else:
                        occ = _occluded(sh_o, (ldx, ldy, ldz), sph, t_clip,
                                        None,
                                        tris=tris_geo if shadow_tris else (),
                                        ref_test=ref_test)
                    unsh = (~occ).astype(jnp.int32)
                    gate = lm * unsh.astype(jnp.float32)
                    if emit_records:
                        b_l = unsh << (10 + L + li)
                        bits = b_l if bits is None else bits | b_l
                else:
                    gate = lm * jnp.ones_like(x[0])
                ndotl = jnp.maximum(0.0, n[0] * ldx + n[1] * ldy + n[2] * ldz)
                hx, hy, hz = vx + ldx, vy + ldy, vz + ldz
                h2 = hx * hx + hy * hy + hz * hz
                hpos = h2 > 0
                hn = jnp.maximum(jnp.sqrt(jnp.where(hpos, h2, 1.0)) * hpos,
                                 1e-30)
                ihn = 1.0 / hn
                ndoth = jnp.maximum(
                    0.0, n[0] * hx * ihn + n[1] * hy * ihn + n[2] * hz * ihn)
                spow = jnp.power(jnp.maximum(ndoth, 1e-30), powr) * (ndoth > 0)
                dr += (dif[0] * cr * ndotl + spec[0] * cr * spow) * gate
                dg += (dif[1] * cg * ndotl + spec[1] * cg * spow) * gate
                db += (dif[2] * cb * ndotl + spec[2] * cb * spow) * gate
            return dr, dg, db, bits

        def pack_rec(idx, hit, tri_wins, bits):
            rec = idx | (hit.astype(jnp.int32) << 8)
            if tri_wins is not None:
                rec = rec | (tri_wins.astype(jnp.int32) << 9)
            if bits is not None:
                rec = rec | bits
            return rec

        def nearest(slot, o3, d3, rows=None):
            """Combined nearest hit. Forward: geometry.intersect semantics
            (sphere scan, triangle scan, triangle wins on strictly smaller
            t). Replay: the saved record names the winner; only ITS t is
            recomputed — the selected sphere's quadratic / the selected
            triangle's Möller-Trumbore, O(1) per ray, differentiable wrt
            the primitive (the jnp replay's replay_hit, on planes).
            Returns (hit_any, tri_wins|None, t, idx, shadesf, missf,
            mats|None) — mats is the winner's material row when `rows`
            is given and the sphere-only fused-gather scan applies
            (_scan_spheres rows docstring)."""
            if replay:
                rec = recs_in[slot]
                hit_any = ((rec >> 8) & 1) > 0
                idx = rec & 0xFF
                dxp, dyp, dzp = d3
                if tri_on:
                    tri_wins = ((rec >> 9) & 1) > 0
                    sph_sel = hit_any & ~tri_wins
                else:
                    tri_wins = None
                    sph_sel = hit_any
                if sph:
                    cx, cy, cz, r2 = _gather(
                        idx, [[s_[0], s_[1], s_[2], s_[3]] for s_ in sph],
                        valid=sph_sel)
                    ox, oy, oz = o3
                    a = dxp * dxp + dyp * dyp + dzp * dzp
                    a = jnp.where(a > 0, a, 1.0)  # dead rays never hit
                    ex, ey, ez = ox - cx, oy - cy, oz - cz
                    b = 2.0 * (dxp * ex + dyp * ey + dzp * ez)
                    c = ex * ex + ey * ey + ez * ez - r2
                    disc = b * b - 4.0 * a * c
                    pos = disc > 0
                    sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos
                    t_sph = (-b - sq) * (0.5 / a)
                else:
                    t_sph = jnp.zeros(rec.shape, jnp.float32)
                if tri_on:
                    tri9 = _gather(
                        idx, [list(tg[:9]) for tg in tris_geo],
                        valid=tri_wins)
                    one = jnp.ones(rec.shape, jnp.float32)
                    _, t_tri = _tri_test(o3, d3, tuple(tri9) + (one,),
                                         ref_test)
                    t_sel = jnp.where(tri_wins, t_tri,
                                      jnp.where(sph_sel, t_sph, 0.0))
                else:
                    t_sel = jnp.where(hit_any, t_sph, 0.0)
                shades = sph_sel if (tri_on and tri_black) else hit_any
                return (hit_any, tri_wins, t_sel, idx,
                        shades.astype(jnp.float32),
                        1.0 - hit_any.astype(jnp.float32), None)
            mats = None
            if loop_spheres:
                s_hit, s_t, s_idx, _ = _scan_spheres_loop(
                    o3, d3, sph_ref, S, t_clip)
            elif sph:
                if rows is not None and not tri_on:
                    s_hit, s_t, s_idx, _, mats = _scan_spheres(
                        o3, d3, sph, t_clip, rows=rows)
                else:
                    s_hit, s_t, s_idx, _ = _scan_spheres(o3, d3, sph, t_clip)
            else:
                s_hit = jnp.zeros(d3[0].shape, bool)
                s_t = jnp.full(d3[0].shape, _BIG, jnp.float32)
                s_idx = jnp.zeros(d3[0].shape, jnp.int32)
            if tri_on:
                t_hit, t_t, t_idx = _scan_tris(o3, d3, tris_geo, ref_test)
                tri_wins = t_hit & (t_t < jnp.where(s_hit, s_t, _BIG))
                hit_any = s_hit | tri_wins
                t_sel = jnp.where(tri_wins, t_t, s_t)
                idx = jnp.where(tri_wins, t_idx, s_idx)
                # parity shades only spheres (triangles black,
                # src/raytrace.h:221-224); clean shades both kinds
                shades = (s_hit & ~tri_wins) if tri_black else hit_any
            else:
                tri_wins = None
                hit_any, t_sel, idx, shades = s_hit, s_t, s_idx, s_hit
            return (hit_any, tri_wins, t_sel, idx,
                    shades.astype(jnp.float32),
                    1.0 - hit_any.astype(jnp.float32), mats)

        def gather_mat(idx, tri_wins, need_geo):
            """Material (+ sphere center when need_geo) at the winning
            primitive — mirrors shading.gather_material: parity reads the
            sphere table unconditionally at the combined index; clean
            sums kind-gated sphere and triangle selections."""
            if loop_spheres:
                cols = shade_cols + ([0, 1, 2] if need_geo else [])
                if not tri_on or tri_black:
                    return _gather_loop(idx, sph_ref, cols, S)
                m = _gather_loop(idx, sph_ref, cols, S, valid=~tri_wins)
                mt = _gather(idx, tri_mat_rows, valid=tri_wins)
                return [a + b for a, b in zip(m[:n_sc], mt)] + m[n_sc:]
            rows = full_rows if need_geo else shade_rows
            if not tri_on or tri_black:
                m = _gather(idx, rows)
            else:
                m = _gather(idx, rows, valid=~tri_wins)
                mt = _gather(idx, tri_mat_rows, valid=tri_wins)
                m = [a + b for a, b in zip(m[:n_sc], mt)] + m[n_sc:]
            return m

        def hit_geom(o, d, t, hit_any, tri_wins, idx, centers):
            """(point, normal): sphere normal from the gathered center;
            triangle geometric normal (precomputed unit, flipped toward
            the ray) where the triangle won."""
            tsafe = jnp.where(hit_any, t, 0.0)
            px = o[0] + d[0] * tsafe
            py = o[1] + d[1] * tsafe
            pz = o[2] + d[2] * tsafe
            nx, ny, nz, _ = _normalize3(px - centers[0], py - centers[1],
                                        pz - centers[2])
            if tri_on:
                tn = _gather(idx, tri_norm_rows, valid=tri_wins)
                flip = jnp.where(
                    tn[0] * d[0] + tn[1] * d[1] + tn[2] * d[2] > 0, -1.0, 1.0)
                nx = jnp.where(tri_wins, tn[0] * flip, nx)
                ny = jnp.where(tri_wins, tn[1] * flip, ny)
                nz = jnp.where(tri_wins, tn[2] * flip, nz)
            return (px, py, pz), (nx, ny, nz)

        # ---- camera rays (ops/camera.py::rays_for_ids) -----------------
        if grid > 0:
            if quirks.diagonal_jitter:
                r = _draw(seed, 0, PURPOSE_JITTER, ids, 0)
                jx, jy = r, r
            else:
                r0, r1j = _draw2(seed, 0, PURPOSE_JITTER, ids, 0)
                jx = (cj + r0) / grid
                jy = (ci + r1j) / grid
        else:
            jx = jy = np.float32(0.5)
        u = (2.0 * ((xs + jx) * inv_w) - 1.0) * angle * aspect
        v = (1.0 - 2.0 * ((ys + jy) * inv_h)) * angle
        dx = cdir[0] + u * right[0] + v * up[0]
        dy = cdir[1] + u * right[1] + v * up[1]
        dz = cdir[2] + u * right[2] + v * up[2]
        if not quirks.unnormalized_ray_dirs:
            dx, dy, dz, _ = _normalize3(dx, dy, dz)

        hit0, triw0, t0, idx0, shades0f, miss0f, fm0 = nearest(
            0, cam, (dx, dy, dz), rows=full_rows)
        m0 = fm0 if fm0 is not None else gather_mat(idx0, triw0, True)
        amb0, dif0, spec0, pow0 = unpack(m0)
        cen0 = m0[n_sc:n_sc + 3]
        x0, n0 = hit_geom(cam, (dx, dy, dz), t0, hit0, triw0, idx0, cen0)
        if F > 0 and tri_on and not tri_black:
            # fog distance term: sphere center for sphere hits, the hit
            # point for clean triangle hits (shading._shade_hit routing)
            pc0 = tuple(jnp.where(triw0, x0[c], cen0[c]) for c in range(3))
        else:
            pc0 = cen0
        d0r, d0g, d0b, bits0 = shade(x0, n0, amb0, dif0, spec0, pow0,
                                     pc=pc0, idp=ids, bounce=0,
                                     rec=recs_in[0] if replay else None)
        if emit_records:
            recs_out[0] = pack_rec(idx0, hit0, triw0, bits0)

        if not mc:
            # Plain Blinn-Phong (src/raytrace.h:205-218): direct for
            # shaded hits, black for parity triangles, background for
            # misses.
            return (shades0f * d0r + miss0f * bg[0],
                    shades0f * d0g + miss0f * bg[1],
                    shades0f * d0b + miss0f * bg[2], recs_out)

        # MC combine (src/raytrace.h:213): l0 = direct/pi * diffuse.
        l0r = shades0f * (d0r / _PI * dif0[0]) + miss0f * bg[0]
        l0g = shades0f * (d0g / _PI * dif0[1]) + miss0f * bg[1]
        l0b = shades0f * (d0b / _PI * dif0[2]) + miss0f * bg[2]

        if D <= 1:
            return l0r, l0g, l0b, recs_out

        # ---- Monte-Carlo continuation paths ----------------------------
        # Hoisted per-sample state shared by all P paths: the primary
        # hit's tangent frame and throughput base 2*pi*diffuse*shades.
        pn0, pb0 = _tangent_frame(*n0)
        base = (_TWO_PI * dif0[0] * shades0f, _TWO_PI * dif0[1] * shades0f,
                _TWO_PI * dif0[2] * shades0f)

        def sample_dir(r1, r2, n, pn, pb):
            """uniform_sample_hemi + to_world (ops/sampling.py)."""
            pos = 1.0 - r1 * r1 > 0
            s_th = jnp.sqrt(jnp.where(pos, 1.0 - r1 * r1, 1.0)) * pos
            phi = _TWO_PI * r2
            sx = s_th * jnp.cos(phi)
            sy = r1
            sz = s_th * jnp.sin(phi)
            if quirks.buggy_tangent_frame:
                third = (pn[0], pb[1], pb[2])
            else:
                third = pn
            ddx = sx * pb[0] + sy * n[0] + sz * third[0]
            ddy = sx * pb[1] + sy * n[1] + sz * third[1]
            ddz = sx * pb[2] + sy * n[2] + sz * third[2]
            if not quirks.unnormalized_ray_dirs:
                ddx, ddy, ddz, _ = _normalize3(ddx, ddy, ddz)
            return ddx, ddy, ddz

        def bounce_origin(x, n):
            if clean_offsets:
                xn = jnp.sqrt(jnp.maximum(
                    x[0] * x[0] + x[1] * x[1] + x[2] * x[2], 0.0))
                sc = CLEAN_T_EPS * (1.0 + xn)
                return (x[0] + sc * n[0], x[1] + sc * n[1], x[2] + sc * n[2])
            return (x[0] + INDIRECT_ORIGIN_EPS, x[1] + INDIRECT_ORIGIN_EPS,
                    x[2] + INDIRECT_ORIGIN_EPS)

        need_geo_final = point_on or dir_on

        def path_body(p, acc):
            ar, ag, ab = acc
            idp = ids * jnp.uint32(P) + jnp.uint32(p)
            # state from the previous bounce's hit
            xb, nb, pnb, pbb = x0, n0, pn0, pb0
            Tb = None  # throughput; None until the first factor lands
            difb, shadesbf = dif0, shades0f
            for b in range(1, D):
                r1, r2 = _draw2(seed, b - 1, PURPOSE_PATH, idp, 0)
                db3 = sample_dir(r1, r2, nb, pnb, pbb)
                ob3 = bounce_origin(xb, nb)
                if Tb is None:
                    Tb = (base[0] * r1, base[1] * r1, base[2] * r1)
                else:
                    f = _TWO_PI * r1
                    Tb = (Tb[0] * (f * difb[0]) * shadesbf,
                          Tb[1] * (f * difb[1]) * shadesbf,
                          Tb[2] * (f * difb[2]) * shadesbf)
                slot = 1 + p * (D - 1) + (b - 1)
                last = b == D - 1
                need_geo = need_geo_final or not last
                hitb, triwb, tb, idxb, shadesbf, missbf, fmb = nearest(
                    slot, ob3, db3,
                    rows=full_rows if need_geo else shade_rows)
                mb = fmb if fmb is not None else gather_mat(
                    idxb, triwb, need_geo)
                ambb, difb, specb, powb = unpack(mb)
                if need_geo:
                    xb, nb = hit_geom(ob3, db3, tb, hitb, triwb, idxb,
                                      mb[n_sc:n_sc + 3])
                if need_geo_final:
                    cenb = mb[n_sc:n_sc + 3]
                    if F > 0 and tri_on and not tri_black:
                        pcb = tuple(jnp.where(triwb, xb[c], cenb[c])
                                    for c in range(3))
                    else:
                        pcb = cenb
                    dbr, dbg, dbb, bitsb = shade(
                        xb, nb, ambb, difb, specb, powb,
                        pc=pcb, idp=idp, bounce=b,
                        rec=recs_in[slot] if replay else None)
                else:
                    dbr = amb_s[0] * ambb[0]
                    dbg = amb_s[1] * ambb[1]
                    dbb = amb_s[2] * ambb[2]
                    bitsb = None
                if emit_records:
                    recs_out[slot] = pack_rec(idxb, hitb, triwb, bitsb)
                ar += Tb[0] * (shadesbf * (dbr / _PI * difb[0])
                               + missbf * bg[0])
                ag += Tb[1] * (shadesbf * (dbg / _PI * difb[1])
                               + missbf * bg[1])
                ab += Tb[2] * (shadesbf * (dbb / _PI * difb[2])
                               + missbf * bg[2])
                if not last:
                    pnb, pbb = _tangent_frame(*nb)
            return ar, ag, ab

        zero = jnp.zeros(ids.shape, jnp.float32)
        if P <= _UNROLL_PATHS:
            acc = (zero, zero, zero)
            for p in range(P):
                acc = path_body(p, acc)
            ar, ag, ab = acc
        else:
            assert not (emit_records or replay), (
                "records need static path slots")
            ar, ag, ab = jax.lax.fori_loop(0, P, path_body, (zero, zero, zero))
        inv_p = np.float32(1.0 / P)
        return (l0r + ar * inv_p, l0g + ag * inv_p, l0b + ab * inv_p,
                recs_out)

    return frame_math


def _build_kernel(*, emit_records: bool = False, **static):
    """Forward whole-frame kernel: thin ref-plumbing around
    `_build_frame_math` (which see)."""
    fm = _build_frame_math(emit_records=emit_records, **static)

    def kernel(sph_ref, tri_ref, misc_ref, pl_ref, dl_ref, seed_ref, ids_ref,
               xs_ref, ys_ref, cj_ref, ci_ref, r_ref, g_ref, b_ref,
               *maybe_rec):
        r, g, b, recs = fm(
            (sph_ref, tri_ref, misc_ref, pl_ref, dl_ref),
            (ids_ref[...], xs_ref[...], ys_ref[...], cj_ref[...],
             ci_ref[...]),
            seed_ref[0, 0],
        )
        r_ref[...] = r
        g_ref[...] = g
        b_ref[...] = b
        if emit_records:
            for k, rp in enumerate(recs):
                maybe_rec[0][k, ...] = rp

    return kernel


def _n_records(cfg: RenderConfig) -> int:
    """Hit records per sample: primary + one per (path, bounce)."""
    if not cfg.monte_carlo or cfg.max_depth <= 1:
        return 1
    return 1 + cfg.paths_per_sample * (cfg.max_depth - 1)


def _pack_tables(scene):
    """The five scalar tables the kernels read, as a PURE jnp function of
    the scene pytree — differentiable, so the backward kernel's table
    cotangents map back onto scene leaves via jax.vjp of this packing."""
    from skele_raytracer_tpu.ops.geometry import normalize

    sph_t, cam_t = scene.spheres, scene.camera
    S = sph_t.mask.shape[0]
    sph_tab = jnp.concatenate(
        [
            sph_t.center,                       # 0:3
            (sph_t.radius * sph_t.radius)[:, None],  # 3
            sph_t.mask[:, None],                # 4
            sph_t.ambient,                      # 5:8
            sph_t.diffuse,                      # 8:11
            sph_t.specular,                     # 11:14
            sph_t.power[:, None],               # 14
            jnp.zeros((S, 1), jnp.float32),     # 15 pad
        ],
        axis=1,
    )
    # Triangle table (decorative triangles only — use_pathtrace caps at
    # MAX_TRIS; mesh scenes go through the culled kernels). Edges and the
    # unit geometric normal are precomputed; the kernel flips the normal
    # toward each ray.
    if scene.has_triangles:
        tr = scene.triangles
        e1 = tr.v1 - tr.v0
        e2 = tr.v2 - tr.v0
        ntri = normalize(jnp.cross(e1, e2))
        tri_tab = jnp.concatenate(
            [tr.v0, e1, e2, tr.mask[:, None], ntri, tr.ambient, tr.diffuse,
             tr.specular, tr.power[:, None],
             jnp.zeros((tr.mask.shape[0], 1), jnp.float32)],
            axis=1,
        )  # [T, 24]
    else:
        tri_tab = jnp.zeros((1, 24), jnp.float32)

    right = jnp.cross(-cam_t.direction, cam_t.up)
    misc = jnp.concatenate(
        [cam_t.position, right, cam_t.up, cam_t.direction, scene.ambient,
         scene.background, jnp.zeros((6,), jnp.float32)]
    )[None, :]
    if scene.has_fog and not scene.fog_zeroed:
        # fog rows appended below the camera row: radius(0) absorption(1)
        # scattering(2) albedo(3:6) mask(6) — shading._fog_term's inputs
        # (the volume CENTER is unused by the reference's fog math).
        fg = scene.fog
        Fn = fg.mask.shape[0]
        misc = jnp.concatenate(
            [misc,
             jnp.concatenate(
                 [fg.radius[:, None], fg.absorption[:, None],
                  fg.scattering[:, None], fg.albedo, fg.mask[:, None],
                  jnp.zeros((Fn, misc.shape[1] - 7), jnp.float32)],
                 axis=1)],
            axis=0)

    plt = scene.point_lights
    L = plt.mask.shape[0]
    pl_tab = jnp.concatenate(
        [plt.position, plt.colour, plt.mask[:, None],
         jnp.zeros((L, 1), jnp.float32)], axis=1
    )
    dlt = scene.directional_lights
    LD = dlt.mask.shape[0]
    dl_tab = jnp.concatenate(
        [normalize(dlt.direction), dlt.colour, dlt.mask[:, None],
         jnp.zeros((LD, 1), jnp.float32)], axis=1
    )
    return sph_tab, tri_tab, misc, pl_tab, dl_tab


def _static_kernel_args(scene, cfg: RenderConfig) -> dict:
    """The static configuration closed over both kernels."""
    # Same static gate as ops/shading.direct_illumination: parity's zeroed
    # fog reroutes (and so kills) the whole point-light block.
    point_on = scene.has_point_lights and not (
        scene.has_fog and scene.fog_zeroed
    )
    # fov projection constant (ops/camera.py computes tan in f32 inside the
    # trace; the f64-then-round value here can differ by 1 ulp — covered by
    # the kernel-vs-jnp tolerance)
    angle = float(np.float32(np.tan(np.pi * 0.5 * cfg.fov / 180.0)))
    return dict(
        S=scene.spheres.mask.shape[0],
        T=scene.triangles.mask.shape[0] if scene.has_triangles else 1,
        L=scene.point_lights.mask.shape[0],
        LD=scene.directional_lights.mask.shape[0],
        sph_on=scene.has_spheres, tri_on=scene.has_triangles,
        point_on=point_on, dir_on=scene.has_directional,
        use_shadows=cfg.use_shadows, mc=cfg.monte_carlo,
        P=cfg.paths_per_sample, D=cfg.max_depth, grid=cfg.grid_size,
        width=cfg.width, height=cfg.height, angle=angle, quirks=cfg.quirks,
        F=(scene.fog.mask.shape[0]
           if scene.has_fog and not scene.fog_zeroed else 0),
    )


def _plane_inputs(cfg: RenderConfig, sample_ids):
    """Pad the flat sample ids to whole tiles and derive the per-sample
    pixel/jitter-cell planes both kernels consume."""
    N = sample_ids.shape[0]
    n_tiles = -(-N // TILE)
    Np = n_tiles * TILE
    ids = jnp.concatenate(
        [sample_ids.astype(jnp.uint32),
         jnp.zeros((Np - N,), jnp.uint32)]
    )
    spp = cfg.samples_per_pixel
    pixel = (ids // jnp.uint32(spp)).astype(jnp.float32)
    sample = (ids % jnp.uint32(spp)).astype(jnp.float32)
    xs = jnp.mod(pixel, cfg.width)
    ys = jnp.floor(pixel / cfg.width)
    if cfg.grid_size > 0 and not cfg.quirks.diagonal_jitter:
        ci = jnp.floor(sample / cfg.grid_size)
        cj = jnp.mod(sample, cfg.grid_size)
    else:
        ci = cj = jnp.zeros_like(sample)
    rows = Np // 128
    plane = lambda a: a.reshape(rows, 128)
    planes = (plane(ids), plane(xs), plane(ys), plane(cj), plane(ci))
    return planes, n_tiles, rows, Np


def _pathtrace_call(scene, cfg: RenderConfig, seed, sample_ids,
                    with_records: bool = False):
    """Pad, pack the scalar tables, and launch the whole-frame kernel.
    Returns radiance [N, 3] for the given flat sample ids (plus the
    packed [K, N] int32 hit records when with_records)."""
    N = sample_ids.shape[0]
    planes, n_tiles, rows, Np = _plane_inputs(cfg, sample_ids)
    tabs = _pack_tables(scene)
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1, 1)

    kernel = _build_kernel(
        emit_records=with_records, **_static_kernel_args(scene, cfg)
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((TILE_SUB, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.float32)
    out_specs = [ray_spec, ray_spec, ray_spec]
    out_shapes = [out_shape, out_shape, out_shape]
    if with_records:
        K = _n_records(cfg)
        out_specs.append(pl.BlockSpec((K, TILE_SUB, 128), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((K, rows, 128), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem, smem, smem, smem, smem, smem,
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(*tabs, seed_arr, *planes)
    r, g, b = out[0], out[1], out[2]
    radiance = jnp.stack(
        [r.reshape(Np), g.reshape(Np), b.reshape(Np)], axis=1
    )[:N]
    if with_records:
        return radiance, out[3].reshape(-1, Np)[:, :N]
    return radiance


def _build_backward_kernel(*, K: int, **static):
    """Analytic in-kernel backward: per tile, jax.grad of the record-driven
    replay (`_build_frame_math(replay=True)`) wrt the five scalar tables,
    contracted against the incoming radiance cotangent planes and
    accumulated into the gradient-table outputs across the sequential
    grid. This is the 'backward reuses the forward's intersection
    structure' contract executed entirely inside one Pallas kernel — no
    per-bounce XLA replay chain, no [rays, spheres] scans."""
    fm = _build_frame_math(replay=True, **static)

    def kernel(seed_ref, ids_ref, xs_ref, ys_ref, cj_ref, ci_ref, rec_ref,
               gr_ref, gg_ref, gb_ref,
               sph_ref, tri_ref, misc_ref, pl_ref, dl_ref,
               dsph_ref, dtri_ref, dmisc_ref, dpl_ref, ddl_ref):
        planes = (ids_ref[...], xs_ref[...], ys_ref[...], cj_ref[...],
                  ci_ref[...])
        seed = seed_ref[0, 0]
        recs = [rec_ref[k] for k in range(K)]
        gr, gg, gb = gr_ref[...], gg_ref[...], gb_ref[...]

        def loss(sph_t, tri_t, misc_t, pl_t, dl_t):
            r, g, b, _ = fm((sph_t, tri_t, misc_t, pl_t, dl_t), planes,
                            seed, recs_in=recs)
            return jnp.sum(r * gr + g * gg + b * gb)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            sph_ref[...], tri_ref[...], misc_ref[...], pl_ref[...],
            dl_ref[...])
        first = pl.program_id(0) == 0
        for dref, dval in zip(
            (dsph_ref, dtri_ref, dmisc_ref, dpl_ref, ddl_ref), grads
        ):
            prev = jnp.where(first, jnp.zeros_like(dval), dref[...])
            dref[...] = prev + dval

    return kernel


def _backward_call(tabs, scene, cfg: RenderConfig, seed, sample_ids, rec, g):
    """Launch the backward kernel; returns cotangents for the five tables.
    `tabs` are the primal tables (from the jax.vjp over _pack_tables that
    will map the result back to scene leaves); `rec` is the forward's
    [K, N] packed hit records; `g` the [N, 3] radiance cotangent."""
    N = sample_ids.shape[0]
    planes, n_tiles, rows, Np = _plane_inputs(cfg, sample_ids)
    K = rec.shape[0]
    rec_p = jnp.concatenate(
        [rec, jnp.zeros((K, Np - N), rec.dtype)], axis=1
    ).reshape(K, rows, 128)
    # Cotangent padding MUST be zero: pad lanes duplicate sample 0's
    # compute and would otherwise contribute spurious gradients.
    g_p = jnp.concatenate([g, jnp.zeros((Np - N, 3), g.dtype)], axis=0)
    g_planes = tuple(g_p[:, c].reshape(rows, 128) for c in range(3))
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1, 1)

    kernel = _build_backward_kernel(K=K, **_static_kernel_args(scene, cfg))

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((TILE_SUB, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((K, TILE_SUB, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = lambda t: pl.BlockSpec(
        t.shape, lambda i: tuple(0 for _ in t.shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  rec_spec, ray_spec, ray_spec, ray_spec,
                  vmem, vmem, vmem, vmem, vmem],
        out_specs=tuple(acc_spec(t) for t in tabs),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tabs
        ),
        interpret=_interpret(),
    )(seed_arr, *planes, rec_p, *g_planes, *tabs)


def _f0(x):
    """float0 cotangent for integer primals."""
    return np.zeros(np.shape(x), jax.dtypes.float0)


# ---------------------------------------------------------------------------
# Hit-structure replay: the differentiable backward of the kernel
# ---------------------------------------------------------------------------


def replay_frame_bits(scene, cfg: RenderConfig, seed, sample_ids, rec):
    """The tangent-frame branch bits [P*(D-1), N] the replay takes at
    THIS scene — the frozen-topology side data for the fixed-topology
    finite-difference gradient check (pass to _replay_radiance /
    _replay_chunked as frame_bits)."""
    bits: list = []
    _replay_radiance(scene, cfg, seed, sample_ids, rec,
                     collect_frame_bits=bits)
    if not bits:
        return jnp.zeros((0, sample_ids.shape[0]), bool)
    return jnp.stack(bits)


def _replay_radiance(scene, cfg: RenderConfig, seed, sample_ids, rec,
                     frame_bits=None, collect_frame_bits=None):
    """Differentiable jnp re-computation of the kernel's radiance FROM the
    saved hit structure (the same contract as megakernel.shade_replay,
    here for the whole path-trace chain): per-bounce sphere t replayed
    from the SELECTED sphere's quadratic (O(rays), src/utils.h:113-121),
    shading gated by the saved per-light unshadowed bits — no argmin, no
    [rays, spheres] scans, no shadow scans. rec: [K, N] int32 packed
    (index | hit<<8 | unshadowed bits<<9).

    `frame_bits` (optional, [P*(D-1), N] bool): FREEZES the tangent-frame
    branch per (path, bounce) — the remaining discrete selection beyond
    the hit records. The fixed-topology finite-difference check passes
    the base scene's bits (replay_frame_bits) so FD samples the same
    locally-smooth function autodiff differentiates."""
    from skele_raytracer_tpu.ops import sampling
    from skele_raytracer_tpu.ops.camera import rays_for_ids
    from skele_raytracer_tpu.ops.geometry import (
        _pos_sqrt,
        dot,
        norm,
        normalize,
        offset_origin,
        gather_rows,
        one_hot_rows,
        replay_triangle_t,
    )
    from skele_raytracer_tpu.ops.pallas.megakernel import hit_geometry
    from skele_raytracer_tpu.ops.shading import gather_material

    q = cfg.quirks
    S = scene.spheres.mask.shape[0]
    point_on = scene.has_point_lights and not (
        scene.has_fog and scene.fog_zeroed
    )
    dir_on = scene.has_directional
    Lp = scene.point_lights.mask.shape[0]

    def unpack_rec(r):
        idx = r & 0xFF
        hit = ((r >> 8) & 1).astype(bool)
        tri = ((r >> 9) & 1).astype(bool)
        kind = jnp.where(tri, 2, jnp.where(hit, 1, 0)).astype(jnp.int32)
        return idx, kind

    def replay_hit(o, d, idx, kind):
        """(point, normal, material) from the saved discrete structure:
        selected-sphere quadratic / selected-triangle MT t (O(rays)),
        then the shared hit_geometry / gather_material replays."""
        oh = one_hot_rows(jnp.where(kind == 1, idx, 0), S)
        cen = gather_rows(oh, scene.spheres.center)
        rad = gather_rows(oh, scene.spheres.radius[:, None])[:, 0]
        ec = o - cen
        a = dot(d, d)
        b = 2.0 * dot(d, ec)
        c = dot(ec, ec) - rad ** 2
        t_sph = (-b - _pos_sqrt(b * b - 4.0 * a * c)) / (2.0 * a)
        if scene.has_triangles:
            t_tri = replay_triangle_t(
                o, d, scene.triangles, jnp.where(kind == 2, idx, 0))
            t = jnp.where(kind == 2, t_tri,
                          jnp.where(kind == 1, t_sph, 0.0))
        else:
            t = jnp.where(kind == 1, t_sph, 0.0)
        x, n = hit_geometry(o, d, scene, kind, idx, t)
        return x, n, gather_material(scene, kind, idx, quirks=q)

    def gates_from_bits(r, base_bit, count):
        if not cfg.use_shadows:
            return jnp.ones((r.shape[0], count), jnp.float32)
        cols = jnp.arange(count, dtype=jnp.int32)[None, :]
        return ((r[:, None] >> (base_bit + cols)) & 1).astype(jnp.float32)

    def shade_replay(x, n, mat, r):
        total = scene.ambient[None, :] * mat.ambient
        if not (point_on or dir_on):
            return total
        view = normalize(scene.camera.position[None, :] - x)
        if point_on:
            pl_ = scene.point_lights
            gate = gates_from_bits(r, 10, Lp) * pl_.mask[None, :]
            l_vec = pl_.position[None, :, :] - x[:, None, :]
            d_l = norm(l_vec)
            l = l_vec / jnp.maximum(d_l, 1e-30)[:, :, None]
            intensity = 1.0 / jnp.maximum(d_l * d_l, 1e-30)
            ndotl = jnp.maximum(0.0, dot(n[:, None, :], l))
            diffuse_pt = (mat.diffuse[:, None, :] * pl_.colour[None, :, :]
                          * (intensity * ndotl)[:, :, None])
            h_raw = view[:, None, :] + l
            h = h_raw / jnp.maximum(norm(h_raw, keepdims=True), 1e-30)
            ndoth = jnp.maximum(0.0, dot(n[:, None, :], h))
            spow = jnp.power(jnp.maximum(ndoth, 1e-30),
                             mat.power[:, None]) * (ndoth > 0)
            specular_pt = (mat.specular[:, None, :] * pl_.colour[None, :, :]
                           * (intensity * spow)[:, :, None])
            total = total + jnp.sum(
                (diffuse_pt + specular_pt) * gate[:, :, None], axis=1)
        if dir_on:
            dl_ = scene.directional_lights
            Ld = dl_.mask.shape[0]
            gate = gates_from_bits(r, 10 + Lp, Ld) * dl_.mask[None, :]
            ld = normalize(dl_.direction)[None, :, :]
            ld = jnp.broadcast_to(ld, (x.shape[0],) + ld.shape[1:])
            ndotl = jnp.maximum(0.0, dot(n[:, None, :], ld))
            diffuse_d = (mat.diffuse[:, None, :] * dl_.colour[None, :, :]
                         * ndotl[:, :, None])
            h_raw = view[:, None, :] + ld
            h = h_raw / jnp.maximum(norm(h_raw, keepdims=True), 1e-30)
            ndoth = jnp.maximum(0.0, dot(n[:, None, :], h))
            spow = jnp.power(jnp.maximum(ndoth, 1e-30),
                             mat.power[:, None]) * (ndoth > 0)
            specular_d = (mat.specular[:, None, :] * dl_.colour[None, :, :]
                          * spow[:, :, None])
            total = total + jnp.sum(
                (diffuse_d + specular_d) * gate[:, :, None], axis=1)
        return total

    def shades_miss(kind):
        """(shades, miss) column masks — parity triangles shade black
        (src/raytrace.h:221-224), clean shades both kinds."""
        sh = (kind == 1) if q.triangles_shade_black else (kind > 0)
        return sh[:, None], (kind == 0)[:, None]

    o, d = rays_for_ids(scene.camera, cfg, seed, sample_ids)
    idx0, kind0 = unpack_rec(rec[0])
    x0, n0, mat0 = replay_hit(o, d, idx0, kind0)
    direct0 = shade_replay(x0, n0, mat0, rec[0])
    bg = jnp.broadcast_to(scene.background[None, :], direct0.shape)
    sh0, miss0 = shades_miss(kind0)
    if not cfg.monte_carlo:
        return jnp.where(miss0, bg, jnp.where(sh0, direct0, 0.0))
    l0 = jnp.where(miss0, bg,
                   jnp.where(sh0, direct0 / jnp.pi * mat0.diffuse, 0.0))
    D, P = cfg.max_depth, cfg.paths_per_sample
    if D <= 1:
        return l0

    acc = jnp.zeros_like(l0)
    for p in range(P):
        pid = sample_ids.astype(jnp.uint32) * jnp.uint32(P) + jnp.uint32(p)
        xb, nb, difb, shb = x0, n0, mat0.diffuse, sh0.astype(jnp.float32)
        T = None
        for b in range(1, D):
            rdraw = sampling.uniform(seed, pid, b - 1, sampling.PURPOSE_PATH,
                                     (2,))
            r1, r2 = rdraw[:, 0], rdraw[:, 1]
            smp = sampling.uniform_sample_hemi(r1, r2)
            fb = (None if frame_bits is None
                  else frame_bits[p * (D - 1) + (b - 1)])
            if collect_frame_bits is not None:
                collect_frame_bits.append(
                    jnp.abs(nb[..., 0]) > jnp.abs(nb[..., 1]))
            d_new = sampling.to_world(smp, nb, quirks=q, use_x=fb)
            if not q.unnormalized_ray_dirs:
                d_new = normalize(d_new)
            if q.scalar_epsilon_offset:
                o_new = xb + INDIRECT_ORIGIN_EPS
            else:
                o_new = offset_origin(xb, nb)
            f = 2.0 * jnp.pi * r1[:, None] * difb
            T = f * shb if T is None else T * f * shb
            rk = rec[1 + p * (D - 1) + (b - 1)]
            idxb, kindb = unpack_rec(rk)
            xb, nb, matb = replay_hit(o_new, d_new, idxb, kindb)
            directb = shade_replay(xb, nb, matb, rk)
            shb_c, missb = shades_miss(kindb)
            acc = acc + T * jnp.where(
                missb, bg,
                jnp.where(shb_c, directb / jnp.pi * matb.diffuse, 0.0))
            difb, shb = matb.diffuse, shb_c.astype(jnp.float32)
    return l0 + acc / P


def _replay_chunked(scene, cfg: RenderConfig, seed, sample_ids, rec,
                    frame_bits=None):
    """Chunk + rematerialize the replay (same rationale as
    renderer.render_ids_chunked_jnp: the per-bounce AD residuals of a
    whole 1080p frame would be GBs). frame_bits: see _replay_radiance."""
    n = sample_ids.shape[0]
    fan = max(cfg.paths_per_sample, 1)
    chunk = max(128, min(max(1, cfg.rays_per_chunk // fan), n))
    n_chunks = -(-n // chunk)
    padded = n_chunks * chunk
    K = rec.shape[0]
    ids = jnp.concatenate(
        [sample_ids, jnp.zeros((padded - n,), sample_ids.dtype)]
    ).reshape(n_chunks, chunk)
    rec_p = jnp.concatenate(
        [rec, jnp.zeros((K, padded - n), rec.dtype)], axis=1
    ).reshape(K, n_chunks, chunk).transpose(1, 0, 2)
    args = (ids, rec_p)
    if frame_bits is not None:
        B = frame_bits.shape[0]
        fb_p = jnp.concatenate(
            [frame_bits, jnp.zeros((B, padded - n), frame_bits.dtype)],
            axis=1,
        ).reshape(B, n_chunks, chunk).transpose(1, 0, 2)
        args = args + (fb_p,)
    body = jax.checkpoint(
        lambda a: _replay_radiance(scene, cfg, seed, a[0], a[1],
                                   frame_bits=a[2] if len(a) > 2 else None)
    )
    radiance = jax.lax.map(body, args)
    return radiance.reshape(padded, 3)[:n]


def _can_replay(scene, cfg: RenderConfig) -> bool:
    """Records fit: static path slots, 8-bit sphere index, and (with
    shadows) every padded light's unshadowed bit inside an int32. Sphere
    tables past _UNROLL_SPHERES run the forward scans as fori_loops
    (loop mode) which the record/replay machinery does not serve —
    gradients there re-derive through the jnp wavefront instead."""
    L = scene.point_lights.mask.shape[0]
    LD = scene.directional_lights.mask.shape[0]
    return (
        cfg.paths_per_sample <= _UNROLL_PATHS
        and scene.spheres.mask.shape[0] <= _UNROLL_SPHERES
        and (not cfg.use_shadows or 10 + L + LD <= 32)
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def pathtrace_ids(scene, cfg: RenderConfig, seed, sample_ids):
    """Whole-frame kernel radiance [N, 3], differentiable.

    Forward: the Pallas megakernel (module docstring). Backward: the
    analytic in-kernel VJP (`_build_backward_kernel`) driven by the
    forward's saved per-bounce hit records — the backward pass reuses
    the forward's intersection structure instead of re-intersecting.
    Configs whose records don't fit (`_can_replay`) fall back to
    re-deriving everything through the jnp wavefront path, whose
    estimator is identical."""
    sg = jax.lax.stop_gradient
    return _pathtrace_call(sg(scene), cfg, seed, sample_ids)


def _pt_fwd(scene, cfg, seed, sample_ids):
    sg = jax.lax.stop_gradient
    if _can_replay(scene, cfg):
        radiance, rec = _pathtrace_call(
            sg(scene), cfg, seed, sample_ids, with_records=True
        )
        return radiance, (scene, seed, sample_ids, rec)
    radiance = _pathtrace_call(sg(scene), cfg, seed, sample_ids)
    return radiance, (scene, seed, sample_ids, None)


def _pt_bwd(cfg, res, g):
    scene, seed, sample_ids, rec = res
    if rec is None:
        from skele_raytracer_tpu.models.renderer import render_ids_chunked_jnp

        _, vjp = jax.vjp(
            lambda s: render_ids_chunked_jnp(s, cfg, seed, sample_ids), scene
        )
        return vjp(g)[0], _f0(seed), _f0(sample_ids)
    # Analytic in-kernel backward: one pallas_call replays shading from
    # the saved hit structure under jax.grad and accumulates the scalar
    # TABLE gradients per tile; jax.vjp of the (pure jnp) table packing
    # then maps those cotangents back onto the scene leaves.
    tabs, pack_vjp = jax.vjp(_pack_tables, scene)
    d_tabs = _backward_call(tabs, scene, cfg, seed, sample_ids, rec, g)
    return pack_vjp(d_tabs)[0], _f0(seed), _f0(sample_ids)


pathtrace_ids.defvjp(_pt_fwd, _pt_bwd)
