"""Morton-cluster acceleration structure + culled Pallas kernel."""

import numpy as np
import pytest

import jax.numpy as jnp

from skele_raytracer_tpu.config import CLEAN, PARITY
from skele_raytracer_tpu.ops import accel, geometry
from skele_raytracer_tpu.ops.pallas import culled


def _mesh(t=900, seed=3, scale=8.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-scale, scale, (t, 3)).astype(np.float32)
    v1 = v0 + rng.normal(size=(t, 3)).astype(np.float32)
    v2 = v0 + rng.normal(size=(t, 3)).astype(np.float32)
    m = np.ones((t,), np.float32)
    m[-5:] = 0.0
    return (jnp.asarray(v) for v in (v0, v1, v2, m))


def test_cluster_aabbs_contain_triangles():
    v0, v1, v2, m = _mesh()
    mesh = accel.build_clusters(v0, v1, v2, m)
    cs = accel.CLUSTER_SIZE
    for c in range(mesh.n_clusters):
        sl = slice(c * cs, (c + 1) * cs)
        msk = np.asarray(mesh.mask[sl]) > 0
        if not msk.any():
            continue
        pts = np.concatenate(
            [np.asarray(v)[sl][msk] for v in (mesh.v0, mesh.v1, mesh.v2)]
        )
        lo, hi = np.asarray(mesh.aabb_lo[c]), np.asarray(mesh.aabb_hi[c])
        assert (pts >= lo - 1e-4).all() and (pts <= hi + 1e-4).all(), c


def test_perm_roundtrip():
    v0, v1, v2, m = _mesh()
    mesh = accel.build_clusters(v0, v1, v2, m)
    perm = np.asarray(mesh.perm).astype(np.int64)
    real = np.asarray(mesh.mask) > 0
    np.testing.assert_allclose(
        np.asarray(mesh.v0)[real], np.asarray(v0)[perm[real]]
    )


def test_aabb_mask_never_culls_a_hit():
    v0, v1, v2, m = _mesh()
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-12, 12, (400, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(400, 3)).astype(np.float32))
    for quirks in (PARITY, CLEAN):
        ref = geometry.nearest_triangle(
            o, d, mesh.v0, mesh.v1, mesh.v2, mesh.mask, quirks=quirks
        )
        amask = accel.ray_aabb_mask(
            o, d, mesh.aabb_lo, mesh.aabb_hi,
            allow_negative=quirks.reference_triangle_test,
        )
        hit_cluster = np.asarray(ref.index) // accel.CLUSTER_SIZE
        hits = np.asarray(ref.hit)
        # every actual hit's cluster must be in the ray's mask
        picked = np.asarray(amask)[np.arange(400), hit_cluster]
        assert picked[hits].all()


@pytest.mark.parametrize("quirks", [PARITY, CLEAN], ids=["parity", "clean"])
def test_culled_matches_bruteforce(quirks):
    v0, v1, v2, m = _mesh(t=1100, seed=9)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(4)
    o = jnp.asarray(rng.uniform(-12, 12, (700, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32))
    ref = geometry.nearest_triangle(o, d, v0, v1, v2, m, quirks=quirks)
    t, idx, hit = culled.triangle_nearest_culled(o, d, mesh, quirks=quirks)
    hit_np, rhit = np.asarray(hit), np.asarray(ref.hit)
    agree = hit_np == rhit
    assert agree.mean() > 0.995, f"{(~agree).sum()} rays disagree"
    both = hit_np & rhit & agree
    np.testing.assert_allclose(
        np.asarray(t)[both], np.asarray(ref.t)[both], rtol=1e-3, atol=1e-3
    )
    same_t = np.isclose(np.asarray(t), np.asarray(ref.t), rtol=1e-4, atol=1e-4)
    # indices must agree wherever t is unique enough to identify the tri
    np.testing.assert_array_equal(
        np.asarray(idx)[both & same_t], np.asarray(ref.index)[both & same_t]
    )


def test_dragon_scene_builds_clusters():
    from skele_raytracer_tpu.scene.parser import parse_scene

    parsed = parse_scene("/root/repo/scenes/dragon.scn")
    scene = parsed.to_scene()
    assert scene.clusters is not None
    assert scene.clusters.n_clusters >= 10002 // accel.CLUSTER_SIZE
    assert len(parsed.triangles) == 10002


def test_culled_tie_breaks_to_min_original_index():
    """Exact-t ties must resolve to the reference's first-in-file-order
    triangle even though Morton reordering scans in a different order: a
    small coplanar triangle (original index 7) inside a big one (original
    index 300), both at z=4 — a ray through the overlap hits both at
    exactly t=4."""
    rng = np.random.default_rng(21)
    t = 600
    v0 = rng.uniform(-10, 10, (t, 3)).astype(np.float32)
    v0[:, 2] = rng.uniform(50, 60, t)  # filler far behind
    v1 = v0 + rng.normal(size=(t, 3)).astype(np.float32)
    v2 = v0 + rng.normal(size=(t, 3)).astype(np.float32)
    small = np.array([[-1, -1, 4], [1, -1, 4], [0, 1, 4]], np.float32)
    big = np.array([[-10, -10, 4], [10, -10, 4], [0, 10, 4]], np.float32)
    for i, tri in ((7, small), (300, big)):
        v0[i], v1[i], v2[i] = tri
    m = np.ones((t,), np.float32)
    mesh = accel.build_clusters(*(jnp.asarray(a) for a in (v0, v1, v2, m)))
    # Precondition: Morton order must actually scan BIG before SMALL
    # (otherwise the test wouldn't distinguish scan-order from file-order).
    perm = np.asarray(mesh.perm).astype(np.int64)
    assert np.where(perm == 300)[0][0] < np.where(perm == 7)[0][0]

    o = jnp.asarray(np.array([[0.0, 0.0, 0.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    tt, idx, hit = culled.triangle_nearest_culled(o, d, mesh, quirks=CLEAN)
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(tt), 4.0, rtol=1e-5)
    assert int(idx[0]) == 7, int(idx[0])


def test_culled_reorder_invariance():
    v0, v1, v2, m = _mesh(t=600, seed=11)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(8)
    o = jnp.asarray(rng.uniform(-12, 12, (900, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(900, 3)).astype(np.float32))
    a = culled.triangle_nearest_culled(o, d, mesh, quirks=CLEAN, reorder=False)
    b = culled.triangle_nearest_culled(o, d, mesh, quirks=CLEAN, reorder=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# Any-hit occlusion kernel (culled.triangle_occluded)
# ---------------------------------------------------------------------------


def _occlusion_oracle(o, d, v0, v1, v2, m, quirks, bnd=None):
    """Brute-force [R, T] occlusion: ANY valid hit with t in (t_clip, bnd).
    Mirrors the kernel's contract (the shadow-query form of the reference's
    boolean scan, src/utils.h:42-76, extended to triangles in clean mode)."""
    from skele_raytracer_tpu.config import CLEAN_T_EPS

    t_all, ok, _, _ = geometry.ray_triangle_all(o, d, v0, v1, v2, m, quirks=quirks)
    t_clip = 1.0 if quirks.near_clip_t_le_1 else CLEAN_T_EPS
    occ = ok & (np.asarray(t_all) > t_clip)
    if bnd is not None:
        occ = occ & (np.asarray(t_all) < np.asarray(bnd)[:, None])
    return np.asarray(occ).any(axis=1)


@pytest.mark.parametrize("quirks", [PARITY, CLEAN], ids=["parity", "clean"])
def test_occluded_matches_bruteforce_unbounded(quirks):
    v0, v1, v2, m = _mesh(t=1100, seed=9)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(4)
    o = jnp.asarray(rng.uniform(-12, 12, (700, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32))
    want = _occlusion_oracle(o, d, v0, v1, v2, m, quirks)
    got = np.asarray(culled.triangle_occluded(o, d, mesh, quirks=quirks))
    assert (got == want).mean() > 0.998, f"{(got != want).sum()} rays disagree"


def test_occluded_respects_t_max_bound():
    """Blockers PAST the light must not occlude (point-light distance
    bound): same rays, shrinking bounds monotonically de-occlude, and each
    bound matches the brute-force oracle."""
    v0, v1, v2, m = _mesh(t=900, seed=5)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(6)
    R = 500
    o = jnp.asarray(rng.uniform(-12, 12, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    prev = None
    for bound in (20.0, 2.0, 0.05):
        bnd = jnp.full((R,), bound, jnp.float32)
        got = np.asarray(
            culled.triangle_occluded(o, d, mesh, quirks=CLEAN, t_max=bnd)
        )
        want = _occlusion_oracle(o, d, v0, v1, v2, m, CLEAN, bnd=bnd)
        mismatch = (got != want).sum()
        assert mismatch <= R * 0.002, f"bound={bound}: {mismatch} disagree"
        if prev is not None:
            assert not (got & ~prev).any(), "shrinking bound occluded MORE"
        prev = got
    # the 0.05 bound de-occludes almost everything (only rays whose
    # blocker sits within 0.05 ray-parameter units survive)
    assert prev.mean() < 0.01


def test_occluded_live_rays_unaffected_by_dead_neighbors():
    """Dead rays change tile composition (they sort to the end) and are
    excluded from cluster shortlists; LIVE rays' answers must not move.
    (Dead rays' own outputs are unspecified — callers mask by `live`,
    same contract as triangle_nearest_culled.)"""
    v0, v1, v2, m = _mesh(t=900, seed=7)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(9)
    R = 400
    o = jnp.asarray(rng.uniform(-12, 12, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    live = jnp.asarray((np.arange(R) % 3 != 0).astype(np.float32))
    got = np.asarray(
        culled.triangle_occluded(o, d, mesh, quirks=CLEAN, live=live)
    )
    full = np.asarray(culled.triangle_occluded(o, d, mesh, quirks=CLEAN))
    lv = np.asarray(live) > 0
    np.testing.assert_array_equal(got[lv], full[lv])


def test_occluded_reorder_invariance():
    v0, v1, v2, m = _mesh(t=600, seed=13)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(12)
    o = jnp.asarray(rng.uniform(-12, 12, (300, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    a = culled.triangle_occluded(o, d, mesh, quirks=CLEAN, reorder=False)
    b = culled.triangle_occluded(o, d, mesh, quirks=CLEAN, reorder=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_occluded_streaming_matches_resident(monkeypatch):
    """Force the DMA-streaming variant (no early exit) and compare with the
    VMEM-resident one (early exit + settle bound) — the exit conditions
    must never change the answer."""
    from skele_raytracer_tpu.ops.pallas import megakernel as mk

    v0, v1, v2, m = _mesh(t=1100, seed=17)
    mesh = accel.build_clusters(v0, v1, v2, m)
    rng = np.random.default_rng(15)
    R = 500
    o = jnp.asarray(rng.uniform(-12, 12, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    bnd = jnp.asarray(rng.uniform(1, 30, (R,)).astype(np.float32))
    res = np.asarray(culled.triangle_occluded(o, d, mesh, quirks=CLEAN, t_max=bnd))
    monkeypatch.setattr(mk, "RESIDENT_BUDGET_BYTES", 0)
    stream = np.asarray(
        culled.triangle_occluded(o, d, mesh, quirks=CLEAN, t_max=bnd)
    )
    np.testing.assert_array_equal(stream, res)


def test_culled_incoherent_route_matches_bruteforce():
    """The bounce-wave configuration — FINE clustering, group_c=2,
    mt_passes=3 (bf16x3 product), live mask — against the jnp [R, T]
    brute force. This is the exact knob combination geometry.intersect
    routes incoherent waves to (geometry.py intersect); the coarse
    default path is covered by test_culled_matches_bruteforce."""
    v0, v1, v2, m = _mesh(t=1500, seed=11)
    mesh = accel.build_clusters(
        v0, v1, v2, m, cluster_size=accel.FINE_CLUSTER_SIZE
    )
    rng = np.random.default_rng(5)
    R = 1536
    o = jnp.asarray(rng.uniform(-10, 10, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    live = jnp.asarray((rng.uniform(size=R) > 0.3).astype(np.float32))
    ref = geometry.nearest_triangle(o, d, v0, v1, v2, m, quirks=CLEAN)
    t, idx, hit = culled.triangle_nearest_culled(
        o, d, mesh, quirks=CLEAN, live=live, group_c=2, mt_passes=3
    )
    lv = np.asarray(live) > 0
    hit_np, rhit = np.asarray(hit)[lv], np.asarray(ref.hit)[lv]
    agree = hit_np == rhit
    # bf16x3 may flip knife-edge hits; overwhelming agreement required
    assert agree.mean() > 0.99, f"{(~agree).sum()} live rays disagree"
    both = hit_np & rhit & agree
    np.testing.assert_allclose(
        np.asarray(t)[lv][both], np.asarray(ref.t)[lv][both],
        rtol=1e-3, atol=1e-3,
    )
    same_t = np.isclose(
        np.asarray(t)[lv], np.asarray(ref.t)[lv], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(idx)[lv][both & same_t],
        np.asarray(ref.index)[lv][both & same_t],
    )


def test_occluded_incoherent_route_matches_bruteforce():
    """Any-hit kernel through the bounce-shadow knobs (fine clustering,
    group_c=2, mt_passes=3, live mask, bounded t) vs the jnp scan."""
    v0, v1, v2, m = _mesh(t=1200, seed=13)
    mesh = accel.build_clusters(
        v0, v1, v2, m, cluster_size=accel.FINE_CLUSTER_SIZE
    )
    rng = np.random.default_rng(7)
    R = 1024
    o = jnp.asarray(rng.uniform(-10, 10, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    live = jnp.asarray((rng.uniform(size=R) > 0.25).astype(np.float32))
    t_max = jnp.asarray(rng.uniform(2.0, 30.0, (R,)).astype(np.float32))
    occ = culled.triangle_occluded(
        o, d, mesh, quirks=CLEAN, t_max=t_max, live=live,
        group_c=2, mt_passes=3,
    )
    from skele_raytracer_tpu.config import CLEAN_T_EPS
    from skele_raytracer_tpu.ops.geometry import ray_triangle_all

    t_all, ok, _, _ = ray_triangle_all(o, d, v0, v1, v2, m, quirks=CLEAN)
    ref = np.asarray(
        jnp.any(ok & (t_all < t_max[:, None]), axis=1)
    )
    lv = np.asarray(live) > 0
    agree = np.asarray(occ)[lv] == ref[lv]
    assert agree.mean() > 0.995, f"{(~agree).sum()} live rays disagree"


def test_prepacked_blocks_match_jnp_fallback():
    """accel.build_clusters prebuilds the culled kernels' folded blocks
    (mesh.k10/org) in NumPy; culled.pack_cluster_blocks carries a jnp
    fallback for ad-hoc meshes. The two packers must not drift: compare
    them on a real mesh (allclose — XLA may fuse the cross products into
    FMAs NumPy does not use)."""
    import numpy as np

    from skele_raytracer_tpu.ops import accel
    from skele_raytracer_tpu.ops.pallas import culled
    from tests.conftest import make_mesh_scene

    mesh = make_mesh_scene(t=300).clusters
    assert mesh.k10 is not None and mesh.org is not None
    stripped = mesh._replace(k10=None, org=None)
    k10_j, org_j = culled.pack_cluster_blocks(stripped)
    np.testing.assert_allclose(
        np.asarray(mesh.k10), np.asarray(k10_j), rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mesh.org), np.asarray(org_j))


@pytest.mark.parametrize("allow_negative", [False, True])
def test_aabb_entry_unrolled_matches_reduce_form(allow_negative):
    """ray_aabb_entry's 3-axis is UNROLLED into pairwise min/max so the
    slab chain stays elementwise and fuses into the consumer's tile-min
    reduce (no [R, C] tmin/tmax materialization — PERF.md round 5). This
    guards that the unrolled form is BITWISE the naive [R, C, 3]
    broadcast + axis-reduce it replaced."""
    rng = np.random.default_rng(11)
    R, C = 257, 13
    o = jnp.asarray(rng.uniform(-5, 5, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    # include degenerate axis-aligned directions and a zero component
    d = d.at[:40, 0].set(0.0)
    lo = jnp.asarray(rng.uniform(-6, 2, (C, 3)).astype(np.float32))
    hi = lo + jnp.asarray(rng.uniform(0.1, 6, (C, 3)).astype(np.float32))

    hit, tmin = accel.ray_aabb_entry(o, d, lo, hi, allow_negative=allow_negative)

    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tmin_ref = jnp.max(jnp.minimum(t0, t1), axis=2)
    tmax_ref = jnp.min(jnp.maximum(t0, t1), axis=2)
    hit_ref = tmin_ref <= tmax_ref
    if not allow_negative:
        hit_ref = hit_ref & (tmax_ref > 0.0)

    np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_ref))
    np.testing.assert_array_equal(np.asarray(tmin), np.asarray(tmin_ref))
