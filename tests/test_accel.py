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
