"""Closed-form unit tests for intersection geometry (ops/geometry.py)."""

import jax.numpy as jnp
import numpy as np

from skele_raytracer_tpu import CLEAN, PARITY
from skele_raytracer_tpu.ops.geometry import (
    nearest_sphere,
    nearest_triangle,
    ray_sphere_all,
    ray_triangle_all,
)


def _rays(*pairs):
    o = jnp.asarray([p[0] for p in pairs], jnp.float32)
    d = jnp.asarray([p[1] for p in pairs], jnp.float32)
    return o, d


def test_sphere_closed_form():
    # Unit sphere at origin, ray from z=-5 toward +z: hits at t=4.
    o, d = _rays(([0, 0, -5], [0, 0, 1]))
    c = jnp.asarray([[0.0, 0.0, 0.0]])
    r = jnp.asarray([1.0])
    m = jnp.asarray([1.0])
    t = ray_sphere_all(o, d, c, r, m, t_clip=1.0)
    assert np.allclose(t, 4.0)


def test_sphere_unnormalized_direction_scales_t():
    # Same geometry, direction scaled 2x -> t halves (a = dot(d,d) handling,
    # reference src/utils.h:116).
    o, d = _rays(([0, 0, -5], [0, 0, 2]))
    t = ray_sphere_all(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]),
                       jnp.asarray([1.0]), t_clip=1.0)
    assert np.allclose(t, 2.0)


def test_sphere_near_clip_t_le_1():
    # Hit at t=0.5 rejected by the parity clip (src/utils.h:173) but
    # accepted in clean mode.
    o, d = _rays(([0, 0, -1.5], [0, 0, 1]))
    c, r, m = jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]), jnp.asarray([1.0])
    t_par = ray_sphere_all(o, d, c, r, m, t_clip=1.0)
    t_cln = ray_sphere_all(o, d, c, r, m, t_clip=1e-4)
    assert np.isinf(np.asarray(t_par)).all()
    assert np.allclose(t_cln, 0.5)


def test_sphere_inside_returns_inf():
    # Camera inside the sphere: t2 < 0 < t1, reference smallest_root's dead
    # t1<t2 branch means it returns INF (no hit) — SURVEY quirk.
    o, d = _rays(([0, 0, 0], [0, 0, 1]))
    t = ray_sphere_all(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([2.0]),
                       jnp.asarray([1.0]), t_clip=1e-4)
    assert np.isinf(np.asarray(t)).all()


def test_sphere_mask_blocks_padding():
    o, d = _rays(([0, 0, -5], [0, 0, 1]))
    t = ray_sphere_all(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]),
                       jnp.asarray([0.0]), t_clip=1.0)
    assert np.isinf(np.asarray(t)).all()


def test_nearest_sphere_first_wins_ties():
    o, d = _rays(([0, 0, -5], [0, 0, 1]))
    c = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    r = jnp.asarray([1.0, 1.0])
    m = jnp.asarray([1.0, 1.0])
    hits = nearest_sphere(o, d, c, r, m, quirks=PARITY)
    assert int(hits.index[0]) == 0


def test_triangle_clean_standard_mt():
    # Triangle in z=0 plane, ray straight through its interior.
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    v1 = jnp.asarray([[1.0, -1.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o, d = _rays(([0, -0.2, -3], [0, 0, 1]))
    t, ok, u, v = ray_triangle_all(o, d, v0, v1, v2, jnp.asarray([1.0]), quirks=CLEAN)
    assert bool(ok[0, 0]) and np.allclose(t[0, 0], 3.0)


def test_triangle_parity_mirrored_u():
    """The reference's u = dot(-(o-v0), p)/det sign flip (src/utils.h:196):
    a hit that standard MT accepts with u > 0 is REJECTED in parity mode,
    and vice versa for the mirrored region."""
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    v1 = jnp.asarray([[1.0, -1.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    m = jnp.asarray([1.0])
    # Interior point biased toward v1 -> standard u strictly positive.
    o, d = _rays(([0.4, -0.5, -3], [0, 0, 1]))
    _, ok_c, u_c, _ = ray_triangle_all(o, d, v0, v1, v2, m, quirks=CLEAN)
    _, ok_p, u_p, _ = ray_triangle_all(o, d, v0, v1, v2, m, quirks=PARITY)
    assert bool(ok_c[0, 0]) and float(u_c[0, 0]) > 0
    assert not bool(ok_p[0, 0])  # mirrored test rejects it
    assert np.allclose(u_p, -u_c)
    # u == 0 (a point on the v0-v2 edge) accepted by both.
    o2, d2 = _rays(([-0.5, 0.0, -3], [0, 0, 1]))
    _, ok_c2, u_c2, _ = ray_triangle_all(o2, d2, v0, v1, v2, m, quirks=CLEAN)
    _, ok_p2, _, _ = ray_triangle_all(o2, d2, v0, v1, v2, m, quirks=PARITY)
    assert bool(ok_c2[0, 0]) and abs(float(u_c2[0, 0])) < 1e-6
    assert bool(ok_p2[0, 0])


def test_triangle_parity_negative_t_accepted():
    # No t>0 check in parity (src/utils.h:211): triangle BEHIND the ray
    # origin still "hits" with negative t.
    v0 = jnp.asarray([[-1.0, -1.0, 5.0]])
    v1 = jnp.asarray([[1.0, -1.0, 5.0]])
    v2 = jnp.asarray([[0.0, 1.0, 5.0]])
    m = jnp.asarray([1.0])
    # (-1, 0) lies in the parity-accepted MIRRORED region (standard
    # u = -0.25, so the sign-flipped u = +0.25 passes the [0,1] test).
    o, d = _rays(([-1, 0, 10], [0, 0, 1]))  # triangle is behind
    hits_p = nearest_triangle(o, d, v0, v1, v2, m, quirks=PARITY)
    hits_c = nearest_triangle(o, d, v0, v1, v2, m, quirks=CLEAN)
    assert bool(hits_p.hit[0]) and float(hits_p.t[0]) == -5.0
    assert not bool(hits_c.hit[0])
