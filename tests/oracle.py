"""Serial NumPy oracle: the reference's REACHABLE semantics, per pixel.

An independent, loop-based re-implementation of the reference CPU tracer's
reachable behavior (the role the reference itself cannot play: it has no
tests, SURVEY.md §4), used to validate the vectorized JAX renderer. It
mirrors, scalar for scalar:

* camera math + diagonal jitter        (src/main.cpp:40-83)
* smallest_root / t<=1 near clip       (src/utils.h:87-121,169-179)
* the sign-flipped Möller-Trumbore     (src/utils.h:181-213)
* Blinn-Phong ambient/diffuse/specular with 1/d^2 falloff and
  camera-position view vector          (src/blinn_phong.h:13-135)
* sphere-only shadows with scalar-epsilon origins (src/utils.h:42-76)
* fog control-flow rerouting           (src/blinn_phong.h:56-66,104-110)
* the Monte-Carlo estimator with the buggy tangent frame
  (src/raytrace.h:107-136, src/utils.h:148-165) restructured to linear
  continuation paths — the same estimator the JAX integrator implements
  (see models/integrator.py docstring for the depth<=2 equivalence proof)
* triangle-hits-shade-black, miss-returns-background (src/raytrace.h:190-224)

Randoms are drawn from the same threefry streams as the production
renderer (keyed on (seed, ray_id, bounce, purpose)), so images must match
to float32 tolerance, not just statistically.
"""

from __future__ import annotations

import math

import numpy as np

from skele_raytracer_tpu.ops import sampling
from skele_raytracer_tpu.scene.types import padded_size

INF = float("inf")


def _uniform(base_key, ray_id, bounce, purpose, shape=()):
    # Same counter-based threefry streams as the production renderer
    # (sampling.uniform), via its NumPy mirror — bit-identical.
    return sampling.uniform_np(base_key, [ray_id], bounce, purpose, shape)[0]


def _norm(v):
    return math.sqrt(float(np.dot(v, v)))


def _normalize(v):
    n = _norm(v)
    return v / n if n > 0 else v * 0.0


def _smallest_root_t(o, d, center, radius):
    """collision_distance + smallest_root (src/utils.h:87-121): for a>0 the
    reference returns t2 if t2 >= 0 else INF."""
    ec = o - center
    a = float(np.dot(d, d))
    b = 2.0 * float(np.dot(d, ec))
    c = float(np.dot(ec, ec)) - radius * radius
    disc = b * b - 4.0 * a * c
    if disc < 0:
        return INF
    t2 = (-b - math.sqrt(disc)) / (2.0 * a)
    return t2 if t2 >= 0 else INF


def _sphere_hit_t(o, d, center, radius):
    """intersection_occurs' t<=1 clip (src/utils.h:169-179)."""
    t = _smallest_root_t(o, d, center, radius)
    return t if (t != INF and t > 1.0) else INF


def _triangle_t(o, d, v0, v1, v2):
    """Reference triangle test (src/utils.h:181-213), incl. the u sign flip
    and missing t>0 check. Returns t or None."""
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = float(np.dot(e1, p))
    if abs(det) < 1e-5:
        return None
    inv = 1.0 / det
    tvec = o - v0
    u = float(np.dot(-tvec, p)) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(tvec, e1)
    v = float(np.dot(d, q)) * inv
    if v < 0 or u + v > 1:
        return None
    return float(np.dot(e2, q)) * inv


def _shadowed(parsed, point, light_dir_unnorm):
    """shadow() (src/utils.h:42-76): origin +1e-6 per component, normalized
    direction, spheres only, t>1 predicate, no max-t bound."""
    o = point + 1e-6
    d = _normalize(light_dir_unnorm)
    for s in parsed.spheres:
        if _sphere_hit_t(o, d, np.array(s["center"], np.float64), s["radius"]) != INF:
            return True
    return False


def _fog_term(parsed, mat, prim_center, l, x, n, lp, lcol, fog_u, pad_f):
    """spherical_fog_shading summed over fog volumes (src/blinn_phong.h:19-44).
    fog_u: [pad_f, 4] uniforms for this (ray, light) and pass."""
    total = np.zeros(3)
    for fi, fog in enumerate(parsed.fog):
        center = np.array(fog["center"], np.float64)
        dist = _norm(prim_center - lp)
        dist = min(dist, 2.0 * fog["radius"])
        p_no = math.exp(-dist * (fog["absorption"] + fog["scattering"]))
        if fog_u[fi, 0] > p_no:
            d_lx = _norm(lp - x)
            intensity = 1.0 / max(d_lx * d_lx, 1e-30)
            total += mat["diffuse"] * lcol * intensity * max(0.0, float(np.dot(n, l)))
        else:
            offs = fog_u[fi, 1:4] * 2.0 - 1.0
            new_l = l + fog["scattering"] * offs
            total += np.array(fog["albedo"]) * lcol * max(0.0, float(np.dot(n, new_l)))
    return total


def _direct(parsed, cfg, x, n, mat, prim_center, cam_pos, fog_u):
    """direct_illumination's reachable body (src/raytrace.h:36-44) +
    bp:: terms (src/blinn_phong.h)."""
    ambient = np.array(parsed.ambient) * mat["ambient"]
    total = ambient.copy()
    has_fog = len(parsed.fog) > 0
    view = _normalize(cam_pos - x)

    for li, light in enumerate(parsed.point_lights):
        lp = np.array(light["position"], np.float64)
        lcol = np.array(light["colour"], np.float64)
        lvec = lp - x
        if cfg.use_shadows and _shadowed(parsed, x, lvec):
            continue
        l = _normalize(lvec)
        if has_fog:
            total += _fog_term(parsed, mat, prim_center, l, x, n, lp, lcol,
                               fog_u[li, :, :, 0], len(parsed.fog))
            total += _fog_term(parsed, mat, prim_center, l, x, n, lp, lcol,
                               fog_u[li, :, :, 1], len(parsed.fog))
        else:
            dist = _norm(lvec)
            intensity = 1.0 / max(dist * dist, 1e-30)
            ndotl = max(0.0, float(np.dot(n, l)))
            total += mat["diffuse"] * lcol * intensity * ndotl
            h = view + l
            hn = _norm(h)
            h = h / hn if hn > 0 else h * 0.0
            ndoth = max(0.0, float(np.dot(n, h)))
            spec = ndoth ** mat["power"] if ndoth > 0 else 0.0
            total += mat["specular"] * lcol * intensity * spec

    # Directional lights are dropped by the parity parser (quirk §2.9.5);
    # if present (clean-parse oracle runs), mirror bp:: (:81-88,121-133).
    for light in parsed.directional_lights:
        ld = _normalize(np.array(light["direction"], np.float64))
        lcol = np.array(light["colour"], np.float64)
        if cfg.use_shadows and _shadowed(parsed, x, ld):
            continue
        total += mat["diffuse"] * lcol * max(0.0, float(np.dot(n, ld)))
        h = view + ld
        hn = _norm(h)
        h = h / hn if hn > 0 else h * 0.0
        ndoth = max(0.0, float(np.dot(n, h)))
        spec = ndoth ** mat["power"] if ndoth > 0 else 0.0
        total += mat["specular"] * lcol * spec
    return total


def _tangent_frame(n):
    """transform_coordinate_space (src/utils.h:148-165)."""
    if abs(n[0]) > abs(n[1]):
        pn = np.array([n[2], 0.0, -n[0]]) / math.sqrt(n[0] ** 2 + n[2] ** 2)
    else:
        pn = np.array([0.0, -n[2], n[1]]) / math.sqrt(n[1] ** 2 + n[2] ** 2)
    pb = np.cross(n, pn)
    return pn, pb


def _to_world_buggy(s, n):
    """The skewed transform (src/raytrace.h:123-125)."""
    pn, pb = _tangent_frame(n)
    return np.array([
        s[0] * pb[0] + s[1] * n[0] + s[2] * pn[0],
        s[0] * pb[1] + s[1] * n[1] + s[2] * pb[1],
        s[0] * pb[2] + s[1] * n[2] + s[2] * pb[2],
    ])


def _nearest_hit(parsed, o, d):
    """shade()'s nearest-hit search (src/raytrace.h:146-187)."""
    min_t, sphere_i = INF, -1
    for i, s in enumerate(parsed.spheres):
        t = _sphere_hit_t(o, d, np.array(s["center"], np.float64), s["radius"])
        if t < min_t:
            min_t, sphere_i = t, i
    tri_hit = False
    for tri in parsed.triangles:
        t = _triangle_t(o, d, np.array(tri["v0"]), np.array(tri["v1"]), np.array(tri["v2"]))
        if t is not None and t < min_t:
            min_t, tri_hit = t, True
    if tri_hit:
        return "triangle", None, min_t
    if sphere_i >= 0:
        return "sphere", sphere_i, min_t
    return "miss", None, INF


def _fog_uniforms(parsed, base_key, ray_id, bounce):
    if not parsed.fog:
        return None
    pl = padded_size(len(parsed.point_lights), 1)
    pf = padded_size(len(parsed.fog), 1)
    return _uniform(base_key, ray_id, bounce, sampling.PURPOSE_FOG, (pl, pf, 4, 2))


def _trace_path(parsed, cfg, base_key, o, d, path_id, bounce, throughput, cam_pos):
    """Linear MC continuation: bounces `bounce`..max_depth-1 for one path."""
    L = np.zeros(3)
    T = throughput.copy()
    for b in range(bounce, cfg.max_depth):
        kind, idx, t = _nearest_hit(parsed, o, d)
        if kind == "miss":
            L += T * np.array(parsed.background)
            break
        if kind == "triangle":
            break  # black, no continuation (src/raytrace.h:221-224)
        s = parsed.spheres[idx]
        center = np.array(s["center"], np.float64)
        x = o + d * t
        n = _normalize(x - center)
        mat = {k: np.array(s[k]) if isinstance(s[k], (tuple, list)) else s[k]
               for k in ("ambient", "diffuse", "specular", "power")}
        fog_u = _fog_uniforms(parsed, base_key, path_id, b)
        direct = _direct(parsed, cfg, x, n, mat, center, cam_pos, fog_u)
        L += T * (direct / math.pi) * mat["diffuse"]
        # Continuation (montecarlo_global_illumination per-path body).
        r = _uniform(base_key, path_id, b, sampling.PURPOSE_PATH, (2,))
        r1, r2 = float(r[0]), float(r[1])
        s_theta = math.sqrt(max(1.0 - r1 * r1, 0.0))
        phi = 2.0 * math.pi * r2
        smp = np.array([s_theta * math.cos(phi), r1, s_theta * math.sin(phi)])
        d = _to_world_buggy(smp, n)
        o = x + 1e-5  # scalar add (src/raytrace.h:128)
        T = T * (2.0 * math.pi * r1) * mat["diffuse"]
    return L


def render_oracle(parsed, cfg, seed=0):
    """Render [H, W, 3] float64 with the parity semantics. `parsed` must be
    pre-transformed for parity (directional lights dropped, fog zeroed) —
    use oracle_parity_view()."""
    base_key = np.uint32(seed)
    H, W = cfg.height, cfg.width
    spp = cfg.samples_per_pixel
    P = cfg.paths_per_sample
    cam_pos = np.array(parsed.camera_position, np.float64)
    cam_dir = np.array(parsed.camera_direction, np.float64)
    cam_up = np.array(parsed.camera_up, np.float64)
    right = np.cross(-cam_dir, cam_up)
    inv_w, inv_h = 1.0 / W, 1.0 / H
    aspect = W / float(H)
    angle = math.tan(math.pi * 0.5 * cfg.fov / 180.0)

    img = np.zeros((H, W, 3))
    for y in range(H):
        for x in range(W):
            pixel = y * W + x
            acc = np.zeros(3)
            for s in range(spp):
                sid = pixel * spp + s
                if cfg.grid_size > 0:
                    r = float(_uniform(base_key, sid, 0, sampling.PURPOSE_JITTER))
                    jx = jy = r
                else:
                    jx = jy = 0.5
                u = (2.0 * ((x + jx) * inv_w) - 1.0) * angle * aspect
                v = (1.0 - 2.0 * ((y + jy) * inv_h)) * angle
                d = cam_dir + u * right + v * cam_up  # unnormalized
                o = cam_pos.copy()

                kind, idx, t = _nearest_hit(parsed, o, d)
                if kind == "miss":
                    acc += np.array(parsed.background)
                    continue
                if kind == "triangle":
                    continue  # black
                sph = parsed.spheres[idx]
                center = np.array(sph["center"], np.float64)
                xpt = o + d * t
                n = _normalize(xpt - center)
                mat = {k: np.array(sph[k]) if isinstance(sph[k], (tuple, list)) else sph[k]
                       for k in ("ambient", "diffuse", "specular", "power")}
                fog_u = _fog_uniforms(parsed, base_key, sid, 0)
                direct = _direct(parsed, cfg, xpt, n, mat, center, cam_pos, fog_u)

                if not cfg.monte_carlo:
                    acc += direct
                    continue

                l0 = (direct / math.pi) * mat["diffuse"]
                if cfg.max_depth <= 1:
                    acc += l0
                    continue
                indirect = np.zeros(3)
                for p in range(P):
                    pid = sid * P + p
                    r = _uniform(base_key, pid, 0, sampling.PURPOSE_PATH, (2,))
                    r1, r2 = float(r[0]), float(r[1])
                    s_theta = math.sqrt(max(1.0 - r1 * r1, 0.0))
                    phi = 2.0 * math.pi * r2
                    smp = np.array([s_theta * math.cos(phi), r1, s_theta * math.sin(phi)])
                    d1 = _to_world_buggy(smp, n)
                    o1 = xpt + 1e-5
                    T1 = (2.0 * math.pi * r1) * mat["diffuse"]
                    indirect += _trace_path(parsed, cfg, base_key, o1, d1, pid, 1, T1, cam_pos)
                acc += l0 + indirect / P
            img[y, x] = acc / spp
    return img


# ---------------------------------------------------------------------------
# CLEAN-mode Whitted oracle
# ---------------------------------------------------------------------------
# Serial re-implementation of the CLEAN semantics the JAX integrator
# documents (models/integrator.py integrate_whitted): the reference's DEAD
# reflection/refraction code (src/raytrace.h:46-103) realized as view-ray
# Whitted tracing, with lit triangles, triangle shadows, normal-offset
# origins, stratified jitter, normalized primary dirs, t > CLEAN_T_EPS
# clips, and per-branch RNG streams (reflection child id*2, refraction
# child id*2+1). Used by tests/test_render_parity.py's clean cases.

from skele_raytracer_tpu.config import CLEAN_T_EPS  # noqa: E402


def _sphere_t_clean(o, d, center, radius):
    t = _smallest_root_t(o, d, center, radius)
    return t if (t != INF and t > CLEAN_T_EPS) else INF


def _triangle_t_clean(o, d, v0, v1, v2):
    """Standard Möller-Trumbore with t > CLEAN_T_EPS (ops/geometry.py
    ray_triangle_all, clean branch)."""
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = float(np.dot(e1, p))
    if abs(det) < 1e-5:
        return None
    inv = 1.0 / det
    tvec = o - v0
    u = float(np.dot(tvec, p)) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(tvec, e1)
    v = float(np.dot(d, q)) * inv
    if v < 0 or u + v > 1:
        return None
    t = float(np.dot(e2, q)) * inv
    return t if t > CLEAN_T_EPS else None


def _nearest_hit_clean(parsed, o, d):
    min_t, kind, idx = INF, "miss", None
    for i, s in enumerate(parsed.spheres):
        t = _sphere_t_clean(o, d, np.array(s["center"], np.float64), s["radius"])
        if t < min_t:
            min_t, kind, idx = t, "sphere", i
    for i, tri in enumerate(parsed.triangles):
        t = _triangle_t_clean(
            o, d, np.array(tri["v0"]), np.array(tri["v1"]), np.array(tri["v2"])
        )
        # triangle wins only with strictly smaller t (src/raytrace.h:176-186)
        if t is not None and t < min_t:
            min_t, kind, idx = t, "triangle", i
    return kind, idx, min_t


def _offset_origin(point, normal, sign=1.0):
    """ops/geometry.offset_origin: epsilon scaled with |point|."""
    scale = CLEAN_T_EPS * (1.0 + _norm(point))
    return point + sign * scale * normal


def _shadowed_clean(parsed, point, normal, light_dir_unnorm, max_dist=None):
    """Clean shadow query (ops/shading._shadow_mask, quirks off): origin
    offset along the normal, t > CLEAN_T_EPS, point lights bounded by the
    light distance, spheres AND triangles occlude."""
    o = _offset_origin(point, normal)
    d = _normalize(light_dir_unnorm)
    for s in parsed.spheres:
        t = _sphere_t_clean(o, d, np.array(s["center"], np.float64), s["radius"])
        if t != INF and (max_dist is None or t < max_dist):
            return True
    for tri in parsed.triangles:
        t = _triangle_t_clean(
            o, d, np.array(tri["v0"]), np.array(tri["v1"]), np.array(tri["v2"])
        )
        if t is not None and (max_dist is None or t < max_dist):
            return True
    return False


def _direct_clean(parsed, cfg, x, n, mat, prim_center, cam_pos, fog_u):
    """Clean direct illumination: same bp:: terms, clean shadow query,
    directional lights kept, fog reroute honored with REAL parameters."""
    total = np.array(parsed.ambient) * mat["ambient"]
    has_fog = len(parsed.fog) > 0
    view = _normalize(cam_pos - x)

    for li, light in enumerate(parsed.point_lights):
        lp = np.array(light["position"], np.float64)
        lcol = np.array(light["colour"], np.float64)
        lvec = lp - x
        dist = _norm(lvec)
        if cfg.use_shadows and _shadowed_clean(parsed, x, n, lvec, max_dist=dist):
            continue
        l = _normalize(lvec)
        if has_fog:
            total += _fog_term(parsed, mat, prim_center, l, x, n, lp, lcol,
                               fog_u[li, :, :, 0], len(parsed.fog))
            total += _fog_term(parsed, mat, prim_center, l, x, n, lp, lcol,
                               fog_u[li, :, :, 1], len(parsed.fog))
        else:
            intensity = 1.0 / max(dist * dist, 1e-30)
            ndotl = max(0.0, float(np.dot(n, l)))
            total += mat["diffuse"] * lcol * intensity * ndotl
            h = view + l
            hn = _norm(h)
            h = h / hn if hn > 0 else h * 0.0
            ndoth = max(0.0, float(np.dot(n, h)))
            spec = ndoth ** mat["power"] if ndoth > 0 else 0.0
            total += mat["specular"] * lcol * intensity * spec
    for light in parsed.directional_lights:
        ld = _normalize(np.array(light["direction"], np.float64))
        lcol = np.array(light["colour"], np.float64)
        if cfg.use_shadows and _shadowed_clean(parsed, x, n, ld):
            continue
        total += mat["diffuse"] * lcol * max(0.0, float(np.dot(n, ld)))
        h = view + ld
        hn = _norm(h)
        h = h / hn if hn > 0 else h * 0.0
        ndoth = max(0.0, float(np.dot(n, h)))
        spec = ndoth ** mat["power"] if ndoth > 0 else 0.0
        total += mat["specular"] * lcol * spec
    return total


def _fresnel_ref(d, n, ior):
    """bp::fresnel with the reference's Rp denominator (ops/shading.fresnel,
    src/blinn_phong.h:156-184 — kept bug-for-bug even in clean mode)."""
    cosi = float(np.clip(np.dot(d, n), -1.0, 1.0))
    et = ior if cosi > 0 else 1.0
    io = 1.0 if cosi > 0 else ior
    sint = et / (io if io != 0 else 1.0) * math.sqrt(max(1.0 - cosi * cosi, 0.0))
    if sint >= 1.0:
        return 1.0
    cost = math.sqrt(max(1.0 - sint * sint, 0.0))
    cosi = abs(cosi)
    denom = io * cosi + et * cost
    denom = denom if abs(denom) > 1e-30 else 1e-30
    rs = (io * cosi - et * cost) / denom
    rp = (et * cosi - io * cost) / denom
    return (rs * rs + rp * rp) / 2.0


def _refraction_ref(d, n, ior):
    """bp::refraction (src/blinn_phong.h:143-153): zero vector on TIR."""
    dn = float(np.dot(d, n))
    k = 1.0 - ior * ior * (1.0 - dn * dn)
    if k < 0:
        return np.zeros(3)
    return ior * d - (ior * dn + math.sqrt(k)) * n


def _hit_record_clean(parsed, o, d):
    """(kind, material dict, x, n, prim_center) or None on miss."""
    kind, idx, t = _nearest_hit_clean(parsed, o, d)
    if kind == "miss":
        return None
    x = o + d * t
    if kind == "sphere":
        s = parsed.spheres[idx]
        center = np.array(s["center"], np.float64)
        n = _normalize(x - center)
        rec = s
    else:
        tri = parsed.triangles[idx]
        e1 = np.array(tri["v1"]) - np.array(tri["v0"])
        e2 = np.array(tri["v2"]) - np.array(tri["v0"])
        n = _normalize(np.cross(e1, e2))
        if float(np.dot(n, d)) > 0:
            n = -n
        center = x  # fog distance term uses the hit point for triangles
        rec = tri
    mat = {k: np.array(rec[k]) if isinstance(rec[k], (tuple, list)) else rec[k]
           for k in ("ambient", "diffuse", "specular", "power", "ior")}
    return mat, x, n, center


def _whitted(parsed, cfg, base_key, o, d, sid, depth, weight, cam_pos):
    """One frontier node of the clean Whitted trace: local contribution +
    recursion into reflection (stream sid*2) and refraction (sid*2+1)."""
    rec = _hit_record_clean(parsed, o, d)
    if rec is None:
        return weight * np.array(parsed.background)
    mat, x, n, prim_center = rec
    fog_u = _fog_uniforms(parsed, base_key, np.uint32(sid), depth)
    direct = _direct_clean(parsed, cfg, x, n, mat, prim_center, cam_pos, fog_u)
    L = weight * direct
    if depth == cfg.max_depth - 1:
        return L
    d_hat = _normalize(d)
    if not np.any(mat["specular"] != 0.0):
        return L
    fr = _fresnel_ref(d_hat, n, mat["ior"])
    refl_d = d_hat - 2.0 * float(np.dot(d_hat, n)) * n
    refl_w = weight * mat["specular"] * (1.0 - fr)
    L += _whitted(parsed, cfg, base_key, _offset_origin(x, n), refl_d,
                  (sid * 2) & 0xFFFFFFFF, depth + 1, refl_w, cam_pos)
    refr_d = _refraction_ref(d_hat, n, mat["ior"])
    if fr < 1.0 and float(np.dot(refr_d, refr_d)) > 0:
        refr_w = weight * fr
        L += _whitted(parsed, cfg, base_key, _offset_origin(x, n, sign=-1.0),
                      refr_d, (sid * 2 + 1) & 0xFFFFFFFF, depth + 1,
                      refr_w, cam_pos)
    return L


def render_oracle_clean(parsed, cfg, seed=0):
    """Render [H, W, 3] float64 with the CLEAN semantics (quirks all off,
    non-MC Whitted). `parsed` is used as-is: directional lights kept, fog
    parameters real."""
    base_key = np.uint32(seed)
    H, W = cfg.height, cfg.width
    spp = cfg.samples_per_pixel
    cam_pos = np.array(parsed.camera_position, np.float64)
    cam_dir = np.array(parsed.camera_direction, np.float64)
    cam_up = np.array(parsed.camera_up, np.float64)
    right = np.cross(-cam_dir, cam_up)
    inv_w, inv_h = 1.0 / W, 1.0 / H
    aspect = W / float(H)
    angle = math.tan(math.pi * 0.5 * cfg.fov / 180.0)
    g = cfg.grid_size

    img = np.zeros((H, W, 3))
    for y in range(H):
        for x in range(W):
            pixel = y * W + x
            acc = np.zeros(3)
            for s in range(spp):
                sid = pixel * spp + s
                if g > 0:
                    # stratified: sample s covers cell (s // g, s % g)
                    ci, cj = s // g, s % g
                    r2 = _uniform(base_key, sid, 0, sampling.PURPOSE_JITTER, (2,))
                    jx = (cj + float(r2[0])) / g
                    jy = (ci + float(r2[1])) / g
                else:
                    jx = jy = 0.5
                u = (2.0 * ((x + jx) * inv_w) - 1.0) * angle * aspect
                v = (1.0 - 2.0 * ((y + jy) * inv_h)) * angle
                d = _normalize(cam_dir + u * right + v * cam_up)
                acc += _whitted(parsed, cfg, base_key, cam_pos.copy(), d,
                                sid, 0, np.ones(3), cam_pos)
            img[y, x] = acc / spp
    return img


def oracle_parity_view(parsed):
    """Apply the parity parse-time quirks (directional drop §2.9.5, fog
    zeroing stand-in §2.9.6) to a ParsedScene copy for the oracle."""
    import copy

    p = copy.deepcopy(parsed)
    p.directional_lights = []
    p.fog = [
        dict(center=(0.0, 0.0, 0.0), radius=0.0, albedo=(0.0, 0.0, 0.0),
             scattering=0.0, absorption=0.0)
        for _ in p.fog
    ]
    return p
