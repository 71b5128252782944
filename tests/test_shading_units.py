"""Closed-form unit tests for the bp:: shading functions and the Whitted
reflection path (the reference's dead-code intent, exercised in clean mode).
"""

import numpy as np

import jax.numpy as jnp

from skele_raytracer_tpu.config import CLEAN, RenderConfig
from skele_raytracer_tpu.models.renderer import render_radiance
from skele_raytracer_tpu.ops import shading
from skele_raytracer_tpu.scene.types import make_scene

S2 = 1.0 / np.sqrt(2.0)


def test_reflect_direction_closed_form():
    l = jnp.asarray([[S2, -S2, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(shading.reflect_direction(l, n))
    np.testing.assert_allclose(out, [[S2, S2, 0.0]], atol=1e-6)


def test_refraction_ior_one_is_identity():
    d = jnp.asarray([[0.0, -1.0, 0.0], [S2, -S2, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(shading.refraction(d, n, jnp.ones((2,))))
    np.testing.assert_allclose(out, np.asarray(d), atol=1e-6)


def test_refraction_snell_closed_form():
    # Entering a denser medium straight on: unchanged direction.
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(shading.refraction(d, n, jnp.asarray([1.5])))
    # Reference formula (src/blinn_phong.h:143-153) with eta = ior (no
    # inside/outside swap): k = 1 - ior^2 (1 - cos^2) = 1; refr =
    # ior*d - (ior*dn + 1) n = (0, -1.5, 0) - (-1.5 + 1)(0,1,0) = (0,-1,0).
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)


def test_fresnel_normal_incidence_and_grazing():
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    fr = float(shading.fresnel(d, n, jnp.asarray([1.5]))[0])
    # ((1 - 1.5) / (1 + 1.5))^2 = 0.04 at normal incidence.
    assert abs(fr - 0.04) < 1e-4, fr
    d_graze = jnp.asarray([[0.9999, -0.0141, 0.0]])
    fr_g = float(shading.fresnel(d_graze, n, jnp.asarray([1.5]))[0])
    assert fr_g > 0.8, fr_g  # grazing angles reflect nearly everything


def test_fresnel_total_internal_reflection():
    # Leaving a dense medium at a shallow angle: sin(theta_t) > 1 -> fr = 1.
    d = jnp.asarray([[0.9, 0.436, 0.0]])  # cos(d, n) > 0 -> "inside" branch
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    fr = float(shading.fresnel(d, n, jnp.asarray([1.5]))[0])
    assert fr == 1.0, fr


def _mirror_scene(specular):
    return make_scene(
        spheres=[
            dict(center=(0.0, 0.0, 3.0), radius=1.0,
                 ambient=(0, 0, 0), diffuse=(0, 0, 0),
                 specular=(specular,) * 3, transmissive=(0, 0, 0),
                 power=8.0, ior=2.5)
        ],
        camera_position=(0.0, 0.0, 0.0),
        camera_direction=(0.0, 0.0, 1.0),
        camera_up=(0.0, 1.0, 0.0),
        background=(0.2, 0.4, 0.8),
    )


def test_whitted_mirror_reflects_background():
    """A purely specular sphere in front of a colored background: with
    depth 1 (no secondary rays) its silhouette is black; with depth 2 the
    reflection+refraction children return weighted background light —
    realizing the dead-code intent of reference src/raytrace.h:46-103."""
    cfg1 = RenderConfig(width=33, height=33, max_depth=1, quirks=CLEAN,
                        rays_per_chunk=1 << 9)
    cfg2 = cfg1.replace(max_depth=2)
    scene = _mirror_scene(0.9)
    img1 = np.asarray(render_radiance(scene, cfg1, jnp.uint32(0)))
    img2 = np.asarray(render_radiance(scene, cfg2, jnp.uint32(0)))
    c = 16  # center pixel: head-on hit
    np.testing.assert_allclose(img1[c, c], 0.0, atol=1e-6)  # depth-1: black
    assert img2[c, c, 2] > 0.05  # depth-2: reflected/refracted background
    # background pixels identical in both
    np.testing.assert_allclose(img1[0, 0], [0.2, 0.4, 0.8], atol=1e-6)
    np.testing.assert_allclose(img2[0, 0], img1[0, 0], atol=1e-6)
    # zero specular -> no secondary contribution even at depth 2
    img0 = np.asarray(render_radiance(_mirror_scene(0.0), cfg2, jnp.uint32(0)))
    np.testing.assert_allclose(img0[c, c], 0.0, atol=1e-6)


def test_specular_half_vector_highlight():
    """Blinn-Phong specular peaks where the half vector aligns with the
    normal (reference src/blinn_phong.h:90-120): light and camera
    symmetric about the normal -> strong highlight; light moved away ->
    weaker."""
    base = dict(
        spheres=[dict(center=(0.0, 0.0, 5.0), radius=1.0,
                      ambient=(0, 0, 0), diffuse=(0, 0, 0),
                      specular=(1, 1, 1), transmissive=(0, 0, 0),
                      power=32.0, ior=1.0)],
        camera_position=(0.0, 0.0, 0.0),
        camera_direction=(0.0, 0.0, 1.0),
        camera_up=(0.0, 1.0, 0.0),
        background=(0, 0, 0),
    )
    cfg = RenderConfig(width=33, height=33, max_depth=1, quirks=CLEAN,
                       rays_per_chunk=1 << 9)
    on_axis = make_scene(**base, point_lights=[dict(position=(0, 0, 0), colour=(5, 5, 5))])
    off_axis = make_scene(**base, point_lights=[dict(position=(0, 3.5, 0), colour=(5, 5, 5))])
    c = 16
    bright = float(np.asarray(render_radiance(on_axis, cfg, jnp.uint32(0)))[c, c, 0])
    dimmer = float(np.asarray(render_radiance(off_axis, cfg, jnp.uint32(0)))[c, c, 0])
    assert bright > 5 * max(dimmer, 1e-9), (bright, dimmer)
