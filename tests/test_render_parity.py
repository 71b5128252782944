"""JAX renderer vs the serial NumPy oracle, parity semantics.

This is the framework's core correctness contract (the reference itself has
no tests — SURVEY.md §4): every feature combination the reference's
benchmarked configs exercise (BASELINE.md) is rendered small by both
implementations and compared allclose.
"""

import numpy as np
import pytest

from conftest import assert_images_close
from oracle import oracle_parity_view, render_oracle
from skele_raytracer_tpu import PARITY, RenderConfig, render


def _cfg(**kw):
    base = dict(width=24, height=18, fov=60.0, quirks=PARITY, rays_per_chunk=2048)
    base.update(kw)
    return RenderConfig(**base)


CASES = [
    # (name, config overrides) — mirrors BASELINE.md's config axes.
    ("bp_plain", dict(max_depth=1)),
    ("bp_shadows", dict(max_depth=1, use_shadows=True)),
    ("bp_jsample3", dict(max_depth=1, grid_size=3)),
    ("bp_jsample2_shadows", dict(max_depth=1, grid_size=2, use_shadows=True)),
    ("gillum4_depth1", dict(max_depth=1, monte_carlo=True, num_paths=4)),
    ("gillum3_depth2", dict(max_depth=2, monte_carlo=True, num_paths=3)),
    ("gillum2_depth3", dict(max_depth=3, monte_carlo=True, num_paths=2)),
    ("gillum2_depth2_shadows", dict(max_depth=2, monte_carlo=True, num_paths=2,
                                    use_shadows=True)),
    ("gillum2_depth2_jsample2", dict(max_depth=2, monte_carlo=True, num_paths=2,
                                     grid_size=2)),
    ("fov_off_center", dict(max_depth=1, fov=35.0)),
]


@pytest.mark.parametrize("name,overrides", CASES, ids=[c[0] for c in CASES])
def test_parity_vs_oracle(parsed_test_scene, name, overrides):
    cfg = _cfg(**overrides)
    parity_view = oracle_parity_view(parsed_test_scene)
    expected = render_oracle(parity_view, cfg, seed=7)
    scene = parsed_test_scene.to_scene(PARITY)
    got = render(scene, cfg, seed=7)
    # float32 vectorized vs float64 serial: tolerance covers accumulation
    # order differences only.
    assert_images_close(got, expected, atol=5e-4, rtol=5e-4, what=name)


# ---------------------------------------------------------------------------
# Fog with REAL parameters (reference spherical_fog_shading,
# src/blinn_phong.h:19-44 + scattering_phase_function src/utils.h:216-224)
# ---------------------------------------------------------------------------

FOG_CASES = [
    ("fog_parity_plain", dict(max_depth=1)),
    ("fog_parity_mc", dict(max_depth=2, monte_carlo=True, num_paths=2)),
]


@pytest.mark.parametrize("name,overrides", FOG_CASES, ids=[c[0] for c in FOG_CASES])
def test_fog_parity_vs_oracle(parsed_fog_scene, name, overrides):
    """Parity mode with a spherical_fog line: the sscanf-mismatch quirk
    zeroes the parameters, and the reroute must still KILL the point-light
    diffuse+specular terms (src/blinn_phong.h:56-66,104-110)."""
    cfg = _cfg(**overrides)
    parity_view = oracle_parity_view(parsed_fog_scene)
    expected = render_oracle(parity_view, cfg, seed=5)
    got = render(parsed_fog_scene.to_scene(PARITY), cfg, seed=5)
    assert_images_close(got, expected, atol=5e-4, rtol=5e-4, what=name)


def test_fog_parity_reroute_kills_point_lights(parsed_test_scene, parsed_fog_scene):
    """Same scene ± the fog line, parity mode: the zeroed-fog reroute must
    CHANGE the image (diffuse+specular vanish; ambient+background remain)."""
    cfg = _cfg(max_depth=1, use_shadows=True)
    no_fog = np.asarray(render(parsed_test_scene.to_scene(PARITY), cfg, seed=2))
    fog = np.asarray(render(parsed_fog_scene.to_scene(PARITY), cfg, seed=2))
    assert not np.allclose(no_fog, fog)
    # On the fogged render every sphere pixel is ambient-only: fog <= no_fog
    # everywhere (removing non-negative diffuse/specular cannot brighten).
    assert (fog <= no_fog + 1e-6).all()


def test_fog_clean_vs_oracle(parsed_fog_scene):
    """CLEAN mode renders fog with the REAL parsed parameters through the
    Whitted integrator; value-level check vs the serial oracle (both fog
    branches fire at these parameters — conftest.TEST_SCN_FOG)."""
    from oracle import render_oracle_clean
    from skele_raytracer_tpu.config import CLEAN

    cfg = _cfg(max_depth=2, quirks=CLEAN, use_shadows=True)
    expected = render_oracle_clean(parsed_fog_scene, cfg, seed=11)
    got = render(parsed_fog_scene.to_scene(CLEAN), cfg, seed=11)
    # Verify the scene exercises BOTH fog branches (interaction and
    # phase-function) — otherwise this test wouldn't cover the subsystem.
    assert expected.std() > 0
    assert_images_close(got, expected, atol=1e-3, rtol=1e-3, what="fog_clean")


# ---------------------------------------------------------------------------
# CLEAN-mode Whitted parity vs the serial oracle (the reference's dead
# reflection/refraction code, src/raytrace.h:46-103, realized for real)
# ---------------------------------------------------------------------------

CLEAN_CASES = [
    ("clean_whitted_depth3_shadows", dict(max_depth=3, use_shadows=True)),
    ("clean_whitted_depth4", dict(max_depth=4)),
    ("clean_tri_shadows_jsample2", dict(max_depth=2, use_shadows=True,
                                        grid_size=2)),
]


@pytest.mark.parametrize("name,overrides", CLEAN_CASES, ids=[c[0] for c in CLEAN_CASES])
def test_clean_vs_oracle(parsed_test_scene, name, overrides):
    from oracle import render_oracle_clean
    from skele_raytracer_tpu.config import CLEAN

    cfg = _cfg(quirks=CLEAN, **overrides)
    expected = render_oracle_clean(parsed_test_scene, cfg, seed=7)
    got = render(parsed_test_scene.to_scene(CLEAN), cfg, seed=7)
    assert_images_close(got, expected, atol=1e-3, rtol=1e-3, what=name)


def test_parity_spheres1(parsed_spheres1):
    """Real reference scene (scenes/spheres1.scn), BP + shadows."""
    cfg = _cfg(width=32, height=24, max_depth=1, use_shadows=True)
    expected = render_oracle(oracle_parity_view(parsed_spheres1), cfg, seed=0)
    got = render(parsed_spheres1.to_scene(PARITY), cfg, seed=0)
    assert_images_close(got, expected, atol=5e-4, rtol=5e-4, what="spheres1")


def test_chunking_invariance(parsed_test_scene):
    """The image must be bitwise identical for any rays_per_chunk — the
    property that makes device sharding safe."""
    scene = parsed_test_scene.to_scene(PARITY)
    base = _cfg(max_depth=2, monte_carlo=True, num_paths=2)
    img_a = np.asarray(render(scene, base.replace(rays_per_chunk=256), seed=3))
    img_b = np.asarray(render(scene, base.replace(rays_per_chunk=4096), seed=3))
    # RNG and per-ray math are bit-identical by construction (counter-based
    # streams); XLA may still tile the per-pixel reductions and the
    # sphere-quadratic matmuls differently for different chunk shapes, so
    # allow a few ulp of radiance.
    np.testing.assert_allclose(img_a, img_b, rtol=0, atol=1e-5)


def test_seed_changes_mc_image(parsed_test_scene):
    scene = parsed_test_scene.to_scene(PARITY)
    cfg = _cfg(max_depth=2, monte_carlo=True, num_paths=2)
    a = np.asarray(render(scene, cfg, seed=0))
    b = np.asarray(render(scene, cfg, seed=1))
    assert not np.allclose(a, b)


def test_deterministic_without_sampling(parsed_test_scene):
    """No jitter, no MC, no fog -> seed must not matter at all."""
    scene = parsed_test_scene.to_scene(PARITY)
    cfg = _cfg(max_depth=1)
    a = np.asarray(render(scene, cfg, seed=0))
    b = np.asarray(render(scene, cfg, seed=99))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_deep_whitted_chunk_scaling(parsed_test_scene):
    """Clean-mode Whitted frontier doubles per depth level; the chunker
    must shrink samples-per-chunk so deep traces stay in memory, without
    changing the image."""
    from skele_raytracer_tpu.config import CLEAN
    from skele_raytracer_tpu.models import renderer

    scene = parsed_test_scene.to_scene(CLEAN)
    cfg = _cfg(max_depth=6, quirks=CLEAN, rays_per_chunk=1 << 12)
    assert renderer._chunk_samples(cfg) <= (1 << 12) // 32
    img_a = np.asarray(render(scene, cfg, seed=1))
    img_b = np.asarray(render(scene, cfg.replace(rays_per_chunk=1 << 14), seed=1))
    np.testing.assert_allclose(img_a, img_b, rtol=0, atol=1e-5)
    assert np.isfinite(img_a).all()
