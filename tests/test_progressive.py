"""Tiled restartable rendering: identical pixels, resume, retry."""

import pytest
import numpy as np

import jax.numpy as jnp

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.models import progressive
from skele_raytracer_tpu.models.renderer import render_radiance

CFG = RenderConfig(
    width=40, height=30, grid_size=2, monte_carlo=True, num_paths=2,
    max_depth=2, use_shadows=True, rays_per_chunk=1 << 10,
)


@pytest.mark.slow
def test_progressive_matches_oneshot(parsed_test_scene):
    scene = parsed_test_scene.to_scene()
    oneshot = np.asarray(render_radiance(scene, CFG, jnp.uint32(5)))
    banded = progressive.render_progressive(scene, CFG, seed=5, band_rows=7)
    np.testing.assert_allclose(banded, oneshot, rtol=0, atol=1e-6)


def test_progressive_resume(parsed_test_scene, tmp_path):
    scene = parsed_test_scene.to_scene()
    state = str(tmp_path / "render_state.npz")

    calls = []

    def boom_after_two(frame, rows_done):
        calls.append(rows_done)
        if len(calls) == 2:
            raise KeyboardInterrupt  # simulate a crash mid-frame

    try:
        progressive.render_progressive(
            scene, CFG, seed=5, band_rows=7, state_path=state,
            preview_cb=boom_after_two,
        )
    except KeyboardInterrupt:
        pass
    assert len(calls) == 2
    import os

    assert os.path.exists(state)

    # Resume completes the frame and matches a clean one-shot.
    resumed = progressive.render_progressive(
        scene, CFG, seed=5, band_rows=7, state_path=state
    )
    oneshot = np.asarray(render_radiance(scene, CFG, jnp.uint32(5)))
    np.testing.assert_allclose(resumed, oneshot, rtol=0, atol=1e-6)
    assert not os.path.exists(state)  # cleaned up on completion


@pytest.mark.slow
def test_progressive_retry(parsed_test_scene, monkeypatch):
    scene = parsed_test_scene.to_scene()
    real = progressive.render_ids_chunked
    fails = {"n": 0}

    def flaky(*a, **kw):
        if fails["n"] < 2:
            fails["n"] += 1
            raise RuntimeError("transient device error")
        return real(*a, **kw)

    monkeypatch.setattr(progressive, "render_ids_chunked", flaky)
    out = progressive.render_progressive(
        scene, CFG, seed=5, band_rows=15, max_retries=2
    )
    oneshot = np.asarray(render_radiance(scene, CFG, jnp.uint32(5)))
    np.testing.assert_allclose(out, oneshot, rtol=0, atol=1e-6)
    assert fails["n"] == 2
