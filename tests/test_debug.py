"""Numerical sanitizer utilities."""

import numpy as np
import pytest

import jax.numpy as jnp

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.utils import debug


def test_checked_render_clean_pass(parsed_test_scene):
    scene = parsed_test_scene.to_scene()
    cfg = RenderConfig(width=16, height=12, use_shadows=True, rays_per_chunk=1 << 8)
    img = debug.checked_render(scene, cfg, seed=0)
    assert np.isfinite(np.asarray(img)).all()


def test_checked_catches_bad_math():
    with pytest.raises(Exception) as e:
        debug.checked(lambda x: x / x, jnp.zeros((4,)))  # 0/0
    msg = str(e.value).lower()
    assert "division" in msg or "nan" in msg


def test_assert_finite():
    debug.assert_finite({"a": jnp.ones((3,))})
    with pytest.raises(FloatingPointError):
        debug.assert_finite({"a": jnp.array([1.0, jnp.nan])}, what="x")
