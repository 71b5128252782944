"""render_frames: the one-program multi-frame serving entry point."""

import numpy as np

import jax.numpy as jnp

from skele_raytracer_tpu.config import RenderConfig


def test_render_frames_matches_per_seed_renders(parsed_test_scene):
    """render_frames (one program, K frames) must produce exactly the
    frames render() produces seed by seed — the batch is a scheduling
    change, never a semantic one."""
    from skele_raytracer_tpu.models.renderer import render, render_frames

    scene = parsed_test_scene.to_scene()
    cfg = RenderConfig(width=24, height=16, monte_carlo=True, num_paths=2,
                       max_depth=2, use_shadows=True, rays_per_chunk=1 << 9)
    seeds = jnp.arange(3, dtype=jnp.uint32)
    batch = np.asarray(render_frames(scene, cfg, seeds))
    assert batch.shape == (3, 16, 24, 3)
    for k in range(3):
        single = np.asarray(render(scene, cfg, seed=k))
        np.testing.assert_array_equal(batch[k], single)
