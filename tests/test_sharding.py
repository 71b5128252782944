"""Device-mesh sharding: invariance, collectives, and the training step.

The reference has no multi-device code at all (SURVEY.md §2.3); these tests
validate the claim that replaces it: ANY partition of the flat ray-id space
over a mesh renders the identical frame (counter-based RNG), and sharded
gradients psum to the single-device values. Runs on the 8-device virtual
CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.models import train
from skele_raytracer_tpu.models.renderer import render_radiance
from skele_raytracer_tpu.parallel.api import (
    factor_mesh,
    loss_and_grad_sharded,
    make_mesh,
    render_radiance_sharded,
)

from conftest import assert_images_close

CFG = RenderConfig(
    width=40,
    height=24,
    grid_size=2,
    monte_carlo=True,
    num_paths=2,
    max_depth=2,
    use_shadows=True,
    rays_per_chunk=1 << 10,
)


@pytest.fixture(scope="module")
def scene(parsed_test_scene):
    return parsed_test_scene.to_scene()


def test_factor_mesh():
    assert factor_mesh(8) == (4, 2)
    assert factor_mesh(1) == (1, 1)
    assert factor_mesh(7) == (7, 1)
    assert factor_mesh(16) == (4, 4)


def test_sharded_render_matches_single_device(scene):
    key = jnp.uint32(3)
    # The RNG itself is bitwise partition-invariant (the counter-based
    # contract sharding is built on) ...
    from skele_raytracer_tpu.ops import sampling

    ids = jnp.arange(CFG.width * CFG.height, dtype=jnp.uint32)
    full = np.asarray(sampling.uniform(key, ids, 1, sampling.PURPOSE_PATH, (2,)))
    parts = np.concatenate([
        np.asarray(sampling.uniform(key, ids[i:i + 97], 1,
                                    sampling.PURPOSE_PATH, (2,)))
        for i in range(0, ids.shape[0], 97)
    ])
    np.testing.assert_array_equal(full, parts[: ids.shape[0]])

    # ... and the full frame matches to a few ulps: per-ray values depend
    # only on that ray's counters, but XLA may fuse/reassociate the
    # shading chain and the supersample mean differently at different
    # shard SHAPES (observed: 0.6% of values off by 1-3 ulps after an
    # RNG-internal refactor). Bitwise identity across shapes is a
    # compiler artifact, not a property the design can promise; the
    # kernel path's partition invariance at FIXED shape stays bitwise
    # (test_pathtrace.TestPartitionInvariance).
    single = np.asarray(render_radiance(scene, CFG, key))
    for n in (8, 4):
        mesh = make_mesh(jax.devices()[:n])
        sharded = np.asarray(render_radiance_sharded(scene, CFG, key, mesh))
        np.testing.assert_allclose(
            single, sharded, rtol=5e-7, atol=1e-7,
            err_msg=f"{n}-device render differs from single-device",
        )


@pytest.mark.slow
def test_sharded_render_mesh_shape_invariance(scene):
    key = jnp.uint32(3)
    a = render_radiance_sharded(scene, CFG, key, make_mesh(jax.devices(), (8, 1)))
    b = render_radiance_sharded(scene, CFG, key, make_mesh(jax.devices(), (2, 4)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_grads_match_single_device(scene):
    key = jnp.uint32(5)
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    mesh = make_mesh(jax.devices())
    # jit is required: the rematerialized (jax.checkpoint) chunk body can't
    # be differentiated eagerly under shard_map.
    fn = jax.jit(
        lambda s, k, t: loss_and_grad_sharded(s, CFG, k, t, mesh)
    )
    loss_s, grad_s = fn(scene, key, target)
    loss_1, grad_1 = jax.value_and_grad(train.full_loss)(scene, CFG, key, target)
    assert np.isclose(float(loss_s), float(loss_1), rtol=1e-5), (loss_s, loss_1)
    flat_s = jax.tree_util.tree_leaves(grad_s)
    flat_1 = jax.tree_util.tree_leaves(grad_1)
    assert len(flat_s) == len(flat_1)
    for a, b in zip(flat_s, flat_1):
        assert_images_close(a, b, atol=1e-5, rtol=1e-3, what="grad leaf")


@pytest.mark.slow
def test_train_step_runs_and_descends(scene):
    tx = train.make_optimizer(5e-3)
    state = train.init_state(scene, tx)
    key = jnp.uint32(0)
    mesh = make_mesh(jax.devices())
    target = render_radiance(scene, CFG, jnp.uint32(9))

    import functools

    step = jax.jit(functools.partial(train.train_step, cfg=CFG, tx=tx, mesh=mesh))
    losses = []
    for _ in range(3):
        state, loss = step(state, key=key, target=target)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 3
