"""Bounce-major orchestrator (models/meshtrace.py) equals the sample-major
wavefront on mesh MC configs — same RNG streams, same kernels, different
schedule — and stays differentiable through its custom_vjp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skele_raytracer_tpu.config import CLEAN, RenderConfig
from skele_raytracer_tpu.models import meshtrace
from skele_raytracer_tpu.models.renderer import (
    render_ids_chunked,
    render_ids_chunked_jnp,
)

from conftest import assert_images_close, make_mesh_scene


def _cfg(**kw):
    base = dict(
        width=48, height=36, max_depth=2, use_shadows=True,
        monte_carlo=True, num_paths=4, backend="pallas",
        rays_per_chunk=1 << 10, quirks=CLEAN, bounce_major=True,
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def mesh_scene():
    return make_mesh_scene(t=300)


def test_gate(mesh_scene):
    cfg = _cfg()
    assert meshtrace.use_meshtrace(mesh_scene, cfg, 48 * 36)
    # opt-in only; jnp backend, non-MC, and depth-1 configs stay sample-major
    assert not meshtrace.use_meshtrace(
        mesh_scene, cfg.replace(bounce_major=False), 48 * 36
    )
    assert not meshtrace.use_meshtrace(
        mesh_scene, cfg.replace(backend="jnp"), 48 * 36
    )
    assert not meshtrace.use_meshtrace(
        mesh_scene, cfg.replace(monte_carlo=False), 48 * 36
    )
    assert not meshtrace.use_meshtrace(
        mesh_scene, cfg.replace(max_depth=1), 48 * 36
    )


@pytest.mark.parametrize("depth", [2, 3])
def test_matches_sample_major(mesh_scene, depth):
    """The bounce-major schedule renders the same image as the chunked
    sample-major path (identical RNG keying; order-independent kernels)."""
    cfg = _cfg(max_depth=depth)
    n = cfg.width * cfg.height
    ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.uint32(7)
    want = jax.jit(
        lambda s: render_ids_chunked_jnp(s, cfg, seed, ids)
    )(mesh_scene)
    got = jax.jit(
        lambda s: meshtrace.meshtrace_ids(s, cfg, seed, ids)
    )(mesh_scene)
    assert_images_close(got, want, atol=5e-4, rtol=5e-4,
                        what=f"meshtrace depth={depth}")


def test_dispatch_routes_meshtrace(mesh_scene, monkeypatch):
    """render_ids_chunked routes eligible configs through meshtrace_ids."""
    cfg = _cfg()
    called = {}
    orig = meshtrace.meshtrace_ids

    def spy(scene, c, seed, ids):
        called["yes"] = True
        return orig(scene, c, seed, ids)

    monkeypatch.setattr(meshtrace, "meshtrace_ids", spy)
    ids = jnp.arange(256, dtype=jnp.uint32)
    render_ids_chunked(mesh_scene, cfg, jnp.uint32(0), ids)
    assert called.get("yes")


def test_parity_quirks_all_paths_dead(mesh_scene):
    """Parity mode on a (nearly) sphere-free mesh: triangles shade black
    (src/raytrace.h:221-224) so almost every continuation path is dead —
    the cond-skipped schedule must still match the sample-major path."""
    cfg = RenderConfig(
        width=32, height=24, max_depth=2, use_shadows=True,
        monte_carlo=True, num_paths=4, backend="pallas",
        rays_per_chunk=1 << 10,
    )
    n = cfg.width * cfg.height
    ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.uint32(3)
    want = jax.jit(
        lambda s: render_ids_chunked_jnp(s, cfg, seed, ids)
    )(mesh_scene)
    got = jax.jit(
        lambda s: meshtrace.meshtrace_ids(s, cfg, seed, ids)
    )(mesh_scene)
    assert_images_close(got, want, atol=5e-4, rtol=5e-4, what="parity mesh")


def test_grad_matches_jnp_path(mesh_scene):
    """custom_vjp backward == gradient of the sample-major jnp path."""
    cfg = _cfg(num_paths=2)
    ids = jnp.arange(256, dtype=jnp.uint32)
    seed = jnp.uint32(1)

    def loss_mt(s):
        return jnp.sum(meshtrace.meshtrace_ids(s, cfg, seed, ids) ** 2)

    def loss_jnp(s):
        return jnp.sum(render_ids_chunked_jnp(s, cfg, seed, ids) ** 2)

    g_mt = jax.jit(jax.grad(loss_mt))(mesh_scene)
    g_jnp = jax.jit(jax.grad(loss_jnp))(mesh_scene)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_mt), jax.tree_util.tree_leaves(g_jnp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
