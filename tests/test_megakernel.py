"""Fused intersect+shadow+shade megakernel vs the jnp reference path.

Interpreter mode on CPU validates the kernel LOGIC (shortlisted primary
streaming, in-kernel shadow culling with conditional DMA, in-VMEM material
extraction, the Blinn-Phong fusion) and the custom_vjp replay backward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skele_raytracer_tpu.config import CLEAN, RenderConfig
from skele_raytracer_tpu.models.integrator import _use_megakernel
from skele_raytracer_tpu.models.renderer import render_radiance
from skele_raytracer_tpu.ops import geometry
from skele_raytracer_tpu.ops.pallas import megakernel as mk
from skele_raytracer_tpu.ops.shading import direct_illumination, gather_material

from conftest import make_mesh_scene


def _dir_scene():
    """Dragon-shaped scene: directional light, NO spheres (masked padding
    only), mesh-scale triangles."""
    from skele_raytracer_tpu.scene.types import make_scene

    rng = np.random.default_rng(3)
    mat = dict(
        ambient=(0.2, 0.2, 0.2), diffuse=(0.7, 0.6, 0.5),
        specular=(0.1, 0.1, 0.1), transmissive=(0, 0, 0), power=4.0, ior=1.0,
    )
    tris = []
    for _ in range(650):
        v0 = rng.uniform(-5, 5, 3)
        tris.append(dict(
            v0=tuple(v0), v1=tuple(v0 + rng.normal(size=3)),
            v2=tuple(v0 + rng.normal(size=3)), **mat,
        ))
    scene = make_scene(
        triangles=tris,
        directional_lights=[dict(direction=(1, -1, -1), colour=(0.8, 0.8, 0.8))],
        ambient=(0.2, 0.2, 0.2),
        camera_position=(0, 0.5, -12), camera_direction=(0, 0, 1),
        camera_up=(0, 1, 0), background=(0.125, 0.5, 1.0),
    )
    # Small cluster size: keep this test-scale mesh above the culled
    # path's n_clusters > 4 gate regardless of the production default.
    from skele_raytracer_tpu.ops import accel

    tr = scene.triangles
    return scene.replace(
        clusters=accel.build_clusters(tr.v0, tr.v1, tr.v2, tr.mask,
                                      cluster_size=64)
    )


def _jnp_reference(scene, cfg, o, d):
    """direct + hit structure via the pure-jnp path (the contract)."""
    hits = geometry.intersect(o, d, scene, quirks=CLEAN, backend="jnp")
    mat = gather_material(scene, hits.kind, hits.index, quirks=CLEAN)
    direct = direct_illumination(
        hits.point, hits.normal, scene, mat, hits.point, cfg, None
    )
    return direct, hits


@pytest.mark.parametrize("scene_fn,shadows", [
    (make_mesh_scene, True), (make_mesh_scene, False), (_dir_scene, True),
], ids=["point_light_shadows", "point_light_noshadow", "directional_shadows"])
def test_fused_shade_matches_jnp(scene_fn, shadows):
    scene = scene_fn()
    cfg = RenderConfig(
        quirks=CLEAN, use_shadows=shadows, backend="pallas",
        fused_megakernel=True,
    )
    assert _use_megakernel(scene, cfg)
    rng = np.random.default_rng(17)
    R = 700
    o = jnp.asarray(rng.uniform(-10, 10, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    direct, t, kind, index, unsh = mk.fused_shade(o, d, scene, shadows)
    ref_direct, ref_hits = _jnp_reference(scene, cfg, o, d)

    kind_np, rkind = np.asarray(kind), np.asarray(ref_hits.kind)
    agree = kind_np == rkind
    assert agree.mean() > 0.99, f"{(~agree).sum()} rays disagree on kind"
    both = agree & (kind_np > 0)
    np.testing.assert_array_equal(
        np.asarray(index)[both], np.asarray(ref_hits.index)[both]
    )
    np.testing.assert_allclose(
        np.asarray(t)[both], np.asarray(ref_hits.t)[both], rtol=1e-3, atol=1e-4
    )
    d_got, d_ref = np.asarray(direct)[both], np.asarray(ref_direct)[both]
    close = np.isclose(d_got, d_ref, rtol=2e-3, atol=2e-4)
    assert close.mean() > 0.995, (
        f"{(~close).sum()} direct entries differ; max "
        f"{np.abs(d_got - d_ref).max()}"
    )


@pytest.mark.parametrize("mc", [False, True], ids=["whitted", "mc"])
def test_megakernel_render_matches_jnp(mc):
    scene = make_mesh_scene()
    cfg = RenderConfig(
        width=20, height=14, use_shadows=True, quirks=CLEAN,
        max_depth=2, monte_carlo=mc, num_paths=2 if mc else 1,
        rays_per_chunk=1 << 9, fused_megakernel=True,
    )
    img_jnp = np.asarray(render_radiance(scene, cfg, jnp.uint32(4)))
    img_mk = np.asarray(
        render_radiance(scene, cfg.replace(backend="pallas"), jnp.uint32(4))
    )
    close = np.isclose(img_jnp, img_mk, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99, f"{(~close).sum()} px differ"


@pytest.mark.slow
def test_megakernel_grad_matches_jnp():
    """custom_vjp replay backward: gradients through the fused path match
    the pure-jnp path on materials and lights (structure-independent) and
    on vertices/origins where hit structures agree."""
    scene = _dir_scene()
    cfg = RenderConfig(
        width=16, height=12, use_shadows=True, quirks=CLEAN, max_depth=1,
        rays_per_chunk=1 << 9, fused_megakernel=True,
    )

    def loss(s, backend):
        img = render_radiance(s, cfg.replace(backend=backend), jnp.uint32(9))
        return jnp.sum(img * img)

    g_jnp = jax.grad(lambda s: loss(s, "jnp"))(scene)
    g_mk = jax.grad(lambda s: loss(s, "pallas"))(scene)
    for field in ("diffuse", "specular", "ambient"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_jnp.triangles, field)),
            np.asarray(getattr(g_mk.triangles, field)),
            rtol=2e-3, atol=1e-5, err_msg=field,
        )
    np.testing.assert_allclose(
        np.asarray(g_jnp.directional_lights.colour),
        np.asarray(g_mk.directional_lights.colour), rtol=2e-3, atol=1e-5,
    )
    gv_jnp = np.asarray(g_jnp.triangles.v0)
    gv_mk = np.asarray(g_mk.triangles.v0)
    assert np.isfinite(gv_mk).all() and np.abs(gv_mk).max() > 0
    close = np.isclose(gv_jnp, gv_mk, rtol=1e-2, atol=1e-4)
    assert close.mean() > 0.98, f"{(~close).sum()} vertex-grad entries differ"


def test_streaming_matches_resident(monkeypatch):
    """The DMA-streaming kernel variant (meshes over RESIDENT_BUDGET_BYTES)
    computes the same outputs as the VMEM-resident one — small test meshes
    always take the resident path, so pin the budget to 0 to force
    streaming and compare."""
    scene = make_mesh_scene()
    rng = np.random.default_rng(3)
    R = 600
    o = jnp.asarray(rng.uniform(-10, 10, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    res = mk.fused_shade(o, d, scene, True)
    monkeypatch.setattr(mk, "RESIDENT_BUDGET_BYTES", 0)
    stream = mk.fused_shade(o, d, scene, True)
    for got, want, name in zip(stream, res, ("direct", "t", "kind", "index", "unsh")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )

    # culled.py reads the same budget (lazy import) — force-check it too
    from skele_raytracer_tpu.ops.pallas.culled import triangle_nearest_culled

    t_s, i_s, h_s = triangle_nearest_culled(o, d, scene.clusters, quirks=CLEAN)
    monkeypatch.undo()
    t_r, i_r, h_r = triangle_nearest_culled(o, d, scene.clusters, quirks=CLEAN)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_r))
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_r), rtol=1e-6)
