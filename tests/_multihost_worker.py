"""Subprocess worker for tests/test_multihost.py: one process of a
2-process jax.distributed CPU cluster (4 virtual devices each, 8 global).

argv: process_id coordinator_port scn_path out_npy [mode]
mode "render" (default): render the scene over the GLOBAL mesh, gather
the frame on process 0 (parallel/multihost.py is the code under test).
mode "train": ONE models/train.train_step over the global mesh — the
gradient psum (the design's single collective, parallel/api.py) crossing
a REAL process boundary; process 0 saves loss + updated scene leaves.
"""

import sys


def main() -> int:
    pid, port, scn_path, out_npy = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "render"

    import jax

    from skele_raytracer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np

    import jax.numpy as jnp

    from skele_raytracer_tpu.config import RenderConfig
    from skele_raytracer_tpu.parallel.api import render_radiance_sharded
    from skele_raytracer_tpu.scene.parser import parse_scene_text

    parsed = parse_scene_text(open(scn_path).read())
    scene = parsed.to_scene()
    cfg = RenderConfig(
        width=24, height=16, use_shadows=True, rays_per_chunk=1 << 9
    )
    mesh = multihost.global_mesh()

    if mode == "train":
        from functools import partial

        from skele_raytracer_tpu.models import train

        tx = train.make_optimizer(1e-2)
        state = train.init_state(scene, tx)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        step_fn = jax.jit(partial(train.train_step, cfg=cfg, tx=tx, mesh=mesh))
        state, loss = step_fn(state, key=jnp.uint32(3), target=target)
        if multihost.is_primary():
            np.savez(
                out_npy,
                loss=np.asarray(loss),
                diffuse=np.asarray(state.scene.spheres.diffuse),
                center=np.asarray(state.scene.spheres.center),
                light=np.asarray(state.scene.point_lights.colour),
            )
        return 0

    img = jax.jit(
        lambda s, k: render_radiance_sharded(s, cfg, k, mesh)
    )(scene, jnp.uint32(0))

    full = multihost.gather_image(img)
    if multihost.is_primary():
        assert full is not None and full.shape == (16, 24, 3)
        np.save(out_npy, full)
    else:
        assert full is None
    return 0


if __name__ == "__main__":
    sys.exit(main())
