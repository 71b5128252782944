"""Subprocess worker for tests/test_multihost.py: one process of a
2-process jax.distributed CPU cluster (4 virtual devices each, 8 global).

argv: process_id coordinator_port scn_path out_npy
Renders the shared test scene over the GLOBAL mesh and gathers the frame
on process 0 (parallel/multihost.py is the code under test).
"""

import sys


def main() -> int:
    pid, port, scn_path, out_npy = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4],
    )

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
