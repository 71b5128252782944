"""Headline benchmark: spheres2.scn at 1920x1080, Monte-Carlo gillum=16.

Mirrors the reference's benchmarked configuration (reference README.md:51,
src/time_notes:4: gillum 16 + shadows, "1920x1080", 6m16.81s on a 4-core
2.5 GHz laptop with OpenMP) and reports rays/sec/chip for the forward
render plus the forward+backward (gradient wrt every scene parameter)
step, which the reference cannot do at all.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}
vs_baseline = our forward rays/s on one chip divided by the reference's
effective rays/s for the same nominal config.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: the 1080p forward/backward programs take
# minutes to compile through this environment's remote-compile tunnel but
# are stable across runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.models.renderer import render_radiance
from skele_raytracer_tpu.models.train import full_loss
from skele_raytracer_tpu.scene.parser import parse_scene

# Reference numbers (BASELINE.md): spheres2 gillum=16 + shadows took
# 376.81 s at the README's claimed 1920x1080. Effective shade evaluations
# per frame at the benchmarked depth (the timed path hardcoded max_depth=1,
# reference src/main.cpp:23, where each of the 16 gillum paths costs one
# child shade that immediately terminates): pixels * (1 + 16).
REF_SECONDS = 376.81
W, H, PATHS, DEPTH = 1920, 1080, 16, 2
RAYS_PER_FRAME = W * H * (1 + PATHS * (DEPTH - 1))
REF_RAYS_PER_SEC = W * H * (1 + 16) / REF_SECONDS


def _sync(x):
    """Force execution to actually finish: on this TPU backend
    block_until_ready can return before the program completes, so read a
    tiny slice back to the host (cheap, but gated on completion)."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def _time(fn, *args, iters=3):
    _sync(fn(*args))  # compile + warm caches
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_dragon():
    """Triangle-mesh configs (scenes/dragon.scn, 10,002 triangles) through
    the cluster-culled Pallas kernels — the capability the reference serves
    with a brute-force per-ray scan (src/raytrace.h:170-187; no reference
    timings exist for dragon, so no vs_baseline here). 640x480 matches the
    reference's actually-shipped --parallel resolution (src/main.cpp:21-24).
    """
    from skele_raytracer_tpu.config import CLEAN

    parsed = parse_scene("scenes/dragon.scn")
    out = []
    for name, quirks, mc in (
        ("dragon 640x480 parity shadows depth2", None, False),
        ("dragon 640x480 clean shadows depth2", CLEAN, False),
        ("dragon 640x480 clean shadows gillum16 depth2", CLEAN, True),
    ):
        cfg = RenderConfig(
            width=640, height=480, max_depth=2, use_shadows=True,
            monte_carlo=mc, num_paths=16 if mc else 1,
            backend="pallas", rays_per_chunk=1 << 17,
            **({"quirks": quirks} if quirks else {}),
        )
        scene = parsed.to_scene(cfg.quirks)
        fwd = jax.jit(lambda s, k, c=cfg: render_radiance(s, c, k))
        t = _time(fwd, scene, jnp.uint32(0))
        rays = 640 * 480 * (1 + (16 if mc else 0))
        out.append(
            {"config": name, "s_per_frame": round(t, 4),
             "rays_per_sec": round(rays / t)}
        )
    return out


def main() -> None:
    scene = parse_scene("scenes/spheres2.scn").to_scene()
    # Both directions ride the whole-frame path-trace Pallas kernel
    # (ops/pallas/pathtrace.py): the forward is one pallas_call per
    # frame; the backward replays shading from the kernel's saved
    # per-bounce hit records (custom_vjp) — no re-intersection.
    cfg = RenderConfig(
        width=W,
        height=H,
        monte_carlo=True,
        num_paths=PATHS,
        max_depth=DEPTH,
        use_shadows=True,
        rays_per_chunk=1 << 17,
        backend="pallas",
    )
    key = jnp.uint32(0)

    fwd = jax.jit(lambda s, k: render_radiance(s, cfg, k))
    t_fwd = _time(fwd, scene, key)

    target = jnp.zeros((H, W, 3), jnp.float32)
    fwdbwd = jax.jit(jax.grad(lambda s, k: full_loss(s, cfg, k, target)))
    t_fwdbwd = _time(fwdbwd, scene, key)

    # 4K scaling point: the fixed host<->device round-trip (~28 ms through
    # this container) dominates at 1080p; at 4x the rays the kernel's
    # device throughput shows through.
    cfg4k = cfg.replace(width=3840, height=2160)
    fwd4k = jax.jit(lambda s, k: render_radiance(s, cfg4k, k))
    t_4k = _time(fwd4k, scene, key)

    # Sustained serving throughput: K frames (distinct seeds) inside ONE
    # jitted program (lax.map), reduced to per-frame means so readback is
    # negligible. This amortizes the fixed dispatch+readback latency the
    # single-frame number pays per call — the honest device-rate figure
    # for a render service pipelining frames (measured: pipelining
    # separate dispatches does NOT amortize the tunnel round trip; frames
    # must share one program).
    K_SUS = 16
    sustained = jax.jit(
        lambda s, seeds: jax.lax.map(
            lambda k: jnp.mean(render_radiance(s, cfg, k), axis=(0, 1)),
            seeds,
        )
    )
    seeds = jnp.arange(K_SUS, dtype=jnp.uint32)
    t_sus = _time(sustained, scene, seeds) / K_SUS

    dragon = _bench_dragon()
    dragon.append(
        {"config": "spheres2 3840x2160 parity gillum16 shadows",
         "s_per_frame": round(t_4k, 4),
         "rays_per_sec": round(3840 * 2160 * 17 / t_4k)}
    )

    # Speed-of-light accounting (utils/roofline.py): analytic FLOPs +
    # minimal-HBM model of the headline frame vs TPU v5e peaks.
    from skele_raytracer_tpu.utils import roofline

    s_pad = int(scene.spheres.mask.shape[0])
    model = roofline.frame_model(
        width=W, height=H, paths=PATHS, depth=DEPTH, s_pad=s_pad
    )
    sol = roofline.sol_summary(model, t_fwd)

    rays_fwd = RAYS_PER_FRAME / t_fwd
    rays_fwdbwd = RAYS_PER_FRAME / t_fwdbwd
    print(
        json.dumps(
            {
                "metric": "spheres2 1080p gillum16+shadows fwd rays/sec/chip",
                "value": round(rays_fwd),
                "unit": "rays/s",
                "vs_baseline": round(rays_fwd / REF_RAYS_PER_SEC, 2),
                "fwd_s_per_frame": round(t_fwd, 4),
                "fwdbwd_s_per_frame": round(t_fwdbwd, 4),
                "fwdbwd_rays_per_sec": round(rays_fwdbwd),
                "sustained_s_per_frame": round(t_sus, 4),
                "sustained_rays_per_sec": round(RAYS_PER_FRAME / t_sus),
                "sol": sol,
                "configs": dragon,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
