"""Headline benchmark: spheres2.scn at 1920x1080, Monte-Carlo gillum=16.

Mirrors the reference's benchmarked configuration (reference README.md:51,
src/time_notes:4: gillum 16 + shadows, "1920x1080", 6m16.81s on a 4-core
2.5 GHz laptop with OpenMP) and reports rays/sec/chip for the forward
render plus the forward+backward (gradient wrt every scene parameter)
step, which the reference cannot do at all.

Output protocol (designed so a driver timeout truncates, never erases):
the HEADLINE JSON line (fwd + fwd+bwd) is printed and flushed as soon as
those two timings exist; after each further section completes, the FULL
cumulative JSON is re-printed as a new line. Every printed line is a
complete, parseable JSON object; the last line is the most complete.
Each optional section also has a wall-clock budget — when the global
deadline (BENCH_BUDGET_S, default 1500 s) would be exceeded, the section
is recorded as "skipped" instead of silently hanging the run.
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

# If the accelerator backend is unavailable (e.g. this container's TPU
# tunnel relay died — observed once mid-round), emit ONE honest,
# parseable JSON line saying so instead of producing no artifact at all:
# the driver records bench stdout, and an explicit infrastructure error
# beats an empty capture. Never fabricate numbers. Backend init blocks
# in C when the tunnel is dead (SIGALRM cannot interrupt it), so the
# probe must run in a SUBPROCESS with a kill timeout.
import subprocess
import sys


def _bail(reason: str) -> None:
    print(json.dumps({
        "metric": "spheres2 1080p gillum16+shadows fwd rays/sec/chip",
        "value": 0, "unit": "rays/s", "vs_baseline": 0,
        "error": f"accelerator backend unavailable: {reason}",
        "note": "infrastructure failure (TPU tunnel), not a framework "
                "regression; last good full run is recorded in PERF.md / "
                "README.md benchmark sections",
    }), flush=True)
    sys.exit(0)


try:
    _probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; d = jax.devices(); print(d[0].platform)"],
        capture_output=True, text=True, timeout=120,
    )
except subprocess.TimeoutExpired:
    _bail("backend init hung >120s (tunnel relay dead?)")
if _probe.returncode != 0:
    _bail(f"device probe failed: {_probe.stderr.strip()[-200:]}")

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

_DEADLINE = time.monotonic() + float(os.environ.get("BENCH_BUDGET_S", "1500"))

RESULT: dict = {}


def _remaining() -> float:
    return _DEADLINE - time.monotonic()


def _emit() -> None:
    """Print the full cumulative result as one JSON line (see module doc)."""
    print(json.dumps(RESULT), flush=True)


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


def _section(name: str, budget_s: float, fn) -> None:
    """Run an optional bench section unless the remaining global budget is
    below its estimated need; always emit the cumulative JSON after."""
    if _remaining() < budget_s:
        RESULT.setdefault("skipped", []).append(name)
    else:
        try:
            fn()
        except Exception as e:  # a broken section must not erase the rest
            RESULT.setdefault("errors", {})[name] = repr(e)
    _emit()


def _bench_grad_err(scene) -> None:
    """Pixel-gradient error — the metric BASELINE.json names ("pixel-grad
    max abs err vs ref"): the reference cannot compute gradients, so the
    check is autodiff vs central finite differences on scene leaves at a
    small config (test-scale twin of tests/test_grad.py, here recorded in
    the driver-captured artifact)."""
    import numpy as np

    # spheres1 in CLEAN mode, not the headline spheres2/parity scene:
    # spheres2 carries a spherical_fog that parity's sscanf quirk zeroes,
    # and a zeroed fog reroutes BOTH per-point-light terms to zero
    # (shading.py direct_illumination) — radiance there is ambient-only,
    # piecewise-CONSTANT in geometry, so the true autodiff gradient of
    # centres/positions is 0 and FD sees only silhouette jumps. spheres1
    # clean has no fog: lights actually shade, geometry leaves carry a
    # continuous signal, and the config still routes through the
    # whole-frame Pallas kernel + its analytic backward (use_pathtrace).
    from skele_raytracer_tpu.config import CLEAN

    scene = parse_scene("scenes/spheres1.scn").to_scene(CLEAN)
    cfg = RenderConfig(
        width=96, height=54, monte_carlo=True, num_paths=4, max_depth=2,
        use_shadows=True, rays_per_chunk=1 << 12, quirks=CLEAN,
    )

    def loss_fn(c):
        def loss(s):
            img = render_radiance(s, c, jnp.uint32(7))
            w = jnp.linspace(0.5, 1.5, img.size).reshape(img.shape)
            return jnp.sum(img * w)

        return loss

    loss_j = jax.jit(loss_fn(cfg))
    grad_j = jax.jit(jax.grad(loss_fn(cfg)))
    g = grad_j(scene)

    # (leaf getter, leaf setter path, flat indices to probe, fd eps)
    def leaf(*path):
        def get(s):
            for p in path:
                s = getattr(s, p)
            return s

        def put(s, v):
            def rec(obj, i):
                if i == len(path) - 1:
                    return obj.replace(**{path[i]: v})
                return obj.replace(
                    **{path[i]: rec(getattr(obj, path[i]), i + 1)}
                )

            return rec(s, 0)

        return get, put

    # Three figures, because "gradient error" means three different things
    # for a renderer:
    # 1. smooth leaves (colours, light intensity, background): the pixel
    #    function is differentiable, autodiff must match central FD to
    #    curvature/rounding noise. Validates the backward math end to end.
    # 2. geometry leaves, kernel vs jnp-autodiff oracle: the Pallas
    #    analytic backward against plain XLA autodiff of the same
    #    estimator. Validates the kernel backward implementation on the
    #    leaves FD cannot judge.
    # 3. geometry leaves vs FD (aggregate norm over all real sphere
    #    centres): FD at finite eps also sees visibility-silhouette motion
    #    that interior-point autodiff (stop_gradient'ed hit selection)
    #    cannot — a documented property of differentiable rendering, so
    #    this figure is reported with that caveat, not folded into 1.
    probes = [
        ("spheres.diffuse", leaf("spheres", "diffuse"), (0, 4, 9)),
        ("point_lights.colour", leaf("point_lights", "colour"), (0, 2)),
        ("background", leaf("background",), (0, 2)),
    ]
    eps = 2e-2
    max_rel, worst, n = 0.0, "", 0
    max_err, max_fd = 0.0, 0.0
    for name, (get, put), idxs in probes:
        base = np.asarray(get(scene), np.float64)
        ga = np.asarray(get(g), np.float64).ravel()
        for flat in idxs:
            if flat >= base.size:
                continue
            d = np.zeros(base.size)
            d[flat] = eps
            d = d.reshape(base.shape)
            lp = float(loss_j(put(scene, jnp.asarray(base + d, jnp.float32))))
            lm = float(loss_j(put(scene, jnp.asarray(base - d, jnp.float32))))
            fd = (lp - lm) / (2 * eps)
            err = abs(ga[flat] - fd)
            # central FD on an f32 sum loss carries O(eps^2) curvature +
            # rounding noise, so the meaningful figure is err/|fd|,
            # denominator floored at 1.
            rel = err / max(abs(fd), 1.0)
            if rel > max_rel:
                max_rel, worst = rel, f"{name}[{flat}]"
            n += 1
            max_err = max(max_err, err)
            max_fd = max(max_fd, abs(fd))

    # 2. Pallas analytic backward vs the jnp autodiff oracle on geometry.
    g_oracle = jax.jit(jax.grad(loss_fn(cfg.replace(backend="jnp"))))(scene)
    geo_vs_jnp = 0.0
    for path in (("spheres", "center"), ("spheres", "radius")):
        get, _ = leaf(*path)
        a = np.asarray(get(g), np.float64)
        b = np.asarray(get(g_oracle), np.float64)
        geo_vs_jnp = max(
            geo_vs_jnp, float(np.abs(a - b).max() / max(np.abs(b).max(), 1.0))
        )

    # 3. FD aggregate over every real sphere-centre coordinate.
    get, put = leaf("spheres", "center")
    base = np.asarray(get(scene), np.float64)
    mask = np.asarray(scene.spheres.mask) > 0
    ga = np.asarray(get(g), np.float64)
    fd_all = np.zeros_like(base)
    for i in range(base.shape[0]):
        if not mask[i]:
            continue
        for j in range(base.shape[1]):
            d = np.zeros_like(base)
            d[i, j] = eps
            lp = float(loss_j(put(scene, jnp.asarray(base + d, jnp.float32))))
            lm = float(loss_j(put(scene, jnp.asarray(base - d, jnp.float32))))
            fd_all[i, j] = (lp - lm) / (2 * eps)
            n += 1
    geo_fd_rel = float(
        np.linalg.norm((ga - fd_all)[mask])
        / max(np.linalg.norm(fd_all[mask]), 1e-9)
    )
    max_err = max(max_err, float(np.abs(ga - fd_all)[mask].max()))
    max_fd = max(max_fd, float(np.abs(fd_all[mask]).max()))

    # 4. Fixed-topology FD — the FALSIFIABLE geometry check: freeze every
    #    discrete selection the forward made (hit records + tangent-frame
    #    branch bits) and central-FD the differentiable REPLAY wrt sphere
    #    centres. At fixed topology the pixel function is smooth, so the
    #    production analytic backward (`ga` above — the Pallas backward
    #    kernel, by construction the gradient of this replay at these
    #    records) must match FD allclose. Runs in a CPU/x64 subprocess
    #    (tools/fixed_topology_fd.py): f32 FD noise at safe step sizes is
    #    ~0.5%, swamping the 1e-3 target; f64 removes it without touching
    #    the production f32 paths. Figure 3 keeps the free-FD number as
    #    the documented silhouette caveat; this one has no caveat.
    import subprocess
    import sys
    import tempfile

    from skele_raytracer_tpu.ops.pallas import pathtrace

    ids = jnp.arange(cfg.height * cfg.width, dtype=jnp.uint32)
    _, rec = jax.jit(
        lambda s: pathtrace._pathtrace_call(
            s, cfg, jnp.uint32(7), ids, with_records=True
        )
    )(scene)

    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p]
    )
    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "fix.npz")
        np.savez(npz, rec=np.asarray(rec), ga=ga)
        spec = json.dumps({
            "width": cfg.width, "height": cfg.height, "paths": cfg.num_paths,
            "depth": cfg.max_depth, "chunk": cfg.rays_per_chunk,
            "scene": os.path.join(repo, "scenes/spheres1.scn"), "seed": 7,
        })
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "tools/fixed_topology_fd.py"),
             npz, spec],
            env=env, capture_output=True, text=True, timeout=600,
        )
    fix = json.loads(out.stdout.strip().splitlines()[-1])
    geo_fix_rel = fix["geometry_fixed_topology_fd_rel"]

    RESULT["grad_err"] = {
        "smooth_max_rel_err": round(max_rel, 6),
        "smooth_worst_param": worst,
        "geometry_fixed_topology_fd_rel": round(geo_fix_rel, 6),
        "geometry_kernel_vs_jnp_rel": round(geo_vs_jnp, 6),
        "geometry_fd_norm_rel": round(geo_fd_rel, 4),
        "geometry_note": "fixed_topology is the primary geometry figure: "
        "central FD of the hit-record replay (topology frozen) vs the "
        "analytic backward — smooth by construction, must be allclose. "
        "The free-FD norm_rel additionally sees visibility-silhouette "
        "motion that stop_gradient'ed hit selection cannot (documented "
        "differentiable-rendering caveat)",
        "max_abs_err": round(max_err, 6),
        "max_fd_magnitude": round(max_fd, 4),
        "fd_eps": eps,
        "n_params": n,
        "config": "spheres1 96x54 clean gillum4 depth2 shadows, autodiff vs central FD",
    }


def _bench_sustained(scene, cfg) -> None:
    # Sustained serving throughput: K frames (distinct seeds) inside ONE
    # jitted program (lax.map), each frame reduced ON DEVICE to its mean
    # colour so readback is negligible — this is a device-rate figure that
    # deliberately excludes full-frame readback (a real render service
    # returning frames pays that; the single-dispatch rows above include
    # it). This amortizes the fixed dispatch+readback latency the
    # single-frame number pays per call (measured: pipelining separate
    # dispatches does NOT amortize the tunnel round trip; frames must
    # share one program).
    K_SUS = 16
    sustained = jax.jit(
        lambda s, seeds: jax.lax.map(
            lambda k: jnp.mean(render_radiance(s, cfg, k), axis=(0, 1)),
            seeds,
        )
    )
    seeds = jnp.arange(K_SUS, dtype=jnp.uint32)
    t_sus = _time(sustained, scene, seeds) / K_SUS
    RESULT["sustained_s_per_frame"] = round(t_sus, 4)
    RESULT["sustained_device_rays_per_sec"] = round(RAYS_PER_FRAME / t_sus)
    RESULT["sustained_note"] = (
        "K=16 frames in one program, per-frame on-device mean-colour "
        "reduction; excludes full-frame readback"
    )


def _bench_4k(scene, cfg) -> None:
    # 4K scaling point: the fixed host<->device round-trip (~28 ms through
    # this container) dominates at 1080p; at 4x the rays the kernel's
    # device throughput shows through.
    cfg4k = cfg.replace(width=3840, height=2160)
    fwd4k = jax.jit(lambda s, k: render_radiance(s, cfg4k, k))
    t_4k = _time(fwd4k, scene, jnp.uint32(0))
    RESULT.setdefault("configs", []).append(
        {"config": "spheres2 3840x2160 parity gillum16 shadows",
         "s_per_frame": round(t_4k, 4),
         "rays_per_sec": round(3840 * 2160 * 17 / t_4k)}
    )


def _bench_fog() -> None:
    """spheres2 in CLEAN semantics: its spherical fog is value-bearing
    (parity's sscanf quirk zeroes it), so every per-light diffuse and
    specular term reroutes through spherical_fog_shading with fresh
    random draws (src/blinn_phong.h:56-66,104-110) — the heaviest
    shading configuration the scene set reaches."""
    from skele_raytracer_tpu.config import CLEAN

    cfg = RenderConfig(
        width=W, height=H, monte_carlo=True, num_paths=PATHS,
        max_depth=DEPTH, use_shadows=True, backend="pallas",
        rays_per_chunk=1 << 17, quirks=CLEAN,
    )
    scene = parse_scene("scenes/spheres2.scn").to_scene(cfg.quirks)
    fwd = jax.jit(lambda s, k: render_radiance(s, cfg, k))
    t = _time(fwd, scene, jnp.uint32(0))
    RESULT.setdefault("configs", []).append(
        {"config": "spheres2 1920x1080 clean(live fog) gillum16 shadows",
         "s_per_frame": round(t, 4),
         "rays_per_sec": round(RAYS_PER_FRAME / t)}
    )
    _emit()


def _bench_dragon() -> None:
    """Triangle-mesh configs (scenes/dragon.scn, 10,002 triangles) through
    the cluster-culled Pallas kernels — the capability the reference serves
    with a brute-force per-ray scan (src/raytrace.h:170-187; no reference
    timings exist for dragon, so no vs_baseline here). 640x480 matches the
    reference's actually-shipped --parallel resolution (src/main.cpp:21-24).
    """
    from skele_raytracer_tpu.config import CLEAN

    parsed = parse_scene("scenes/dragon.scn")
    for name, quirks, mc in (
        ("dragon 640x480 parity shadows depth2", None, False),
        ("dragon 640x480 clean shadows depth2", CLEAN, False),
        ("dragon 640x480 clean shadows gillum16 depth2", CLEAN, True),
    ):
        if _remaining() < 120:
            RESULT.setdefault("skipped", []).append(name)
            continue
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
        RESULT.setdefault("configs", []).append(
            {"config": name, "s_per_frame": round(t, 4),
             "rays_per_sec": round(rays / t)}
        )
        _emit()


def _bench_midband() -> None:
    """Mid-band scene sizes between the headline regimes: bear.scn (31
    spheres — near the whole-frame kernel's 64-sphere unroll boundary),
    test.scn (2,763 triangles — a mesh far smaller than dragon, culled
    path), and a synthetic 128-sphere scene exercising the kernel's
    fori_loop scan mode (S > _UNROLL_SPHERES; the reference's brute
    force, src/raytrace.h:152-166, has no sphere limit — neither does
    the fast path)."""
    from skele_raytracer_tpu.config import CLEAN
    from skele_raytracer_tpu.ops.pallas import pathtrace

    def one(name, scene, cfg, rays):
        fwd = jax.jit(lambda s, k, c=cfg: render_radiance(s, c, k))
        t = _time(fwd, scene, jnp.uint32(0))
        RESULT.setdefault("configs", []).append(
            {"config": name, "s_per_frame": round(t, 4),
             "rays_per_sec": round(rays / t)})
        _emit()

    cfg = RenderConfig(width=W, height=H, monte_carlo=True, num_paths=PATHS,
                       max_depth=DEPTH, use_shadows=True, backend="pallas",
                       rays_per_chunk=1 << 17)
    bear = parse_scene("scenes/bear.scn").to_scene(cfg.quirks)
    one("bear 1920x1080 parity gillum16 shadows", bear, cfg, RAYS_PER_FRAME)

    cfg_t = RenderConfig(width=640, height=480, max_depth=2, use_shadows=True,
                         backend="pallas", rays_per_chunk=1 << 17)
    test_s = parse_scene("scenes/test.scn").to_scene(cfg_t.quirks)
    one("test 640x480 parity shadows depth2", test_s, cfg_t, 640 * 480)
    cfg_tc = cfg_t.replace(quirks=CLEAN)
    one("test 640x480 clean shadows depth2",
        parse_scene("scenes/test.scn").to_scene(CLEAN), cfg_tc, 640 * 480)

    # synthetic 128-sphere scene (loop-mode scan)
    from skele_raytracer_tpu.scene.types import make_scene

    rng = __import__("numpy").random.default_rng(3)
    spheres = []
    for _ in range(128):
        c = rng.uniform(-8, 8, 3)
        c[1] = abs(c[1])
        spheres.append(dict(
            center=tuple(c), radius=float(rng.uniform(0.3, 1.0)),
            ambient=tuple(rng.uniform(0, .3, 3)),
            diffuse=tuple(rng.uniform(0, 1, 3)),
            specular=tuple(rng.uniform(0, .5, 3)), transmissive=(0, 0, 0),
            power=float(rng.uniform(2, 40)), ior=1.2))
    s128 = make_scene(
        spheres=spheres,
        point_lights=[dict(position=(0, 30, -20), colour=(500, 500, 500))],
        ambient=(0.2, 0.2, 0.2), camera_position=(0, 3, -24),
        camera_direction=(0, 0, 1), camera_up=(0, 1, 0),
        background=(.05, .1, .15))
    cfg128 = cfg.replace(quirks=CLEAN)
    assert pathtrace.use_pathtrace(s128, cfg128)
    one("synthetic128 1920x1080 clean gillum16 shadows (loop-mode scan)",
        s128, cfg128, RAYS_PER_FRAME)


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

    rays_fwd = RAYS_PER_FRAME / t_fwd
    RESULT.update(
        {
            "metric": "spheres2 1080p gillum16+shadows fwd rays/sec/chip",
            "value": round(rays_fwd),
            "unit": "rays/s",
            "vs_baseline": round(rays_fwd / REF_RAYS_PER_SEC, 2),
            "fwd_s_per_frame": round(t_fwd, 4),
            "fwdbwd_s_per_frame": round(t_fwdbwd, 4),
            "fwdbwd_rays_per_sec": round(RAYS_PER_FRAME / t_fwdbwd),
            "device": str(jax.devices()[0]),
        }
    )
    _emit()  # HEADLINE — from here on, a timeout truncates, never erases

    _section("grad_err", 120, lambda: _bench_grad_err(scene))
    _section("sustained", 120, lambda: _bench_sustained(scene, cfg))
    _section("4k", 120, lambda: _bench_4k(scene, cfg))
    _section("fog", 120, _bench_fog)
    _section("dragon", 240, _bench_dragon)
    _section("midband", 300, _bench_midband)

    def _sol():
        # Speed-of-light accounting (utils/roofline.py): analytic FLOPs +
        # minimal-HBM model of the headline frame vs TPU v5e peaks.
        from skele_raytracer_tpu.utils import roofline

        s_pad = int(scene.spheres.mask.shape[0])
        model = roofline.frame_model(
            width=W, height=H, paths=PATHS, depth=DEPTH, s_pad=s_pad
        )
        RESULT["sol"] = roofline.sol_summary(model, t_fwd)

    _section("sol", 5, _sol)


if __name__ == "__main__":
    main()
