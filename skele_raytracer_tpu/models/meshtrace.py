"""Bounce-major wavefront orchestrator for mesh-scale Monte-Carlo configs.

The sample-major chunker (renderer.render_ids_chunked_jnp) runs each
chunk's FULL bounce chain: at dragon 640x480 gillum16 that is 38 chunks
x (bounce-0 stages + bounce-1 stages over chunk*num_paths rays), even
though only ~8% of bounce rays carry throughput — the other ~92% of path
slots died at bounce 0 (their primary ray missed the mesh or hit a
parity-black triangle, reference src/raytrace.h:221-224). Dead rays are
already culled inside the Pallas kernels (ops/pallas/culled.py `live`),
but every chunk still pays its bounce-stage XLA work (continuation
sampling, the [rays, clusters] cull pass, reorder sorts, shading) on a
mostly-dead wave.

This orchestrator runs the SAME integrator math bounce-major, the
classic wavefront-path-tracer schedule mapped to XLA:

  1. bounce 0 over all samples (chunked `lax.map`, no path fan-out yet);
  2. expand each sample into num_paths continuation rays and sample
     their directions in ONE fused frame-level pass;
  3. per bounce: one FRAME-level footprint sort
     (culled._footprint_sort_keys; zero-throughput rays to the tail),
     then a chunked `lax.map` whose body is wrapped in `lax.cond` on
     "any ray in this chunk live" — all-dead chunks skip sampling, cull,
     kernels, and shading entirely;
  4. one final unsort (sort by path id) + per-sample mean.

Results are identical to the sample-major path: every RNG draw is keyed
on (seed, path_id, bounce, purpose) (ops/sampling.py), and per-ray
intersection is independent of tiling/order, so re-chunking and
re-sorting cannot change the image (tests/test_meshtrace.py asserts it).

Differentiation: `meshtrace_ids` is a custom_vjp with the same contract
as pathtrace.pathtrace_ids' no-records fallback — the forward runs on
stop_gradient(scene); the backward re-derives everything through the
sample-major chunked path (renderer.render_ids_chunked_jnp, itself
running the culled kernels with hit-structure replay), whose estimator
is identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.models.integrator import (
    _PI,
    _shade_hit,
    _use_megakernel,
    mc_continue_arrays,
)
from skele_raytracer_tpu.ops.camera import rays_for_ids

# Wave-size cap: the frame-level wave materializes ~13 f32 columns per
# path ray (plus the sort's double buffer); 1 << 25 path rays ~ 1.7 GB
# of transients — comfortable in 16 GB HBM, and covers 1080p gillum16.
MAX_WAVE = 1 << 25


def use_meshtrace(scene, cfg: RenderConfig, n_samples: int) -> bool:
    """True when the bounce-major schedule serves this render: the user
    opted in (cfg.bounce_major — measured a wash vs sample-major on
    dragon gillum16, 0.518 vs 0.517 s/frame, so not the default), the
    culled mesh kernels are in play (same gate as ops/geometry.intersect),
    the integrator is the linear MC wavefront with real bounces, and the
    whole path wave fits the frame-level sort budget."""
    return (
        cfg.bounce_major
        and cfg.backend == "pallas"
        and scene.has_triangles
        and scene.clusters is not None
        and scene.clusters.n_clusters > 4
        and cfg.monte_carlo
        and cfg.max_depth >= 2
        and cfg.paths_per_sample >= 1
        and n_samples * cfg.paths_per_sample <= MAX_WAVE
        and not _use_megakernel(scene, cfg)
    )


def _pad_to(a, n, fill):
    pad = n - a.shape[0]
    if pad == 0:
        return a
    width = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
    return jnp.pad(a, width, constant_values=fill)


def _chunked_map(body, args, chunk):
    """lax.map `body` over rows of the arg pytree in fixed-size chunks.
    Returns the outputs cropped back to the input length."""
    n = jax.tree_util.tree_leaves(args)[0].shape[0]
    n_ch = -(-n // chunk)
    padded = n_ch * chunk

    def prep(a):
        return _pad_to(a, padded, 0).reshape((n_ch, chunk) + a.shape[1:])

    outs = jax.lax.map(body, jax.tree_util.tree_map(prep, args))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((padded,) + a.shape[2:])[:n], outs
    )


def _meshtrace_forward(scene, cfg: RenderConfig, seed, sample_ids):
    """Radiance [N, 3] — bounce-major schedule of integrate_linear."""
    from skele_raytracer_tpu.ops.pallas.culled import _footprint_sort_keys

    N = sample_ids.shape[0]
    P = cfg.paths_per_sample
    D = cfg.max_depth
    mesh = jax.lax.stop_gradient(scene.clusters)
    allow_negative = cfg.quirks.reference_triangle_test
    chunk = max(128, min(cfg.rays_per_chunk, 1 << 22))
    bg3 = scene.background

    # ---- bounce 0: chunked over samples (full chunk — no fan-out) -------
    def body0(ids):
        o, d = rays_for_ids(scene.camera, cfg, seed, ids)
        hits, mat, direct, shades, miss = _shade_hit(
            scene, cfg, seed, o, d, ids, 0
        )
        bg = jnp.broadcast_to(bg3[None, :], direct.shape)
        l0 = jnp.where(
            miss[:, None], bg,
            jnp.where(shades[:, None], direct / _PI * mat.diffuse, 0.0),
        )
        return l0, hits.point, hits.normal, mat.diffuse, shades.astype(
            jnp.float32
        )

    l0, x0, n0, dif0, sh0 = _chunked_map(body0, sample_ids, chunk)
    if D <= 1:
        return l0

    # ---- expand to the path wave (one fused frame-level pass) -----------
    path_ids = (
        sample_ids[:, None] * P + jnp.arange(P, dtype=jnp.uint32)[None, :]
    ).reshape(-1)
    rep = lambda a: jnp.repeat(a, P, axis=0)
    o_b, d_b, f1 = mc_continue_arrays(
        cfg, seed, rep(x0), rep(n0), rep(dif0), path_ids, 0
    )
    T_b = f1 * rep(sh0)[:, None]

    # Pad the wave once to a whole number of chunks; pads are dead
    # (T = 0) and their pad ids sort after every real path id in the
    # final unsort.
    NP = N * P
    n_ch = -(-NP // chunk)
    padded = n_ch * chunk
    o_b = _pad_to(o_b, padded, 0.0)
    d_b = _pad_to(d_b, padded, 1.0)  # nonzero: keeps key math NaN-free
    T_b = _pad_to(T_b, padded, 0.0)
    pid = jnp.concatenate(
        [path_ids, NP + jnp.arange(padded - NP, dtype=jnp.uint32)]
    )
    acc = jnp.zeros((padded, 3), jnp.float32)

    # ---- bounces 1..D-1: frame sort + cond-skipped chunk map ------------
    for b in range(1, D):
        live = jnp.any(T_b != 0, axis=1)
        keys = _footprint_sort_keys(o_b, d_b, mesh,
                                    allow_negative=allow_negative)
        keys = jnp.where(live, keys, jnp.uint32(0xFFFFFFFF))
        # Multi-operand lax.sort beats argsort + one packed row gather
        # here (measured 0.518 vs 0.653 s/frame on dragon gillum16): XLA
        # co-sorts payloads through the sort network, while a [wave, 12]
        # row gather serializes on TPU's sublane-granular gather path.
        (_, o0, o1, o2, dd0, dd1, dd2, t0, t1, t2, a0, a1, a2, pid) = (
            jax.lax.sort(
                (keys, o_b[:, 0], o_b[:, 1], o_b[:, 2],
                 d_b[:, 0], d_b[:, 1], d_b[:, 2],
                 T_b[:, 0], T_b[:, 1], T_b[:, 2],
                 acc[:, 0], acc[:, 1], acc[:, 2], pid),
                dimension=0, num_keys=1,
            )
        )
        o_b = jnp.stack([o0, o1, o2], axis=1)
        d_b = jnp.stack([dd0, dd1, dd2], axis=1)
        T_b = jnp.stack([t0, t1, t2], axis=1)
        acc = jnp.stack([a0, a1, a2], axis=1)
        last = b == D - 1

        def body(args, b=b, last=last):
            o_c, d_c, T_c, pid_c = args

            def live_fn(_):
                live_f = jnp.any(T_c != 0, axis=1).astype(jnp.float32)
                h, m, dir_c, sh, ms = _shade_hit(
                    scene, cfg, seed, o_c, d_c, pid_c, b, live_f
                )
                bg = jnp.broadcast_to(bg3[None, :], dir_c.shape)
                l_add = T_c * jnp.where(
                    ms[:, None], bg,
                    jnp.where(sh[:, None], dir_c / _PI * m.diffuse, 0.0),
                )
                if last:
                    # Final bounce: the continuation would be shade(depth=0)
                    # == black (src/raytrace.h:142) — never sampled.
                    z = jnp.zeros_like(o_c)
                    return l_add, z, z, jnp.zeros_like(T_c)
                o_n, d_n, f = mc_continue_arrays(
                    cfg, seed, h.point, h.normal, m.diffuse, pid_c, b
                )
                T_n = T_c * f * sh.astype(jnp.float32)[:, None]
                return l_add, o_n, d_n, T_n

            def dead_fn(_):
                z3 = jnp.zeros_like(o_c)
                return jnp.zeros_like(T_c), z3, z3, jnp.zeros_like(T_c)

            return jax.lax.cond(jnp.any(T_c != 0), live_fn, dead_fn, None)

        l_add, o_n, d_n, T_n = _chunked_map(body, (o_b, d_b, T_b, pid), chunk)
        acc = acc + l_add
        o_b, d_b, T_b = o_n, d_n, T_n

    # ---- unsort by path id, reduce paths per sample ----------------------
    _, a0, a1, a2 = jax.lax.sort(
        (pid, acc[:, 0], acc[:, 1], acc[:, 2]), dimension=0, num_keys=1
    )
    path_l = jnp.stack([a0, a1, a2], axis=1)[:NP]
    indirect = jnp.mean(path_l.reshape(N, P, 3), axis=1)
    return l0 + indirect


def _f0(x):
    return np.zeros(np.shape(x), jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def meshtrace_ids(scene, cfg: RenderConfig, seed, sample_ids):
    """Bounce-major radiance [N, 3], differentiable.

    Forward: `_meshtrace_forward` (module docstring). Backward: re-derive
    through the sample-major chunked path, whose estimator (and RNG
    streams) are identical — the same fallback contract as
    pathtrace.pathtrace_ids without records."""
    sg = jax.lax.stop_gradient
    return _meshtrace_forward(sg(scene), cfg, seed, sample_ids)


def _mt_fwd(scene, cfg, seed, sample_ids):
    sg = jax.lax.stop_gradient
    return (
        _meshtrace_forward(sg(scene), cfg, seed, sample_ids),
        (scene, seed, sample_ids),
    )


def _mt_bwd(cfg, res, g):
    scene, seed, sample_ids = res
    from skele_raytracer_tpu.models.renderer import render_ids_chunked_jnp

    _, vjp = jax.vjp(
        lambda s: render_ids_chunked_jnp(s, cfg, seed, sample_ids), scene
    )
    return vjp(g)[0], _f0(seed), _f0(sample_ids)


meshtrace_ids.defvjp(_mt_fwd, _mt_bwd)
