"""Tiled, restartable rendering with per-tile retry and progressive preview.

The reference writes the PPM only after the full frame finishes (a crash
loses everything — src/main.cpp:88-101; SURVEY §5 lists failure recovery
and checkpointing as absent). Long renders here stream the frame in row
bands, persist each completed band to a .npz accumulation buffer, and on
restart resume from the last completed band. A transient device failure
retries the band a bounded number of times instead of killing the frame.

Also the aux "progressive preview" path (reference's SDL live display,
src/main.cpp:108-227): an optional callback receives the partial frame
after every band, e.g. to write preview PNGs.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.models.renderer import render_ids_chunked

log = logging.getLogger(__name__)

# Fault injection (SURVEY §5: the reference has no failure recovery to
# test; this hook exists so ours is testable end-to-end): when set to N,
# the render raises after N bands COMPLETED IN THIS PROCESS have been
# persisted — simulating a crash mid-frame with a valid resume state on
# disk. Used by the CLI e2e resume test (tests/test_cli.py).
FAULT_AFTER_BANDS_ENV = "SKT_FAULT_AFTER_BANDS"


def _band_ids(cfg: RenderConfig, y0: int, y1: int):
    spp = cfg.samples_per_pixel
    start = y0 * cfg.width * spp
    stop = y1 * cfg.width * spp
    return jnp.arange(start, stop, dtype=jnp.uint32)


def _run_fingerprint(scene, cfg: RenderConfig, seed: int) -> str:
    """Digest of (scene contents, config, seed): a stale resume state from
    a DIFFERENT run must not be merged into this frame (its completed
    bands would silently carry the other run's pixels)."""
    import hashlib

    import jax

    h = hashlib.sha256()
    h.update(repr(cfg).encode())
    h.update(str(int(seed)).encode())
    for leaf in jax.tree_util.tree_leaves(scene):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def render_progressive(
    scene,
    cfg: RenderConfig,
    seed: int = 0,
    *,
    band_rows: int = 64,
    state_path: Optional[str] = None,
    preview_cb: Optional[Callable[[np.ndarray, int], None]] = None,
    max_retries: int = 2,
) -> np.ndarray:
    """Render [H, W, 3] in row bands. Identical pixels to a one-shot
    render (band boundaries only change chunking, and rays are keyed by
    flat id — sharding/chunking invariance).

    state_path: .npz file for crash-resume; holds the partial frame and
    the next band index. preview_cb(partial_frame, rows_done) runs after
    each band.
    """
    H, W, spp = cfg.height, cfg.width, cfg.samples_per_pixel
    n_bands = -(-H // band_rows)
    frame = np.zeros((H, W, 3), np.float32)
    start_band = 0

    fingerprint = _run_fingerprint(scene, cfg, seed)
    if state_path and os.path.exists(state_path):
        saved = np.load(state_path)
        saved_fp = str(saved["fingerprint"]) if "fingerprint" in saved else ""
        if (
            saved["frame"].shape == frame.shape
            and int(saved["spp"]) == spp
            and saved_fp == fingerprint
        ):
            frame = saved["frame"]
            start_band = int(saved["next_band"])
            log.info("resuming render at band %d/%d", start_band, n_bands)
        else:
            log.warning(
                "state %s is from a different scene/config/seed; restarting",
                state_path,
            )

    seed_arr = jnp.uint32(seed)
    for b in range(start_band, n_bands):
        y0, y1 = b * band_rows, min((b + 1) * band_rows, H)
        ids = _band_ids(cfg, y0, y1)
        attempt = 0
        while True:
            try:
                radiance = np.asarray(
                    render_ids_chunked(scene, cfg, seed_arr, ids)
                )
                break
            except Exception as e:  # transient device failure -> retry band
                attempt += 1
                if attempt > max_retries:
                    raise
                log.warning(
                    "band %d failed (%s); retry %d/%d", b, e, attempt, max_retries
                )
                time.sleep(0.5 * attempt)
        frame[y0:y1] = radiance.reshape(y1 - y0, W, spp, 3).mean(axis=2)

        if state_path:
            tmp = state_path + ".tmp.npz"  # .npz suffix: savez won't rename
            np.savez(
                tmp, frame=frame, next_band=b + 1, spp=spp,
                fingerprint=fingerprint,
            )
            os.replace(tmp, state_path)
        if preview_cb is not None:
            preview_cb(frame, y1)

        fault_after = os.environ.get(FAULT_AFTER_BANDS_ENV)
        if fault_after is not None and (b + 1 - start_band) >= int(fault_after):
            raise RuntimeError(
                f"injected fault after {fault_after} bands "
                f"({FAULT_AFTER_BANDS_ENV})"
            )

    if state_path and os.path.exists(state_path):
        os.remove(state_path)
    return frame
