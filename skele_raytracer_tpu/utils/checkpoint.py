"""Checkpoint / resume for optimization state (orbax).

The reference has no checkpointing at all — a frame only exists once fully
written (reference src/main.cpp:88-101; SURVEY.md §5). The TPU framework's
long-running jobs (inverse-rendering fits, multi-host renders) persist
their state: the full TrainState pytree (scene params + optimizer moments +
step) via orbax's PyTreeCheckpointer, keyed by step for resume-from-latest.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:08d}")


def save(directory: str, state: Any) -> str:
    """Save `state` (any pytree with an int `step` leaf) under directory."""
    step = int(jax.device_get(state.step))
    path = _ckpt_path(directory, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if _HAVE_ORBAX:
        ocp.PyTreeCheckpointer().save(path, jax.device_get(state), force=True)
    else:  # pragma: no cover - orbax is baked into the image
        import pickle

        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(state), f)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:].removesuffix(".pkl")))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_latest(directory: str, template: Any) -> Optional[Any]:
    """Restore the newest checkpoint as the same pytree structure as
    `template`, or None if the directory holds none."""
    step = latest_step(directory)
    if step is None:
        return None
    path = _ckpt_path(directory, step)
    if _HAVE_ORBAX:
        restored = ocp.PyTreeCheckpointer().restore(
            path, item=jax.device_get(template)
        )
        return restored
    import pickle  # pragma: no cover

    with open(path + ".pkl", "rb") as f:
        return pickle.load(f)
