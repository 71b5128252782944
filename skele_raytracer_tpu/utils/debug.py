"""Numerical sanitizers — the framework's analog of the sanitizers the
reference lacks (SURVEY §5: its only "tooling" is clang-format, while it
ships an actual data race on libc rand()).

Races are impossible here by construction (stateless counter RNG, pure
functions); the failure mode that remains is numerical: NaN/Inf sneaking
through a quirk path or a new kernel. `checked_render` runs any render
function under jax.experimental.checkify's float checks and reports the
first offending operation with its source location; `assert_finite` is a
cheap post-hoc guard for pipelines.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *args, **kwargs):
    """Run `fn(*args, **kwargs)` with NaN/div-by-zero checks compiled in
    (non-array args must be closed over by `fn`). Returns the result;
    raises on the first bad value, naming the op and source line."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks)
    err, out = cfn(*args, **kwargs)
    err.throw()
    return out


def checked_render(scene, cfg, seed=0):
    """Render with float checks enabled (slow; debugging only)."""
    from skele_raytracer_tpu.models.renderer import render_radiance

    return checked(
        lambda s, k: render_radiance(s, cfg, k), scene, jnp.uint32(seed)
    )


def assert_finite(tree, what: str = "output") -> None:
    """Host-side guard: every leaf of `tree` must be finite."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        import numpy as np

        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            bad = (~np.isfinite(a)).sum()
            raise FloatingPointError(
                f"{what}{jax.tree_util.keystr(path)}: {bad} non-finite values"
            )
