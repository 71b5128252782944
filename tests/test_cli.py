"""End-to-end CLI tests: the reference's user surface, run as a user would.

Each test invokes `python -m skele_raytracer_tpu` in a subprocess with a
clean CPU environment (the repo's conftest re-exec trick, applied to the
CLI) and checks the artifact it writes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from skele_raytracer_tpu.utils.image import read_ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon" not in p]
    )
    return subprocess.run(
        [sys.executable, "-m", "skele_raytracer_tpu", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.parametrize("mode", ["parity", "clean"])
def test_cli_renders_ppm(tmp_path, mode):
    out = str(tmp_path / f"{mode}.ppm")
    r = _run(
        "--path", "scenes/spheres1.scn", "--output", out,
        "--width", "48", "--height", "36", "--shadow", "--mode", mode,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "WROTE TO" in r.stderr
    img = read_ppm(out)
    assert img.shape == (36, 48, 3)
    assert img.std() > 0


def test_cli_reference_flag_set(tmp_path):
    """The reference's exact flag vocabulary works (main.cpp:246-379)."""
    out = str(tmp_path / "ref.ppm")
    r = _run(
        "--path", "scenes/spheres1.scn", "--output", out,
        "--width", "32", "--height", "24", "--fov", "60",
        "--gillum", "2", "--jsample", "2", "--depth", "2",
        "--parallel", "true", "--shadow",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_cli_missing_scene_fails_cleanly(tmp_path):
    r = _run("--path", "/nope/missing.scn", "--output", str(tmp_path / "x.ppm"))
    assert r.returncode == 1
    assert "could not be opened" in r.stderr
    assert "Traceback" not in r.stderr


def test_cli_missing_required_args():
    r = _run("--output", "/tmp/x.ppm")
    assert r.returncode == 2
    assert "--path" in r.stderr
